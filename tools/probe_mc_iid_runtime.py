"""Runtime-footprint probe for the reference-exact mc_iid pipeline.

Round-3 incident (bench.py:44-50): mc_iid compiles clean at b24/b32
(9.08/11.94 GB compile-time peak, under the 13.5 GB budget) yet a
b24->b32 measurement sweep crashed the v5e worker — so compile-time
`memory_analysis` does NOT bound this pipeline's runtime footprint.
No runtime memory introspection exists on this platform
(`device.memory_stats()` returns None; `jax.profiler.
device_memory_profile()` aborts the process with a PJRT FATAL), so this
probe is behavioral:

    python tools/probe_mc_iid_runtime.py 24          # one batch, alone
    python tools/probe_mc_iid_runtime.py 24 32       # sweep: replicate
                                                     # the crash pattern

Single-batch runs isolate one program per process (fresh allocator, no
other executables resident). The multi-batch form runs them sequentially
in ONE process exactly like the round-3 sweep tool did — if singles
survive and the sweep crashes, the mechanism is cross-program residency
(executables + retained buffers + allocator fragmentation), not the
single program's footprint.

Logs per-iteration wall times (a superlinear blowup before a crash would
point at a runtime/RPC timeout rather than memory).

FINDING (round 4, 2026-08-19): `probe 20` — one program, fresh process,
compile-time peak 8.08 GB (well under the 13.5 GB budget) — crashed the
v5e worker on the FIRST invocation. The failure is therefore a
runtime/codegen fault crossing somewhere in b17-b20, NOT cross-program
residency and NOT an HBM-accounting gap (8 GB cannot exceed a 13.5 GB
budget). Each bisect point costs a ~50-min worker outage, so the guard
now pins the largest empirically validated batch for mc_iid pipelines
(utils/hbm_guard.py::MC_IID_PROVEN_SAFE_BATCH = 16) instead of probing
further; see DESIGN.md §5d.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def probe(batch, params, release_after=True):
    """PROBE_CLS_SAMPLING / PROBE_BOX_SAMPLING env overrides (default
    mc_iid/mc_iid) support fault bisection by sampling AXIS: e.g.
    PROBE_BOX_SAMPLING=analytic isolates the iid classification bank,
    PROBE_CLS_SAMPLING=analytic isolates the iid box-decode bank."""
    import jax
    import jax.numpy as jnp

    import bench
    from pod_compare_tpu.inference.predictor import build_predictor
    from pod_compare_tpu.utils.hbm_guard import guarded_compile

    cfg = bench.build_cfg("mc_iid")
    cfg.PROBABILISTIC_INFERENCE.CLS_SAMPLING = os.environ.get(
        "PROBE_CLS_SAMPLING", "mc_iid"
    )
    cfg.PROBABILISTIC_INFERENCE.BOX_SAMPLING = os.environ.get(
        "PROBE_BOX_SAMPLING", "mc_iid"
    )
    predictor = build_predictor(cfg, bench.BDD_CANVAS, params=params)
    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.rand(batch, *bench.BDD_CANVAS, 3) * 255, jnp.float32
    )
    sizes = jnp.asarray(
        np.tile(np.array([720.0, 1280.0], np.float32), (batch, 1))
    )
    key = jax.random.PRNGKey(0)
    compiled, info = guarded_compile(
        predictor._fn, (predictor.params, images, key, sizes, sizes),
        name=f"mc_iid_b{batch}",
    )
    if compiled is None:
        print(f"[b{batch}] guard skipped: {info}", flush=True)
        return
    times = []
    dets = None
    for i in range(8):
        key, sub = jax.random.split(key)
        t0 = time.time()
        dets = compiled(predictor.params, images, sub, sizes, sizes)
        _ = np.asarray(dets.boxes)  # host fetch = hard sync
        times.append(time.time() - t0)
        print(f"[b{batch}] iter {i}: {times[-1]:.2f}s", flush=True)
    steady = times[2:]
    print(
        f"[b{batch}] RESULT peak_hbm_compile={info.get('peak_hbm_gb')} GB "
        f"steady {np.mean(steady):.2f}s/iter -> "
        f"{batch / np.mean(steady):.1f} img/s", flush=True,
    )
    if release_after:
        del dets, images, sizes
    return info


def main():
    batches = [int(a) for a in sys.argv[1:]] or [16]
    from pod_compare_tpu.utils import enable_persistent_cache

    enable_persistent_cache()
    import bench
    from pod_compare_tpu.models import build_model, init_model_params

    cfg = bench.build_cfg("mc_iid")
    model = build_model(cfg)
    params = init_model_params(model, bench.BDD_CANVAS, seed=0)
    for b in batches:
        probe(b, params)


if __name__ == "__main__":
    main()
