"""Isolated single-batch probe for the standard_nms pipeline.

Round-4 incident: the loader-e2e tool's standard_nms leg at batch 32
crashed the v5e worker twice in a row right after the defer-covariance
fast path landed (DESIGN.md §5d), while batch 16 measures fine. This
probe runs ONE standard_nms program, alone, in a fresh process:

    python tools/probe_standard_nms.py 32              # defer ON (default)
    POD_COMPARE_DISABLE_DEFER_COV=1 \
        python tools/probe_standard_nms.py 32          # defer OFF (A/B)

FINDING (round 4, 2026-08-19): `probe 32` with defer ON — one program,
fresh process — ran clean: compile-time peak 3.43 GB, 188.3 img/s over
6 iterations. The defer-covariance path is exonerated; the two
loader-e2e crashes happened in a process that had ALREADY touched the
device with other programs (loader warmup batches), and the second
attempt started before the worker had fully recovered from the first
outage. bench_loader_e2e.py now defaults its device batch to 16 (the
batch every pipeline has run hundreds of iterations at) so the e2e
tool never gambles the worker on a batch-size frontier.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BDD_CANVAS = (736, 1280)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32

    from pod_compare_tpu.utils import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from pod_compare_tpu.config import get_cfg
    from pod_compare_tpu.inference.predictor import build_predictor
    from pod_compare_tpu.models import build_model, init_model_params
    from pod_compare_tpu.utils.hbm_guard import guarded_compile

    cfg = get_cfg()
    cfg.MODEL.RETINANET.NUM_CLASSES = 7
    cfg.MODEL.PROBABILISTIC_MODELING.DROPOUT_RATE = 0.2
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NAME = "loss_attenuation"
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NUM_SAMPLES = 10
    cfg.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NAME = (
        "negative_log_likelihood"
    )
    cfg.PROBABILISTIC_INFERENCE.INFERENCE_MODE = "standard_nms"

    model = build_model(cfg)
    params = init_model_params(model, BDD_CANVAS, seed=0)
    predictor = build_predictor(cfg, BDD_CANVAS, params=params)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, *BDD_CANVAS, 3) * 255, jnp.float32)
    sizes = jnp.asarray(
        np.tile(np.array([720.0, 1280.0], np.float32), (batch, 1))
    )
    key = jax.random.PRNGKey(0)
    defer = os.environ.get("POD_COMPARE_DISABLE_DEFER_COV", "") in ("", "0")
    compiled, info = guarded_compile(
        predictor._fn, (predictor.params, images, key, sizes, sizes),
        name=f"standard_nms_b{batch}_defer{int(defer)}",
    )
    if compiled is None:
        print(f"guard skipped: {info}", flush=True)
        return
    times = []
    for i in range(6):
        key, sub = jax.random.split(key)
        t0 = time.time()
        dets = compiled(predictor.params, images, sub, sizes, sizes)
        _ = np.asarray(dets.boxes)
        times.append(time.time() - t0)
        print(f"[b{batch} defer={defer}] iter {i}: {times[-1]:.3f}s",
              flush=True)
    steady = np.mean(times[2:])
    print(f"[b{batch} defer={defer}] RESULT "
          f"peak={info.get('peak_hbm_gb')} GB "
          f"{batch / steady:.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
