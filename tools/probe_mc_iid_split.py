"""Two-program split probe for the b17-20 mc_iid v5e runtime fault.

The round-5 bisection ledger (DESIGN.md §5d) closed with: the faulting
kernel is NOT the sampling bank — selecting cls_sampling=mc_iid flips
XLA's fusion/layout decisions somewhere ELSE in the single 8 GB program
(head bank, top-k gathers, NMS scan). One VERDICT-r4 mitigation remained
untried: splitting the pipeline into TWO sequential jit programs, which
is the only program-local change that alters the WHOLE-program fusion
context rather than one kernel's neighborhood.

Split point — the head/core seam (inference/predictor.py:223-245):

  program A (head):  backbone + vmapped MC-dropout head bank
                     → run-mean outputs + per-run deltas.
                     Structurally IDENTICAL to the analytic pipeline's
                     head stage, which runs clean at b32: if A crashes,
                     the fault moved with the head; if B crashes, it
                     lives in the sampling/top-k/NMS tail.
  program B (tail):  per-image mc_iid core (10-sample cls bank +
                     1000-sample MVN box decode) + BayesOD fusion +
                     postprocess.

The ~0.9 GB of head outputs stay device-resident between the calls (no
host round-trip); the only semantic difference from the fused pipeline
is the lost cross-seam fusion — which is exactly the variable under
test. Numerics are unchanged (same ops, same keys, same order).

    timeout 1800 python tools/probe_mc_iid_split.py 20   # fault probe
    timeout 1800 python tools/probe_mc_iid_split.py 16   # safe control

RESULTS (v5e-1, 2026-08-20): the split form SURVIVES b20 and b24 —
the first positive mitigation in the DESIGN.md §5d ledger. b16 = 32.1,
b20 = 32.1, b24 = 36.6 img/s (the fused pipeline's proven ceiling is
b16 = 35.8; fused b20 crashes the worker). Productionized as
PROBABILISTIC_INFERENCE.SPLIT_HEAD_PROGRAM
(inference/predictor.py::_build_split_pipeline); set PROBE_PRODUCTION=1
to drive that production path instead of the hand-rolled programs below
(the production head additionally transposes the per-run deltas
batch-leading at the seam).

Reference semantics being served: probabilistic_inference.py:289-374
(10 iid cls samples + 1000 MVN box draws per candidate).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    batches = [int(a) for a in sys.argv[1:]] or [20]
    from pod_compare_tpu.utils import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    import bench
    from pod_compare_tpu.inference.core import probabilistic_inference_core
    from pod_compare_tpu.inference.postprocess import detector_postprocess
    from pod_compare_tpu.inference.predictor import (
        _mean_outputs,
        build_predictor,
    )
    from pod_compare_tpu.models import build_model, init_model_params
    from pod_compare_tpu.utils.hbm_guard import guarded_compile

    cfg = bench.build_cfg("mc_iid")
    cfg.PROBABILISTIC_INFERENCE.CLS_SAMPLING = os.environ.get(
        "PROBE_CLS_SAMPLING", "mc_iid"
    )
    cfg.PROBABILISTIC_INFERENCE.BOX_SAMPLING = os.environ.get(
        "PROBE_BOX_SAMPLING", "mc_iid"
    )
    production = os.environ.get("PROBE_PRODUCTION", "") not in ("", "0")
    if production:
        cfg.PROBABILISTIC_INFERENCE.SPLIT_HEAD_PROGRAM = True
    model = build_model(cfg)
    params = init_model_params(model, bench.BDD_CANVAS, seed=0)
    predictor = build_predictor(cfg, bench.BDD_CANVAS, params=params)
    anchors = predictor.anchors
    core_kwargs = predictor._core_kwargs()
    mode_fn = predictor._mode_fn()

    @jax.jit
    def head_fn(p, images, rng):
        dropout_rng, sampling_rng = jax.random.split(rng)
        outs, is_multi = predictor._member_outputs(p, images, dropout_rng)
        assert is_multi
        mean_outs = _mean_outputs(outs)
        img_keys = jax.random.split(sampling_rng, images.shape[0])
        return (
            mean_outs["box_cls"],
            mean_outs["box_delta"],
            mean_outs["box_cls_var"],
            mean_outs["box_reg_var"],
            outs["box_delta"],  # (M, B, R, 4) per-run deltas
            img_keys,
        )

    @jax.jit
    def tail_fn(cls_m, delta_m, cvar_m, rvar_m, run_deltas, img_keys,
                input_sizes, output_sizes):
        def per_image(key, cls_i, delta_i, cvar_i, rvar_i, rd_i):
            cands = probabilistic_inference_core(
                key, anchors, cls_i, delta_i, cvar_i, rvar_i, rd_i,
                **core_kwargs,
            )
            return mode_fn(cands)

        dets = jax.vmap(per_image, in_axes=(0, 0, 0, 0, 0, 1))(
            img_keys, cls_m, delta_m, cvar_m, rvar_m, run_deltas
        )
        return jax.vmap(detector_postprocess)(
            dets,
            input_sizes[:, 0], input_sizes[:, 1],
            output_sizes[:, 0], output_sizes[:, 1],
        )

    if production:
        head_fn, tail_fn = predictor._head_fn, predictor._tail_fn

    for batch in batches:
        rng = np.random.RandomState(0)
        images = jnp.asarray(
            rng.rand(batch, *bench.BDD_CANVAS, 3) * 255, jnp.float32
        )
        sizes = jnp.asarray(
            np.tile(np.array([720.0, 1280.0], np.float32), (batch, 1))
        )
        key = jax.random.PRNGKey(0)

        head_c, head_info = guarded_compile(
            head_fn, (predictor.params, images, key),
            name=f"split_head_b{batch}",
        )
        if head_c is None:
            print(f"[b{batch}] head guard skipped: {head_info}", flush=True)
            continue
        head_out = jax.eval_shape(
            head_fn, predictor.params, images, key
        )
        tail_args = tuple(
            jax.tree_util.tree_map(
                lambda o: jnp.zeros(o.shape, o.dtype), head_out
            )
        ) + (sizes, sizes)
        # Tail keys are uint32 PRNG keys — eval_shape gives the right dtype.
        tail_c, tail_info = guarded_compile(
            tail_fn, tail_args, name=f"split_tail_b{batch}",
        )
        if tail_c is None:
            print(f"[b{batch}] tail guard skipped: {tail_info}", flush=True)
            continue
        print(
            f"[b{batch}] compiled: head peak "
            f"{head_info.get('peak_hbm_gb')} GB, tail peak "
            f"{tail_info.get('peak_hbm_gb')} GB", flush=True,
        )

        times = []
        dets = None
        for i in range(8):
            key, sub = jax.random.split(key)
            t0 = time.time()
            h = head_c(predictor.params, images, sub)
            print(f"[b{batch}] iter {i}: head dispatched", flush=True)
            dets = tail_c(*h, sizes, sizes)
            _ = np.asarray(dets.boxes)  # host fetch = hard sync
            times.append(time.time() - t0)
            print(f"[b{batch}] iter {i}: {times[-1]:.2f}s", flush=True)
        steady = times[2:]
        print(
            f"[b{batch}] RESULT split-program mc_iid: head "
            f"{head_info.get('peak_hbm_gb')} GB + tail "
            f"{tail_info.get('peak_hbm_gb')} GB, steady "
            f"{np.mean(steady):.2f}s/iter -> "
            f"{batch / np.mean(steady):.1f} img/s", flush=True,
        )
        del dets, images, sizes


if __name__ == "__main__":
    main()
