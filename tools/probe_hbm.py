"""Compile-only peak-HBM probe for the flagship BayesOD+MC pipeline.

Lowers+compiles the exact program bench.py measures (analytic sampling,
BDD canvas, batch from PROBE_BATCH) and prints XLA's memory_analysis —
nothing executes, so a probe never risks a worker outage. Used to bisect
compile-time peak-HBM regressions across commits: run with PYTHONPATH
pointing at a historical checkout (git worktree) to probe old code with
this same harness.

    PROBE_BATCH=32 PROBE_SAMPLING=analytic python tools/probe_hbm.py

Reference hot path this program implements:
probabilistic_inference.py:178-388.
"""

import os
import sys
import time

# Append (not insert) so a PYTHONPATH-provided historical checkout of the
# package shadows the repo-root copy during bisects.
sys.path.append(".")

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    batch = int(os.environ.get("PROBE_BATCH", "32"))
    sampling = os.environ.get("PROBE_SAMPLING", "analytic")
    canvas = (736, 1280)

    import jax
    import jax.numpy as jnp

    if os.environ.get("PROBE_PERSISTENT_CACHE", "0") == "1":
        from pod_compare_tpu.utils import enable_persistent_cache

        enable_persistent_cache()

    from pod_compare_tpu.config import get_cfg
    from pod_compare_tpu.inference.predictor import build_predictor
    from pod_compare_tpu.models import build_model, init_model_params

    cfg = get_cfg()
    cfg.MODEL.RETINANET.NUM_CLASSES = 7
    cfg.MODEL.PROBABILISTIC_MODELING.DROPOUT_RATE = 0.2
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NAME = "loss_attenuation"
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NUM_SAMPLES = 10
    cfg.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NAME = (
        "negative_log_likelihood"
    )
    cfg.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NUM_SAMPLES = 1000
    cfg.PROBABILISTIC_INFERENCE.INFERENCE_MODE = os.environ.get(
        "PROBE_MODE", "bayes_od"
    )
    cfg.PROBABILISTIC_INFERENCE.AFFINITY_THRESHOLD = 0.9
    cfg.PROBABILISTIC_INFERENCE.MC_DROPOUT.ENABLE = True
    cfg.PROBABILISTIC_INFERENCE.MC_DROPOUT.NUM_RUNS = 10
    cfg.PROBABILISTIC_INFERENCE.BAYES_OD.CLS_MERGE_MODE = "max_score"
    cfg.PROBABILISTIC_INFERENCE.BAYES_OD.BOX_MERGE_MODE = "bayesian_inference"
    cfg.PROBABILISTIC_INFERENCE.CLS_SAMPLING = sampling
    cfg.PROBABILISTIC_INFERENCE.BOX_SAMPLING = sampling
    cfg.PROBABILISTIC_INFERENCE.MC_DROPOUT.BATCH_SHARED_MASKS = True

    model = build_model(cfg)
    params = init_model_params(model, canvas, seed=0)
    predictor = build_predictor(cfg, canvas, params=params)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, *canvas, 3) * 255, jnp.float32)
    sizes = jnp.asarray(
        np.tile(np.array([720.0, 1280.0], np.float32), (batch, 1))
    )
    key = jax.random.PRNGKey(0)

    log(f"[probe] lowering {sampling} b{batch} (jax {jax.__version__}, "
        f"{jax.devices()[0].platform})...")
    t0 = time.time()
    lowered = predictor._fn.lower(predictor.params, images, key, sizes, sizes)
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0

    ma = compiled.memory_analysis()
    temp = ma.temp_size_in_bytes
    args_b = ma.argument_size_in_bytes
    out_b = ma.output_size_in_bytes
    peak = temp + args_b + out_b
    log(
        f"[probe] lower {t_lower:.1f}s compile {t_compile:.1f}s | "
        f"temp {temp / 1e9:.3f} GB + args {args_b / 1e9:.3f} GB + "
        f"out {out_b / 1e9:.3f} GB = peak {peak / 1e9:.3f} GB"
    )
    print(
        f'{{"batch": {batch}, "sampling": "{sampling}", '
        f'"temp_gb": {temp / 1e9:.3f}, "args_gb": {args_b / 1e9:.3f}, '
        f'"out_gb": {out_b / 1e9:.3f}, "peak_gb": {peak / 1e9:.3f}}}'
    )


if __name__ == "__main__":
    main()
