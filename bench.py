"""Benchmark harness — BDD-val-geometry inference throughput per chip.

Primary metric (BASELINE.json): images/sec/chip for BayesOD + MC-dropout
(10 stochastic head passes, 1000-sample MVN box decode, on-device Bayesian
fusion) at BDD input geometry (720x1280 resized, padded to 736x1280).

Synthetic input images are used (raw BDD is not distributable with the
repo); throughput is input-content independent for this model. The
`vs_baseline` denominator is the reference's deployment-mode throughput
(single GPU, batch 1, apply_net.py:31-35) — no published number exists
(BASELINE.md), so a measured-order estimate of 4.0 img/s is used until a
side-by-side run replaces it.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

# Estimated reference throughput (img/s) for BayesOD+MC-dropout, batch-1
# single-GPU deployment mode. See module docstring.
REFERENCE_BASELINE_IMG_PER_S = 4.0

BDD_CANVAS = (736, 1280)  # 720x1280 resized + padded to stride 32
BATCH_SIZE = int(__import__("os").environ.get("BENCH_BATCH", "32"))
# Steady-state sweep: 16->~40, 24->37.5, 32->47.9 img/s. Batch 48
# kernel-faults the v5e worker (runtime OOM presents as a worker crash
# with ~50 min recovery) - do not raise the default.
# The remote-tunnel platform runs the FIRST measurement window ~25-40%
# slow before reaching steady state (measured: trial0 25.2 -> trials1+
# 34.6 img/s for identical code), so warmup includes full timed trials.
WARMUP_ITERS = 10
MEASURE_ITERS = 8


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from pod_compare_tpu.utils import enable_persistent_cache

    cache_dir = enable_persistent_cache()
    log(f"persistent compilation cache: {cache_dir or 'disabled'}")

    from pod_compare_tpu.config import get_cfg
    from pod_compare_tpu.inference.predictor import build_predictor
    from pod_compare_tpu.models import build_model, init_model_params

    cfg = get_cfg()
    cfg.MODEL.RETINANET.NUM_CLASSES = 7
    cfg.MODEL.PROBABILISTIC_MODELING.DROPOUT_RATE = 0.2
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NAME = "loss_attenuation"
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NUM_SAMPLES = 10
    cfg.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NAME = "negative_log_likelihood"
    cfg.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NUM_SAMPLES = 1000
    # BayesOD + MC-dropout (configs/Inference/bayes_od_mc_dropout.yaml)
    cfg.PROBABILISTIC_INFERENCE.INFERENCE_MODE = "bayes_od"
    cfg.PROBABILISTIC_INFERENCE.AFFINITY_THRESHOLD = 0.9
    cfg.PROBABILISTIC_INFERENCE.MC_DROPOUT.ENABLE = True
    cfg.PROBABILISTIC_INFERENCE.MC_DROPOUT.NUM_RUNS = 10
    cfg.PROBABILISTIC_INFERENCE.BAYES_OD.CLS_MERGE_MODE = "max_score"
    cfg.PROBABILISTIC_INFERENCE.BAYES_OD.BOX_MERGE_MODE = "bayesian_inference"

    log(f"devices: {jax.devices()}")
    log(f"building model at canvas {BDD_CANVAS}, batch {BATCH_SIZE}")
    model = build_model(cfg)
    params = init_model_params(model, BDD_CANVAS, seed=0)
    predictor = build_predictor(cfg, BDD_CANVAS, params=params)

    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.rand(BATCH_SIZE, *BDD_CANVAS, 3) * 255, jnp.float32
    )
    input_sizes = np.tile(np.array([720.0, 1280.0], np.float32), (BATCH_SIZE, 1))
    output_sizes = np.tile(np.array([720.0, 1280.0], np.float32), (BATCH_SIZE, 1))

    key = jax.random.PRNGKey(0)
    log("compiling + warmup...")
    t0 = time.time()
    for i in range(WARMUP_ITERS):
        key, sub = jax.random.split(key)
        dets = predictor(images, input_sizes, output_sizes, sub)
        if i % 4 == 3:
            _ = np.asarray(dets.boxes)  # host fetch: block_until_ready can
    _ = np.asarray(dets.boxes)          # be unreliable on this platform
    log(f"warmup done in {time.time() - t0:.1f}s")

    t0 = time.time()
    for i in range(MEASURE_ITERS):
        key, sub = jax.random.split(key)
        dets = predictor(images, input_sizes, output_sizes, sub)
    _ = np.asarray(dets.boxes)
    elapsed = time.time() - t0
    img_per_s = BATCH_SIZE * MEASURE_ITERS / elapsed
    log(
        f"{MEASURE_ITERS} iters x batch {BATCH_SIZE} in {elapsed:.2f}s "
        f"-> {img_per_s:.2f} img/s/chip"
    )

    print(
        json.dumps(
            {
                "metric": "BDD val images/sec/chip (BayesOD+MC-dropout)",
                "value": round(img_per_s, 3),
                "unit": "images/sec/chip",
                "vs_baseline": round(img_per_s / REFERENCE_BASELINE_IMG_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    # The v5e worker occasionally crashes (kernel fault) and takes tens of
    # minutes to come back; retry so a transient outage doesn't void the
    # whole bench run. A failed attempt leaves a poisoned in-process
    # backend, so retries re-exec the interpreter for a clean handshake.
    import os

    try:
        main()
    except Exception as exc:  # backend Unavailable/Internal etc.
        attempt = int(os.environ.get("BENCH_ATTEMPT", "0"))
        if attempt >= 2:
            raise
        log(f"bench attempt {attempt + 1} failed ({exc}); "
            f"re-execing in 300s...")
        time.sleep(300)
        os.environ["BENCH_ATTEMPT"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)
