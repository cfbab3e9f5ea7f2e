"""Single-image (batch-1) inference latency — the reference's deployment
scenario (apply_net.py:31-35 pins batch=1, single GPU, to 'simulate
deployment').

Throughput numbers elsewhere use batched pipelines; this reports the
per-image latency a deployment at batch 1 would see, per mode:

    python tools/bench_latency.py [--trials 4]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main(trials: int, canvas=(736, 1280)):
    import jax
    import jax.numpy as jnp

    from pod_compare_tpu.config import get_cfg
    from pod_compare_tpu.inference.predictor import build_predictor
    from pod_compare_tpu.models import build_model, init_model_params
    from pod_compare_tpu.utils import enable_persistent_cache

    enable_persistent_cache()

    def base_cfg():
        cfg = get_cfg()
        cfg.MODEL.RETINANET.NUM_CLASSES = 7
        cfg.MODEL.PROBABILISTIC_MODELING.DROPOUT_RATE = 0.2
        cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NAME = "loss_attenuation"
        cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NUM_SAMPLES = 10
        cfg.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NAME = (
            "negative_log_likelihood"
        )
        cfg.PROBABILISTIC_INFERENCE.AFFINITY_THRESHOLD = 0.9
        return cfg

    model = build_model(base_cfg())
    params = init_model_params(model, canvas, seed=0)
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(1, *canvas, 3) * 255, jnp.float32)
    sizes = np.array([[720.0, 1280.0]], np.float32)

    def measure(name, cfg):
        pred = build_predictor(cfg, canvas, params=params)
        key = jax.random.PRNGKey(0)
        d = pred(image, sizes, sizes, key)
        _ = np.asarray(d.boxes)  # compile + first slow window
        lat = None
        for _trial in range(trials):
            iters = 20
            t0 = time.time()
            for _ in range(iters):
                key, sub = jax.random.split(key)
                d = pred(image, sizes, sizes, sub)
                _ = np.asarray(d.boxes)  # per-image host fetch = deployment
            lat = (time.time() - t0) / iters
        print(f"{name}: {lat * 1e3:.1f} ms/image (batch-1, steady state)",
              flush=True)

    cfg = base_cfg()
    cfg.PROBABILISTIC_INFERENCE.INFERENCE_MODE = "standard_nms"
    measure("standard_nms", cfg)

    cfg = base_cfg()
    cfg.PROBABILISTIC_INFERENCE.INFERENCE_MODE = "bayes_od"
    cfg.PROBABILISTIC_INFERENCE.MC_DROPOUT.ENABLE = True
    cfg.PROBABILISTIC_INFERENCE.MC_DROPOUT.NUM_RUNS = 10
    cfg.PROBABILISTIC_INFERENCE.BAYES_OD.CLS_MERGE_MODE = "max_score"
    measure("bayes_od + mc_dropout(10)", cfg)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--trials", type=int, default=4)
    args = parser.parse_args()
    main(args.trials)
