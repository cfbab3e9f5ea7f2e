"""Per-mode inference throughput benchmark (BDD geometry, real TPU).

Reproduces the per-mode steady-state table in STATUS.md/DESIGN.md §5:

    python tools/bench_modes.py [--batch 16] [--trials 3]

Each mode compiles its own XLA program; the first timed trial after a
compile runs slow on the remote tunnel, so per-mode numbers report the
LAST trial (steady state).
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main(batch: int, trials: int, canvas=(736, 1280)):
    import jax
    import jax.numpy as jnp

    from pod_compare_tpu.config import get_cfg
    from pod_compare_tpu.inference.predictor import build_predictor
    from pod_compare_tpu.models import build_model, init_model_params

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
    images = jnp.asarray(rng.rand(batch, *canvas, 3) * 255, jnp.float32)
    sizes = np.tile(np.array([720.0, 1280.0], np.float32), (batch, 1))

    def measure(name, cfg, params_list=None):
        pred = build_predictor(
            cfg, canvas, params=None if params_list else params,
            params_list=params_list,
        )
        key = jax.random.PRNGKey(0)
        d = pred(images, sizes, sizes, key)
        _ = np.asarray(d.boxes)
        rate = None
        for _trial in range(trials):
            t0 = time.time()
            iters = 5
            for _ in range(iters):
                key, sub = jax.random.split(key)
                d = pred(images, sizes, sizes, sub)
            _ = np.asarray(d.boxes)
            rate = batch * iters / (time.time() - t0)
        print(f"{name}: {rate:.1f} img/s (steady state)", flush=True)

    cfg = base_cfg()
    cfg.PROBABILISTIC_INFERENCE.INFERENCE_MODE = "standard_nms"
    measure("standard_nms", cfg)

    cfg = base_cfg()
    cfg.PROBABILISTIC_INFERENCE.INFERENCE_MODE = "anchor_statistics"
    measure("anchor_statistics", cfg)

    cfg = base_cfg()
    cfg.PROBABILISTIC_INFERENCE.INFERENCE_MODE = "bayes_od"
    cfg.PROBABILISTIC_INFERENCE.MC_DROPOUT.ENABLE = True
    cfg.PROBABILISTIC_INFERENCE.MC_DROPOUT.NUM_RUNS = 10
    cfg.PROBABILISTIC_INFERENCE.BAYES_OD.CLS_MERGE_MODE = "max_score"
    measure("bayes_od + mc_dropout(10)", cfg)

    cfg = base_cfg()
    cfg.PROBABILISTIC_INFERENCE.INFERENCE_MODE = "mc_dropout_ensembles"
    cfg.PROBABILISTIC_INFERENCE.MC_DROPOUT.ENABLE = True
    cfg.PROBABILISTIC_INFERENCE.MC_DROPOUT.NUM_RUNS = 10
    cfg.PROBABILISTIC_INFERENCE.ENSEMBLES_DROPOUT.BOX_MERGE_MODE = "post_nms"
    measure("mc_dropout post_nms(10)", cfg)

    cfg = base_cfg()
    cfg.PROBABILISTIC_INFERENCE.INFERENCE_MODE = "ensembles"
    cfg.PROBABILISTIC_INFERENCE.ENSEMBLES.BOX_MERGE_MODE = "pre_nms"
    measure("ensembles pre_nms(5)", cfg, params_list=[params] * 5)

    cfg = base_cfg()
    cfg.PROBABILISTIC_INFERENCE.INFERENCE_MODE = "ensembles"
    cfg.PROBABILISTIC_INFERENCE.ENSEMBLES.BOX_MERGE_MODE = "post_nms"
    measure("ensembles post_nms(5)", cfg, params_list=[params] * 5)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--trials", type=int, default=3)
    args = parser.parse_args()
    main(args.batch, args.trials)
