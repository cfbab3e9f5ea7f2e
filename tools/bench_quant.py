"""Int8-quantized head-tower benchmark + accuracy probe (real TPU).

Measures BayesOD + MC-dropout(10) steady-state throughput at BDD geometry
with PROBABILISTIC_INFERENCE.HEAD_QUANT none vs int8, plus the raw head
output perturbation the quantization introduces.

    python tools/bench_quant.py [--batch 16] [--trials 3]

Context (DESIGN.md §5/§5c): the bf16 MC head bank is conv-roofline-bound,
so int8 (v5e MXU ~2x bf16; measured 206 TOP/s vs 121 TFLOP/s on the P3
tower conv) is the only remaining throughput lever.
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
    from pod_compare_tpu.utils import enable_persistent_cache
    from pod_compare_tpu.utils.hbm_guard import guarded_compile

    enable_persistent_cache()

    def build_cfg(quant: str):
        cfg = get_cfg()
        cfg.MODEL.RETINANET.NUM_CLASSES = 7
        cfg.MODEL.PROBABILISTIC_MODELING.DROPOUT_RATE = 0.2
        cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NAME = "loss_attenuation"
        cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NUM_SAMPLES = 10
        cfg.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NAME = (
            "negative_log_likelihood"
        )
        cfg.PROBABILISTIC_INFERENCE.INFERENCE_MODE = "bayes_od"
        cfg.PROBABILISTIC_INFERENCE.AFFINITY_THRESHOLD = 0.9
        cfg.PROBABILISTIC_INFERENCE.MC_DROPOUT.ENABLE = True
        cfg.PROBABILISTIC_INFERENCE.MC_DROPOUT.NUM_RUNS = 10
        cfg.PROBABILISTIC_INFERENCE.BAYES_OD.CLS_MERGE_MODE = "max_score"
        cfg.PROBABILISTIC_INFERENCE.HEAD_QUANT = quant
        return cfg

    model = build_model(build_cfg("none"))
    params = init_model_params(model, canvas, seed=0)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, *canvas, 3) * 255, jnp.float32)
    sizes = jnp.asarray(
        np.tile(np.array([720.0, 1280.0], np.float32), (batch, 1))
    )

    rates = {}
    for quant in ("none", "int8"):
        cfg = build_cfg(quant)
        pred = build_predictor(cfg, canvas, params=params)
        compiled, info = guarded_compile(
            pred._fn, (pred.params, images, jax.random.PRNGKey(0), sizes, sizes),
            name=f"bayes_od_mc10_quant_{quant}",
            log=lambda m: print(m, flush=True),
        )
        if info.get("skipped_oom_guard"):
            print(f"quant={quant}: skipped (HBM guard)", flush=True)
            continue
        run = (lambda c: (lambda k: c(pred.params, images, k, sizes, sizes)))(
            compiled
        ) if compiled is not None else (
            lambda k: pred._fn(pred.params, images, k, sizes, sizes)
        )
        key = jax.random.PRNGKey(0)
        d = run(key)
        _ = np.asarray(d.boxes)
        rate = None
        for _trial in range(trials):
            t0 = time.time()
            iters = 5
            for _ in range(iters):
                key, sub = jax.random.split(key)
                d = run(sub)
            _ = np.asarray(d.boxes)
            rate = batch * iters / (time.time() - t0)
            print(f"quant={quant} trial: {rate:.1f} img/s", flush=True)
        rates[quant] = rate
        print(f"quant={quant}: {rate:.1f} img/s (steady state)", flush=True)

    if "none" in rates and "int8" in rates:
        print(
            f"SPEEDUP int8/none at batch {batch}: "
            f"{rates['int8'] / rates['none']:.3f}x", flush=True
        )


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--trials", type=int, default=3)
    args = parser.parse_args()
    main(args.batch, args.trials)
