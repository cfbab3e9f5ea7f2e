"""Measure the round-2 sampling optimizations on TPU at BDD geometry:

  1. MC head bank x10: iid masks vs batch-shared masks
     (PROBABILISTIC_INFERENCE.MC_DROPOUT.BATCH_SHARED_MASKS)
  2. candidate core: box_sampling mc_iid / mc_shared / analytic
     and cls_sampling mc_iid / mc_shared / analytic

Prints one JSON dict. Usage: python tools/bench_sampling_impls.py [batch]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BDD_CANVAS = (736, 1280)
BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 16
RUNS = 10
TRIALS = 6
WARMUP = 4


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit(name, fn, fetch, warmup=WARMUP, trials=TRIALS):
    for _ in range(warmup):
        out = fn()
    _ = fetch(out)
    t0 = time.time()
    for _ in range(trials):
        out = fn()
    _ = fetch(out)
    dt = (time.time() - t0) / trials
    log(f"{name}: {dt * 1000:.1f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from pod_compare_tpu.utils import enable_persistent_cache

    enable_persistent_cache()

    from pod_compare_tpu.config import get_cfg
    from pod_compare_tpu.inference.core import probabilistic_inference_core
    from pod_compare_tpu.models import (
        build_anchor_generator,
        build_model,
        init_model_params,
    )

    cfg = get_cfg()
    cfg.MODEL.RETINANET.NUM_CLASSES = 7
    cfg.MODEL.PROBABILISTIC_MODELING.DROPOUT_RATE = 0.2
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NAME = "loss_attenuation"
    cfg.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NAME = "negative_log_likelihood"

    model = build_model(cfg)
    params = init_model_params(model, BDD_CANVAS, seed=0)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(BATCH, *BDD_CANVAS, 3) * 255, jnp.float32)
    key = jax.random.PRNGKey(0)

    report = {"batch": BATCH, "runs": RUNS}

    backbone = jax.jit(
        lambda p, x: model.apply({"params": p}, x, method="backbone")
    )
    feats = backbone(params, images)

    # iid masks in the vmapped bank OOM at batch 16 with the per-layer
    # fused draws ((10, B*5M) f32 uniforms per layer): the bank always
    # runs batch-shared in production (MC_DROPOUT.BATCH_SHARED_MASKS);
    # the iid bank number from the per-conv-draw era is 403 ms.
    for impl in ("bernoulli", "packed2", "packed4", "rbg"):
        cfg_v = cfg.clone()
        cfg_v.MODEL.PROBABILISTIC_MODELING.DROPOUT_IMPL = impl
        model_v = build_model(cfg_v)

        def head_bank(p, f, k, _m=model_v):
            keys = jax.random.split(k, RUNS)
            return jax.vmap(
                lambda kk: _m.apply(
                    {"params": p}, f, False, True,
                    method="forward_head", rngs={"dropout": kk},
                )
            )(keys)

        jf = jax.jit(head_bank)
        try:
            report[f"head_bank_shared_{impl}_ms"] = 1e3 * timeit(
                f"head bank x10, shared masks, {impl}",
                lambda: jf(params, feats, key),
                lambda o: np.asarray(o["box_cls"][0, 0, 0, 0]),
            )
        except Exception as exc:
            log(f"{impl} FAILED: {exc}")
            report[f"head_bank_shared_{impl}_ms"] = None

    # ---- candidate core variants on synthetic head outputs
    gen = build_anchor_generator(cfg)
    anchors = jnp.asarray(gen.concatenated(BDD_CANVAS))
    level_sizes = tuple(a.shape[0] for a in gen.per_level(BDD_CANVAS))
    R = anchors.shape[0]
    box_cls = jnp.asarray(rng.randn(BATCH, R, 7).astype(np.float32) - 3)
    box_delta = jnp.asarray(rng.randn(BATCH, R, 4).astype(np.float32) * 0.1)
    box_cls_var = jnp.asarray(rng.randn(BATCH, R, 7).astype(np.float32) - 6)
    box_reg_var = jnp.asarray(rng.randn(BATCH, R, 4).astype(np.float32) - 4)

    for cls_s, box_s in (
        ("mc_iid", "mc_iid"),
        ("mc_shared", "mc_shared"),
        ("analytic", "analytic"),
        ("mc_shared", "analytic"),
    ):
        def core_full(k, bc, bd, bv, rv, _c=cls_s, _b=box_s):
            keys = jax.random.split(k, BATCH)
            return jax.vmap(
                lambda kk, c, d, v, r: probabilistic_inference_core(
                    kk, anchors, c, d, v, r, None,
                    topk=1000, score_thresh=0.05, cls_num_samples=10,
                    box_num_samples=1000, level_sizes=level_sizes,
                    cls_sampling=_c, box_sampling=_b,
                )
            )(keys, bc, bd, bv, rv)

        jf = jax.jit(core_full)
        report[f"core_{cls_s}_{box_s}_ms"] = 1e3 * timeit(
            f"core cls={cls_s} box={box_s}",
            lambda: jf(key, box_cls, box_delta, box_cls_var, box_reg_var),
            lambda o: np.asarray(o.boxes[0, 0, 0]),
        )

    print(json.dumps(report))
    with open("/tmp/bench_sampling.json", "w") as f:
        json.dump(report, f)


if __name__ == "__main__":
    main()
