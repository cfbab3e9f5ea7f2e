"""Decompose BayesOD+MC-dropout batch time (per-stage jitted timings).

CAUTION — (2) "no-dropout bank" is a CSE ARTIFACT, not a baseline: a
vmapped bank of DETERMINISTIC head passes is deduplicated by XLA into ONE
pass, so (3)-(2) wildly overstates "dropout cost". Round 1 misread this
as the head running at 50% of the conv ceiling; the real bank is
roofline-bound (~89% of the measured bf16 conv ceiling — DESIGN.md §5).
Kept for the per-stage numbers; use tools/bench_sampling_impls.py for
the production head-bank/core measurements.

Times, with explicit host fetches (remote-tunnel rule: no bare
block_until_ready), each as its own jitted program:
  1. backbone only
  2. backbone + MC head bank WITHOUT dropout   (CSE's to ONE pass — see above)
  3. backbone + MC head bank WITH dropout      (production path)
  4. dropout-mask generation alone at head activation volumes
  5. full BayesOD pipeline

Prints one JSON dict.
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
    from pod_compare_tpu.models import build_model, init_model_params

    cfg = get_cfg()
    cfg.MODEL.RETINANET.NUM_CLASSES = 7
    cfg.MODEL.PROBABILISTIC_MODELING.DROPOUT_RATE = 0.2
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NAME = "loss_attenuation"
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NUM_SAMPLES = 10
    cfg.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NAME = "negative_log_likelihood"
    cfg.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NUM_SAMPLES = 1000

    model = build_model(cfg)
    params = init_model_params(model, BDD_CANVAS, seed=0)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(BATCH, *BDD_CANVAS, 3) * 255, jnp.float32)
    key = jax.random.PRNGKey(0)

    report = {"batch": BATCH, "runs": RUNS}

    # ---- 1. backbone
    backbone = jax.jit(
        lambda p, x: model.apply({"params": p}, x, method="backbone")
    )
    report["backbone_ms"] = 1e3 * timeit(
        "backbone", lambda: backbone(params, images),
        lambda o: np.asarray(o[0][0, 0, 0, 0]),
    )
    feats = backbone(params, images)

    # ---- 2. MC head bank without dropout (deterministic head, same vmap)
    def head_bank_nodrop(p, f, k):
        keys = jax.random.split(k, RUNS)
        return jax.vmap(
            lambda _: model.apply({"params": p}, f, True, method="forward_head")
        )(keys)

    j2 = jax.jit(head_bank_nodrop)
    report["head_bank_nodropout_ms"] = 1e3 * timeit(
        "head bank x10, no dropout", lambda: j2(params, feats, key),
        lambda o: np.asarray(o["box_cls"][0, 0, 0, 0]),
    )

    # ---- 3. MC head bank with dropout (production structure)
    def head_bank_drop(p, f, k):
        keys = jax.random.split(k, RUNS)
        return jax.vmap(
            lambda kk: model.apply(
                {"params": p}, f, False, method="forward_head",
                rngs={"dropout": kk},
            )
        )(keys)

    j3 = jax.jit(head_bank_drop)
    report["head_bank_dropout_ms"] = 1e3 * timeit(
        "head bank x10, dropout", lambda: j3(params, feats, key),
        lambda o: np.asarray(o["box_cls"][0, 0, 0, 0]),
    )

    report["dropout_overhead_ms"] = (
        report["head_bank_dropout_ms"] - report["head_bank_nodropout_ms"]
    )

    # ---- 4. MC head bank with each alternative mask-bit source
    for impl in ("packed2", "packed4", "rbg"):
        cfg_v = cfg.clone()
        cfg_v.MODEL.PROBABILISTIC_MODELING.DROPOUT_IMPL = impl
        model_v = build_model(cfg_v)

        def head_bank_variant(p, f, k, _m=model_v):
            keys = jax.random.split(k, RUNS)
            return jax.vmap(
                lambda kk: _m.apply(
                    {"params": p}, f, False, method="forward_head",
                    rngs={"dropout": kk},
                )
            )(keys)

        jv = jax.jit(head_bank_variant)
        try:
            report[f"head_bank_{impl}_ms"] = 1e3 * timeit(
                f"head bank x10, {impl}", lambda: jv(params, feats, key),
                lambda o: np.asarray(o["box_cls"][0, 0, 0, 0]),
            )
        except Exception as exc:  # e.g. rbg vmap lowering unsupported
            log(f"{impl} FAILED: {exc}")
            report[f"head_bank_{impl}_ms"] = None

    # ---- 4c. candidate-core stages on synthetic head outputs
    from pod_compare_tpu.inference.core import (
        classification_probs,
        probabilistic_inference_core,
    )
    from pod_compare_tpu.models import build_anchor_generator

    gen = build_anchor_generator(cfg)
    anchors = jnp.asarray(gen.concatenated(BDD_CANVAS))
    level_sizes = tuple(a.shape[0] for a in gen.per_level(BDD_CANVAS))
    R = anchors.shape[0]
    rngs = np.random.RandomState(1)
    box_cls = jnp.asarray(rngs.randn(BATCH, R, 7).astype(np.float32) - 3)
    box_delta = jnp.asarray(rngs.randn(BATCH, R, 4).astype(np.float32) * 0.1)
    box_cls_var = jnp.asarray(rngs.randn(BATCH, R, 7).astype(np.float32) - 6)
    box_reg_var = jnp.asarray(rngs.randn(BATCH, R, 4).astype(np.float32) - 4)

    def cls_sampling(k, bc, bv):
        keys = jax.random.split(k, BATCH)
        return jax.vmap(
            lambda kk, c, v: classification_probs(kk, c, v, 10)
        )(keys, bc, bv)

    jc = jax.jit(cls_sampling)
    report["core_cls_sampling_ms"] = 1e3 * timeit(
        "core: cls prob sampling x10",
        lambda: jc(key, box_cls, box_cls_var),
        lambda o: np.asarray(o[0, 0, 0]),
    )

    def topk_only(probs_in):
        from pod_compare_tpu.inference.core import _topk_candidates

        def one(p):
            scores_all = jnp.max(p, axis=1)
            return _topk_candidates(scores_all, 1000, level_sizes)

        return jax.vmap(one)(probs_in)

    probs = jc(key, box_cls, box_cls_var)
    jt = jax.jit(topk_only)
    report["core_per_level_topk_ms"] = 1e3 * timeit(
        "core: per-level top-k",
        lambda: jt(probs),
        lambda o: np.asarray(o[0][0, 0]),
    )

    def core_full(k, bc, bd, bv, rv):
        keys = jax.random.split(k, BATCH)
        return jax.vmap(
            lambda kk, c, d, v, r: probabilistic_inference_core(
                kk, anchors, c, d, v, r, None,
                topk=1000, score_thresh=0.05, cls_num_samples=10,
                box_num_samples=1000, level_sizes=level_sizes,
            )
        )(keys, bc, bd, bv, rv)

    jf = jax.jit(core_full)
    report["core_full_ms"] = 1e3 * timeit(
        "core: full candidate core",
        lambda: jf(key, box_cls, box_delta, box_cls_var, box_reg_var),
        lambda o: np.asarray(o.boxes[0, 0, 0]),
    )

    # ---- 5. full pipeline
    from pod_compare_tpu.inference.predictor import build_predictor

    cfg.PROBABILISTIC_INFERENCE.INFERENCE_MODE = "bayes_od"
    cfg.PROBABILISTIC_INFERENCE.AFFINITY_THRESHOLD = 0.9
    cfg.PROBABILISTIC_INFERENCE.MC_DROPOUT.ENABLE = True
    cfg.PROBABILISTIC_INFERENCE.MC_DROPOUT.NUM_RUNS = RUNS
    cfg.PROBABILISTIC_INFERENCE.BAYES_OD.CLS_MERGE_MODE = "max_score"
    cfg.PROBABILISTIC_INFERENCE.BAYES_OD.BOX_MERGE_MODE = "bayesian_inference"
    predictor = build_predictor(cfg, BDD_CANVAS, params=params)
    sizes = np.tile(np.array([720.0, 1280.0], np.float32), (BATCH, 1))
    report["full_pipeline_ms"] = 1e3 * timeit(
        "full bayes_od pipeline",
        lambda: predictor(images, sizes, sizes, key),
        lambda o: np.asarray(o.boxes[0, 0, 0]),
    )
    report["img_per_s"] = BATCH / (report["full_pipeline_ms"] / 1e3)

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
