"""Stage-split roofline for the MC-dropout POST-NMS merge pipeline.

VERDICT r3 weak #4: the post-NMS merge (reference:
probabilistic_inference.py:444-481 + inference_utils.py:165-289) runs at
~22-27 img/s — 2x slower than BayesOD+MC at identical head FLOPs — and
never got the stage account BayesOD (DESIGN.md §5) and training (§5b)
did. This tool times each stage as its own jitted program (explicit host
fetches; remote-tunnel rule):

  1. backbone                       (shared with every mode)
  2. MC head bank x RUNS            (shared with bayes_od; ~roofline)
  3. per-unit candidate core        (B*M units — 10x bayes_od's B)
  4. per-unit core + standard NMS   (adds the 100-step NMS scan x B*M)
  5. black-box merge              — per image on (M*max_dets) members:
     5a. pairwise IoU (1000x1000)
     5b. greedy sequential clustering (while_loop)
     5c. cluster statistics
     5d. final batched NMS
  6. full jitted pipeline           (the production program)

Stages over-count fusion/overlap (the full pipeline fuses 3-5 into one
program), so rows bound stages from above; the full-pipeline row is the
ground truth. Prints one JSON dict.

Usage: python tools/bench_postnms_breakdown.py [batch] [--nms-max-out N]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BDD_CANVAS = (736, 1280)
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
    return dt * 1000


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = int(args[0]) if args else 16

    import jax
    import jax.numpy as jnp

    from pod_compare_tpu.utils import enable_persistent_cache

    enable_persistent_cache()

    from pod_compare_tpu.config import get_cfg
    from pod_compare_tpu.inference import modes as M
    from pod_compare_tpu.inference.core import probabilistic_inference_core
    from pod_compare_tpu.models import (
        build_anchor_generator,
        build_model,
        init_model_params,
    )
    from pod_compare_tpu.ops.boxes import pairwise_iou
    from pod_compare_tpu.ops.fusion import (
        cluster_statistics,
        greedy_sequential_clusters,
    )
    from pod_compare_tpu.ops.nms import batched_nms

    cfg = get_cfg()
    cfg.MODEL.RETINANET.NUM_CLASSES = 7
    cfg.MODEL.PROBABILISTIC_MODELING.DROPOUT_RATE = 0.2
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NAME = "loss_attenuation"
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NUM_SAMPLES = 10
    cfg.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NAME = (
        "negative_log_likelihood"
    )
    cfg.PROBABILISTIC_INFERENCE.AFFINITY_THRESHOLD = 0.9

    model = build_model(cfg)
    params = init_model_params(model, BDD_CANVAS, seed=0)
    gen = build_anchor_generator(cfg)
    anchors = jnp.asarray(gen.concatenated(BDD_CANVAS))
    level_sizes = tuple(a.shape[0] for a in gen.per_level(BDD_CANVAS))
    R = anchors.shape[0]
    K = 7
    max_dets = int(cfg.TEST.DETECTIONS_PER_IMAGE)
    nms_thresh = float(cfg.MODEL.RETINANET.NMS_THRESH_TEST)
    affinity = float(cfg.PROBABILISTIC_INFERENCE.AFFINITY_THRESHOLD)
    units = batch * RUNS

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, *BDD_CANVAS, 3) * 255, jnp.float32)
    key = jax.random.PRNGKey(0)
    report = {"batch": batch, "runs": RUNS, "max_dets": max_dets}

    # ---- 1. backbone
    backbone = jax.jit(
        lambda p, x: model.apply({"params": p}, x, method="backbone")
    )
    report["backbone_ms"] = timeit(
        "1. backbone", lambda: backbone(params, images),
        lambda o: np.asarray(o[0][0, 0, 0, 0]),
    )
    feats = backbone(params, images)

    # ---- 2. head bank
    def head_bank(p, f, k):
        keys = jax.random.split(k, RUNS)
        return jax.vmap(
            lambda kk: model.apply(
                {"params": p}, f, False, True, method="forward_head",
                rngs={"dropout": kk},
            )
        )(keys)

    jbank = jax.jit(head_bank)
    report["head_bank_ms"] = timeit(
        "2. head bank x10", lambda: jbank(params, feats, key),
        lambda o: np.asarray(o["box_cls"][0, 0, 0, 0]),
    )

    # Synthetic per-unit head outputs at realistic magnitudes (throughput
    # is content-independent; scores sit mostly under the 0.05 thresh like
    # a trained detector's background anchors).
    rngs = np.random.RandomState(1)
    u_cls = jnp.asarray(rngs.randn(units, R, K).astype(np.float32) - 3)
    u_delta = jnp.asarray(rngs.randn(units, R, 4).astype(np.float32) * 0.1)
    u_cvar = jnp.asarray(rngs.randn(units, R, K).astype(np.float32) - 6)
    u_rvar = jnp.asarray(rngs.randn(units, R, 4).astype(np.float32) - 4)
    core_kwargs = dict(
        topk=int(cfg.MODEL.RETINANET.TOPK_CANDIDATES_TEST),
        level_sizes=level_sizes,
        score_thresh=float(cfg.MODEL.RETINANET.SCORE_THRESH_TEST),
        cls_num_samples=10, box_num_samples=1000,
        box_reg_weights=tuple(cfg.MODEL.RETINANET.BBOX_REG_WEIGHTS),
        cls_sampling="analytic", box_sampling="analytic",
    )

    # ---- 3a-3c. core sub-stages (what dominates the per-unit core?)
    from pod_compare_tpu.inference.core import (
        _topk_candidates,
        classification_probs,
    )
    from pod_compare_tpu.ops.boxes import decoded_box_moments
    from pod_compare_tpu.ops.gaussian import covariance_output_to_cholesky

    def cls_probs_only(c, cv):
        return jax.vmap(
            lambda ci, cvi: classification_probs(
                None, ci, cvi, 10, impl="analytic"
            )
        )(c, cv)

    jcp = jax.jit(cls_probs_only)
    report["unit_cls_probs_ms"] = timeit(
        f"3a. cls probs (GH-32) x{units}",
        lambda: jcp(u_cls, u_cvar),
        lambda o: np.asarray(o[0, 0, 0]),
    )
    probs_u = jcp(u_cls, u_cvar)

    def topk_only(p):
        def one(pi):
            return _topk_candidates(jnp.max(pi, axis=1), 1000, level_sizes)

        return jax.vmap(one)(p)

    jtk = jax.jit(topk_only)
    report["unit_topk_ms"] = timeit(
        f"3b. per-level top-k x{units}",
        lambda: jtk(probs_u),
        lambda o: np.asarray(o[0][0, 0]),
    )
    _, top_idx_u = jtk(probs_u)

    def box_moments_only(d, rv, ti):
        def one(di, rvi, tii):
            sel_d = di[tii]
            sel_a = anchors[tii]
            chol = covariance_output_to_cholesky(rvi[tii])
            delta_cov = jnp.einsum(
                "cij,ckj->cik", chol, chol, precision="highest"
            )
            return decoded_box_moments(
                sel_d, delta_cov, sel_a,
                tuple(cfg.MODEL.RETINANET.BBOX_REG_WEIGHTS),
            )

        return jax.vmap(one)(d, rv, ti)

    jbm = jax.jit(box_moments_only)
    report["unit_box_moments_ms"] = timeit(
        f"3c. analytic box moments x{units}",
        lambda: jbm(u_delta, u_rvar, top_idx_u),
        lambda o: np.asarray(o[0][0, 0]),
    )

    # ---- 3. per-unit candidate core (no NMS)
    def core_only(k, c, d, cv, rv):
        keys = jax.random.split(k, units)
        return jax.vmap(
            lambda kk, ci, di, cvi, rvi: probabilistic_inference_core(
                kk, anchors, ci, di, cvi, rvi, None, **core_kwargs
            )
        )(keys, c, d, cv, rv)

    jcore = jax.jit(core_only)
    report["unit_core_ms"] = timeit(
        f"3. per-unit core x{units}",
        lambda: jcore(key, u_cls, u_delta, u_cvar, u_rvar),
        lambda o: np.asarray(o.boxes[0, 0, 0]),
    )

    # ---- 4. per-unit core + NMS
    def core_nms(k, c, d, cv, rv):
        keys = jax.random.split(k, units)

        def one(kk, ci, di, cvi, rvi):
            cands = probabilistic_inference_core(
                kk, anchors, ci, di, cvi, rvi, None, **core_kwargs
            )
            return M.standard_nms(cands, nms_thresh, max_dets)

        return jax.vmap(one)(keys, c, d, cv, rv)

    jcn = jax.jit(core_nms)
    report["unit_core_nms_ms"] = timeit(
        f"4. per-unit core+NMS x{units}",
        lambda: jcn(key, u_cls, u_delta, u_cvar, u_rvar),
        lambda o: np.asarray(o.boxes[0, 0, 0]),
    )
    report["unit_nms_ms"] = report["unit_core_nms_ms"] - report["unit_core_ms"]

    # Real per-unit detections -> (B, M*D) member sets for the merge legs.
    units_out = jcn(key, u_cls, u_delta, u_cvar, u_rvar)
    members = jax.tree_util.tree_map(
        lambda x: x.reshape((batch, RUNS * x.shape[1]) + x.shape[2:]),
        units_out,
    )
    N = RUNS * max_dets

    # ---- 5a. pairwise IoU (B, N, N)
    jiou = jax.jit(lambda b: jax.vmap(pairwise_iou, (0, 0))(b, b))
    report["merge_iou_ms"] = timeit(
        f"5a. pairwise IoU {N}x{N}",
        lambda: jiou(members.boxes),
        lambda o: np.asarray(o[0, 0, 0]),
    )
    iou = jiou(members.boxes)

    # ---- 5b. greedy clustering
    jclus = jax.jit(
        jax.vmap(
            lambda i, c, v: greedy_sequential_clusters(i, c, v, affinity)
        )
    )
    report["merge_cluster_ms"] = timeit(
        "5b. greedy clustering",
        lambda: jclus(iou, members.classes, members.valid),
        lambda o: np.asarray(o[0][0, 0]),
    )
    centers, memmask = jclus(iou, members.classes, members.valid)

    # ---- 5c. cluster statistics
    jstats = jax.jit(
        jax.vmap(
            lambda mm, b, p, c: cluster_statistics(
                mm, b, p, c, min_members=2,
                center_idx=jnp.arange(N),
            )
        )
    )
    report["merge_stats_ms"] = timeit(
        "5c. cluster statistics",
        lambda: jstats(memmask, members.boxes, members.prob_vectors,
                       members.covs),
        lambda o: np.asarray(o[0][0, 0]),
    )

    # ---- 5d. final NMS over N merged rows
    boxes_m, probs_m, _ = jstats(
        memmask, members.boxes, members.prob_vectors, members.covs
    )
    scores_m = jnp.max(probs_m, axis=-1)
    classes_m = jnp.argmax(probs_m, axis=-1).astype(jnp.int32)
    jfnms = jax.jit(
        jax.vmap(
            lambda b, s, c, v: batched_nms(b, s, c, v, nms_thresh, max_dets)
        )
    )
    report["merge_final_nms_ms"] = timeit(
        "5d. final NMS",
        lambda: jfnms(boxes_m, scores_m, classes_m, centers),
        lambda o: np.asarray(o[0][0, 0]),
    )

    # ---- 6. full production pipeline
    from pod_compare_tpu.inference.predictor import build_predictor

    cfg.PROBABILISTIC_INFERENCE.INFERENCE_MODE = "mc_dropout_ensembles"
    cfg.PROBABILISTIC_INFERENCE.MC_DROPOUT.ENABLE = True
    cfg.PROBABILISTIC_INFERENCE.MC_DROPOUT.NUM_RUNS = RUNS
    cfg.PROBABILISTIC_INFERENCE.ENSEMBLES_DROPOUT.BOX_MERGE_MODE = "post_nms"
    predictor = build_predictor(cfg, BDD_CANVAS, params=params)
    sizes = np.tile(np.array([720.0, 1280.0], np.float32), (batch, 1))
    report["full_pipeline_ms"] = timeit(
        "6. full post-NMS merge pipeline",
        lambda: predictor(images, sizes, sizes, key),
        lambda o: np.asarray(o.boxes[0, 0, 0]),
    )
    report["img_per_s"] = batch / (report["full_pipeline_ms"] / 1e3)

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
