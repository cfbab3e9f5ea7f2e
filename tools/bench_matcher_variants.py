"""Matcher micro-bench: why does (G=40, R=176k) label assignment cost
~22 ms/step (batch 8) when its FLOPs are ~1 GFLOP?

Variants (each its own jitted program, explicit host fetches):
  A. production `label_anchors_batch`
  B. + optimization_barrier after the IoU matrix (force ONE
     materialization instead of XLA re-deriving it into every consumer
     fusion — argmax, max, per-gt max, is-best, forced)
  C. no low-quality rule (drops 2 of the 5 consumers — lower bound)
  D. IoU matrix alone + argmax+max (the minimal core)

Usage: python tools/bench_matcher_variants.py [BATCH] [G]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BDD_CANVAS = (736, 1280)
BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
G = int(sys.argv[2]) if len(sys.argv) > 2 else 40
TRIALS = 20
WARMUP = 5


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit(name, fn, fetch):
    for _ in range(WARMUP):
        out = fn()
    _ = fetch(out)
    t0 = time.time()
    for _ in range(TRIALS):
        out = fn()
    _ = fetch(out)
    dt = (time.time() - t0) / TRIALS
    log(f"{name}: {dt * 1e3:.2f} ms")
    return round(dt * 1e3, 2)


def main():
    import jax

    if os.environ.get("FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pod_compare_tpu.utils import enable_persistent_cache

    enable_persistent_cache()

    from pod_compare_tpu.config import get_cfg
    from pod_compare_tpu.models import build_anchor_generator
    from pod_compare_tpu.ops.boxes import pairwise_iou
    from pod_compare_tpu.ops.matcher import label_anchors_batch

    cfg = get_cfg()
    gen = build_anchor_generator(cfg)
    anchors = jnp.asarray(gen.concatenated(BDD_CANVAS))
    R = anchors.shape[0]
    rng = np.random.RandomState(0)

    def make_box():
        x1 = rng.rand() * 1000
        y1 = rng.rand() * 600
        return np.array(
            [x1, y1, x1 + 20 + rng.rand() * 200, y1 + 20 + rng.rand() * 100],
            np.float32,
        )

    gt_boxes = jnp.asarray(
        np.stack([np.stack([make_box() for _ in range(G)])
                  for _ in range(BATCH)])
    )
    gt_classes = jnp.asarray(rng.randint(0, 7, (BATCH, G)), jnp.int32)
    gt_valid = jnp.ones((BATCH, G), bool)

    report = {"batch": BATCH, "G": G, "R": int(R)}

    # A. production
    ja = jax.jit(
        lambda b, c, v: label_anchors_batch(anchors, b, c, v, 7, (0.4, 0.5))
    )
    report["A_production"] = timeit(
        "A production", lambda: ja(gt_boxes, gt_classes, gt_valid),
        lambda o: np.asarray(o.gt_classes[0, 0]),
    )

    # B. barrier after IoU
    def label_barrier(gtb, gtc, gtv):
        def one(b, c, v):
            iou = pairwise_iou(b, anchors)
            iou = jnp.where(v[:, None], iou, -1.0)
            iou = jax.lax.optimization_barrier(iou)
            matched_idx = jnp.argmax(iou, axis=0)
            matched_iou = jnp.max(iou, axis=0)
            label = jnp.where(
                matched_iou >= 0.5, 1, jnp.where(matched_iou >= 0.4, -1, 0)
            )
            highest_per_gt = jnp.max(iou, axis=1)
            is_best = (iou == highest_per_gt[:, None]) & (
                highest_per_gt > 0
            )[:, None]
            forced = jnp.any(is_best & v[:, None], axis=0)
            label = jnp.where(forced, 1, label)
            anchor_classes = jnp.where(
                label == 1, c[matched_idx], jnp.where(label == 0, 7, -1)
            ).astype(jnp.int32)
            return anchor_classes, b[matched_idx]

        return jax.vmap(one)(gtb, gtc, gtv)

    jb = jax.jit(label_barrier)
    report["B_iou_barrier"] = timeit(
        "B iou barrier", lambda: jb(gt_boxes, gt_classes, gt_valid),
        lambda o: np.asarray(o[0][0, 0]),
    )

    # C. no low-quality rule
    def label_no_lq(gtb, gtc, gtv):
        def one(b, c, v):
            iou = pairwise_iou(b, anchors)
            iou = jnp.where(v[:, None], iou, -1.0)
            matched_idx = jnp.argmax(iou, axis=0)
            matched_iou = jnp.max(iou, axis=0)
            label = jnp.where(
                matched_iou >= 0.5, 1, jnp.where(matched_iou >= 0.4, -1, 0)
            )
            anchor_classes = jnp.where(
                label == 1, c[matched_idx], jnp.where(label == 0, 7, -1)
            ).astype(jnp.int32)
            return anchor_classes, b[matched_idx]

        return jax.vmap(one)(gtb, gtc, gtv)

    jc = jax.jit(label_no_lq)
    report["C_no_low_quality"] = timeit(
        "C no low-quality", lambda: jc(gt_boxes, gt_classes, gt_valid),
        lambda o: np.asarray(o[0][0, 0]),
    )

    # D. IoU + argmax/max only
    def iou_core(gtb, gtv):
        def one(b, v):
            iou = pairwise_iou(b, anchors)
            iou = jnp.where(v[:, None], iou, -1.0)
            return jnp.argmax(iou, axis=0), jnp.max(iou, axis=0)

        return jax.vmap(one)(gtb, gtv)

    jd = jax.jit(iou_core)
    report["D_iou_argmax_only"] = timeit(
        "D iou+argmax only", lambda: jd(gt_boxes, gt_valid),
        lambda o: np.asarray(o[0][0, 0]),
    )

    # E. D + the box gather alone (suspected cost: (R,) gathers from (G,4)
    # run on the scalar unit)
    def with_box_gather(gtb, gtv):
        def one(b, v):
            iou = pairwise_iou(b, anchors)
            iou = jnp.where(v[:, None], iou, -1.0)
            idx = jnp.argmax(iou, axis=0)
            return idx, b[idx]

        return jax.vmap(one)(gtb, gtv)

    je = jax.jit(with_box_gather)
    report["E_plus_box_gather"] = timeit(
        "E + box gather", lambda: je(gt_boxes, gt_valid),
        lambda o: np.asarray(o[1][0, 0, 0]),
    )

    # F. full production semantics with one-hot matmuls instead of gathers
    def label_onehot(gtb, gtc, gtv):
        def one(b, c, v):
            iou = pairwise_iou(b, anchors)
            iou = jnp.where(v[:, None], iou, -1.0)
            matched_idx = jnp.argmax(iou, axis=0)
            matched_iou = jnp.max(iou, axis=0)
            label = jnp.where(
                matched_iou >= 0.5, 1, jnp.where(matched_iou >= 0.4, -1, 0)
            )
            highest_per_gt = jnp.max(iou, axis=1)
            is_best = (iou == highest_per_gt[:, None]) & (
                highest_per_gt > 0
            )[:, None]
            forced = jnp.any(is_best & v[:, None], axis=0)
            label = jnp.where(forced, 1, label)
            onehot = jax.nn.one_hot(matched_idx, b.shape[0], axis=0,
                                    dtype=jnp.float32)  # (G, R)
            cls_f = jnp.einsum("gr,g->r", onehot, gtcf := c.astype(jnp.float32))
            matched_cls = cls_f.astype(jnp.int32)
            anchor_classes = jnp.where(
                label == 1, matched_cls, jnp.where(label == 0, 7, -1)
            ).astype(jnp.int32)
            matched_boxes = jnp.einsum(
                "gr,gc->rc", onehot, b, precision="highest"
            )
            return anchor_classes, matched_boxes

        return jax.vmap(one)(gtb, gtc, gtv)

    jf = jax.jit(label_onehot)
    report["F_onehot_matmul"] = timeit(
        "F one-hot matmul", lambda: jf(gt_boxes, gt_classes, gt_valid),
        lambda o: np.asarray(o[0][0, 0]),
    )

    # correctness: F must match A exactly
    a = ja(gt_boxes, gt_classes, gt_valid)
    f = jf(gt_boxes, gt_classes, gt_valid)
    np.testing.assert_array_equal(np.asarray(a.gt_classes), np.asarray(f[0]))
    np.testing.assert_allclose(
        np.asarray(a.matched_boxes), np.asarray(f[1]), rtol=0, atol=0
    )
    report["F_matches_A"] = True

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
