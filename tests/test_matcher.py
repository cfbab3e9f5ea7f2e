"""Anchor-matching tests against a port of detectron2's Matcher semantics."""

import numpy as np
import jax.numpy as jnp

from pod_compare_tpu.ops.boxes import pairwise_iou
from pod_compare_tpu.ops.matcher import label_anchors, label_anchors_batch


def oracle_label_anchors(anchors, gt_boxes, gt_classes, num_classes, lo=0.4, hi=0.5):
    """Numpy port of detectron2 Matcher(+low-quality) + label_anchors."""
    if len(gt_boxes) == 0:
        return np.full(len(anchors), num_classes), np.zeros((len(anchors), 4))
    iou = np.asarray(pairwise_iou(jnp.asarray(gt_boxes), jnp.asarray(anchors)))
    matched_idx = iou.argmax(0)
    matched_iou = iou.max(0)
    label = np.where(matched_iou >= hi, 1, np.where(matched_iou >= lo, -1, 0))
    highest = iou.max(1)
    for g in range(len(gt_boxes)):
        if highest[g] > 0:
            label[iou[g] == highest[g]] = 1
    cls = np.where(
        label == 1, gt_classes[matched_idx], np.where(label == 0, num_classes, -1)
    )
    return cls, gt_boxes[matched_idx]


def random_boxes(rng, n, size=200.0):
    xy = rng.rand(n, 2) * size
    wh = rng.rand(n, 2) * size * 0.3 + 5.0
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_matcher_matches_oracle(rng):
    anchors = random_boxes(rng, 120)
    gt = random_boxes(rng, 7)
    gt_cls = rng.randint(0, 7, 7)
    out = label_anchors(
        jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray(gt_cls),
        jnp.ones(7, bool), num_classes=7,
    )
    ref_cls, ref_boxes = oracle_label_anchors(anchors, gt, gt_cls, 7)
    np.testing.assert_array_equal(np.asarray(out.gt_classes), ref_cls)
    pos = ref_cls < 7
    np.testing.assert_allclose(
        np.asarray(out.matched_boxes)[pos & (ref_cls >= 0)],
        ref_boxes[pos & (ref_cls >= 0)],
        atol=1e-5,
    )


def test_matcher_padding_invariance(rng):
    """Padded gt slots must not change the assignment."""
    anchors = random_boxes(rng, 60)
    gt = random_boxes(rng, 4)
    gt_cls = rng.randint(0, 3, 4)
    unpadded = label_anchors(
        jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray(gt_cls),
        jnp.ones(4, bool), 3,
    )
    gt_pad = np.concatenate([gt, np.zeros((6, 4), np.float32)])
    cls_pad = np.concatenate([gt_cls, np.zeros(6, np.int64)])
    valid = np.concatenate([np.ones(4, bool), np.zeros(6, bool)])
    padded = label_anchors(
        jnp.asarray(anchors), jnp.asarray(gt_pad), jnp.asarray(cls_pad),
        jnp.asarray(valid), 3,
    )
    np.testing.assert_array_equal(
        np.asarray(unpadded.gt_classes), np.asarray(padded.gt_classes)
    )


def test_matcher_no_gt(rng):
    anchors = random_boxes(rng, 40)
    out = label_anchors(
        jnp.asarray(anchors), jnp.zeros((5, 4)), jnp.zeros(5, jnp.int32),
        jnp.zeros(5, bool), num_classes=7,
    )
    np.testing.assert_array_equal(np.asarray(out.gt_classes), np.full(40, 7))


def test_low_quality_match_forces_positive():
    # One gt barely overlapping a single anchor (IoU < hi): the low-quality
    # rule must still make that anchor positive.
    anchors = np.array([[0, 0, 10, 10], [100, 100, 110, 110]], np.float32)
    gt = np.array([[8, 8, 18, 18]], np.float32)  # IoU with anchor0 ≈ 0.02
    out = label_anchors(
        jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray([2]),
        jnp.ones(1, bool), num_classes=7,
    )
    assert int(out.gt_classes[0]) == 2
    assert int(out.gt_classes[1]) == 7


def test_batch_matcher(rng):
    anchors = random_boxes(rng, 50)
    gt = np.stack([random_boxes(rng, 3), random_boxes(rng, 3)])
    cls = rng.randint(0, 5, (2, 3))
    valid = np.ones((2, 3), bool)
    out = label_anchors_batch(
        jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray(cls),
        jnp.asarray(valid), 5,
    )
    assert out.gt_classes.shape == (2, 50)
    for i in range(2):
        single = label_anchors(
            jnp.asarray(anchors), jnp.asarray(gt[i]), jnp.asarray(cls[i]),
            jnp.asarray(valid[i]), 5,
        )
        np.testing.assert_array_equal(
            np.asarray(out.gt_classes)[i], np.asarray(single.gt_classes)
        )
