"""NMS tests against a pure-python greedy oracle with torchvision semantics
(the reference's provider via detectron2.layers.batched_nms)."""

import numpy as np
import jax.numpy as jnp

from pod_compare_tpu.ops.nms import batched_nms, nms


def random_boxes(rng, n, size=200.0):
    xy = rng.rand(n, 2) * size
    wh = rng.rand(n, 2) * size * 0.3 + 5.0
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def iou_np(a, b):
    lt = np.maximum(a[:2], b[:2])
    rb = np.minimum(a[2:], b[2:])
    wh = np.maximum(rb - lt, 0.0)
    inter = wh[0] * wh[1]
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua if ua > 0 else 0.0


def oracle_nms(boxes, scores, threshold):
    """Greedy NMS keeping boxes with IoU <= threshold (torchvision semantics:
    ties broken by index order on equal scores)."""
    order = np.argsort(-scores, kind="stable")
    keep, suppressed = [], np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if not suppressed[j] and iou_np(boxes[i], boxes[j]) > threshold:
                suppressed[j] = True
    return np.asarray(keep)


def oracle_batched_nms(boxes, scores, classes, threshold):
    keep = []
    for i in oracle_nms(boxes, scores, threshold) if len(set(classes)) == 1 else []:
        keep.append(i)
    if keep:
        return np.asarray(keep)
    offset = boxes.max() + 1.0
    shifted = boxes + classes[:, None].astype(boxes.dtype) * offset
    return oracle_nms(shifted, scores, threshold)


import pytest


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("thresh", [0.3, 0.5, 0.7])
def test_nms_matches_oracle(seed, thresh):
    rng = np.random.RandomState(seed)
    boxes = random_boxes(rng, 64)
    scores = rng.rand(64).astype(np.float32)
    valid = np.ones(64, bool)
    res = nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
              thresh, 64)
    ours = np.asarray(res.indices)[np.asarray(res.valid)]
    ref = oracle_nms(boxes, scores, thresh)
    np.testing.assert_array_equal(ours, ref)


def test_batched_nms_matches_oracle(rng):
    boxes = random_boxes(rng, 80)
    scores = rng.rand(80).astype(np.float32)
    classes = rng.randint(0, 4, 80)
    valid = np.ones(80, bool)
    res = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
        jnp.asarray(valid), 0.5, 80,
    )
    ours = np.asarray(res.indices)[np.asarray(res.valid)]
    ref = oracle_batched_nms(boxes, scores, classes, 0.5)
    np.testing.assert_array_equal(ours, ref)


def test_nms_respects_validity_mask(rng):
    boxes = random_boxes(rng, 32)
    scores = rng.rand(32).astype(np.float32)
    valid = rng.rand(32) > 0.5
    res = nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5, 32)
    kept = np.asarray(res.indices)[np.asarray(res.valid)]
    assert all(valid[k] for k in kept)
    # Oracle on the valid subset only
    sub = np.where(valid)[0]
    ref = oracle_nms(boxes[sub], scores[sub], 0.5)
    np.testing.assert_array_equal(kept, sub[ref])


def test_nms_max_out_truncation(rng):
    boxes = random_boxes(rng, 50)
    scores = rng.rand(50).astype(np.float32)
    valid = np.ones(50, bool)
    full = nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5, 50)
    trunc = nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5, 5)
    n_full = int(np.asarray(full.valid).sum())
    np.testing.assert_array_equal(
        np.asarray(trunc.indices)[: min(5, n_full)],
        np.asarray(full.indices)[: min(5, n_full)],
    )


def test_nms_output_is_score_ordered(rng):
    boxes = random_boxes(rng, 40)
    scores = rng.rand(40).astype(np.float32)
    valid = np.ones(40, bool)
    res = nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.4, 40)
    kept = np.asarray(res.indices)[np.asarray(res.valid)]
    kept_scores = scores[kept]
    assert np.all(np.diff(kept_scores) <= 1e-7)


def test_nms_all_invalid():
    boxes = jnp.zeros((8, 4))
    scores = jnp.zeros((8,))
    valid = jnp.zeros((8,), bool)
    res = nms(boxes, scores, valid, 0.5, 8)
    assert not np.asarray(res.valid).any()
