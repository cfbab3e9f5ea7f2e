"""Box-op unit tests against numpy/torch oracles replicating the reference
formulas (SURVEY.md §7 step 2)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from pod_compare_tpu.ops import boxes as B


def random_boxes(rng, n, size=100.0):
    xy = rng.rand(n, 2) * size
    wh = rng.rand(n, 2) * size * 0.5 + 1.0
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def torch_pairwise_iou(b1, b2):
    """Oracle matching detectron2.structures.pairwise_iou."""
    a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    lt = torch.max(b1[:, None, :2], b2[None, :, :2])
    rb = torch.min(b1[:, None, 2:], b2[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    return torch.where(
        inter > 0, inter / (a1[:, None] + a2[None] - inter), torch.zeros_like(inter)
    )


def test_pairwise_iou_matches_torch(rng):
    b1 = random_boxes(rng, 17)
    b2 = random_boxes(rng, 23)
    ours = np.asarray(B.pairwise_iou(jnp.asarray(b1), jnp.asarray(b2)))
    ref = torch_pairwise_iou(torch.tensor(b1), torch.tensor(b2)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_iou_identity(rng):
    b = random_boxes(rng, 8)
    iou = np.asarray(B.pairwise_iou(jnp.asarray(b), jnp.asarray(b)))
    np.testing.assert_allclose(np.diag(iou), np.ones(8), atol=1e-5)


def test_encode_decode_roundtrip(rng):
    anchors = random_boxes(rng, 32)
    targets = random_boxes(rng, 32)
    deltas = B.encode_deltas(jnp.asarray(anchors), jnp.asarray(targets))
    rec = np.asarray(B.decode_deltas(deltas, jnp.asarray(anchors)))
    np.testing.assert_allclose(rec, targets, rtol=1e-4, atol=1e-3)


def test_decode_matches_reference_formula(rng):
    """Decode against a direct torch port of Box2BoxTransform.apply_deltas."""
    anchors = random_boxes(rng, 16)
    deltas = rng.randn(16, 4).astype(np.float32) * 0.3

    a = torch.tensor(anchors)
    d = torch.tensor(deltas)
    w = a[:, 2] - a[:, 0]
    h = a[:, 3] - a[:, 1]
    cx = a[:, 0] + 0.5 * w
    cy = a[:, 1] + 0.5 * h
    dx, dy, dw, dh = d.unbind(1)
    dw = torch.clamp(dw, max=B.SCALE_CLAMP)
    dh = torch.clamp(dh, max=B.SCALE_CLAMP)
    px, py = dx * w + cx, dy * h + cy
    pw, ph = torch.exp(dw) * w, torch.exp(dh) * h
    ref = torch.stack(
        [px - pw / 2, py - ph / 2, px + pw / 2, py + ph / 2], dim=1
    ).numpy()

    ours = np.asarray(B.decode_deltas(jnp.asarray(deltas), jnp.asarray(anchors)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-3)


def test_decode_delta_samples_matches_loop(rng):
    anchors = random_boxes(rng, 8)
    samples = rng.randn(5, 8, 4).astype(np.float32) * 0.2
    ours = np.asarray(B.decode_delta_samples(jnp.asarray(samples), jnp.asarray(anchors)))
    for s in range(5):
        one = np.asarray(B.decode_deltas(jnp.asarray(samples[s]), jnp.asarray(anchors)))
        np.testing.assert_allclose(ours[s], one, atol=1e-5)


def test_xyxy_xywh_roundtrip(rng):
    b = random_boxes(rng, 10)
    out = np.asarray(B.xywh_to_xyxy(B.xyxy_to_xywh(jnp.asarray(b))))
    np.testing.assert_allclose(out, b, atol=1e-5)


def test_covar_jacobians_inverse_of_each_other(rng):
    covs = rng.randn(6, 4, 4).astype(np.float32)
    covs = covs @ covs.transpose(0, 2, 1)
    back = np.asarray(B.covar_xywh_to_xyxy(B.covar_xyxy_to_xywh(jnp.asarray(covs))))
    np.testing.assert_allclose(back, covs, rtol=1e-4, atol=1e-3)


def test_covar_xyxy_to_xywh_matches_reference_matrix(rng):
    """The reference conjugates with T = [[1,0,0,0],[0,1,0,0],[-1,0,1,0],
    [0,-1,0,1]] (inference_utils.py:439-449)."""
    covs = rng.randn(3, 4, 4).astype(np.float32)
    covs = covs @ covs.transpose(0, 2, 1)
    T = np.array(
        [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [-1.0, 0, 1.0, 0], [0, -1.0, 0, 1.0]],
        dtype=np.float32,
    )
    ref = T @ covs @ T.T
    ours = np.asarray(B.covar_xyxy_to_xywh(jnp.asarray(covs)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_scale_covariance_is_conjugation(rng):
    covs = rng.randn(4, 4, 4).astype(np.float32)
    covs = covs @ covs.transpose(0, 2, 1)
    sx, sy = 1.5, 0.75
    S = np.diag([sx, sy, sx, sy]).astype(np.float32)
    ref = S @ covs @ S.T
    ours = np.asarray(B.scale_covariance(jnp.asarray(covs), sx, sy))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_clip_and_nonempty():
    b = jnp.asarray([[-5.0, -5.0, 10.0, 10.0], [3.0, 3.0, 3.0, 9.0]])
    clipped = B.clip_boxes(b, 8.0, 8.0)
    np.testing.assert_allclose(
        np.asarray(clipped), [[0, 0, 8, 8], [3, 3, 3, 8]], atol=1e-6
    )
    mask = np.asarray(B.nonempty(clipped))
    assert mask.tolist() == [True, False]
