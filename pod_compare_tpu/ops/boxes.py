"""Pure-JAX box geometry: IoU, delta encode/decode, coordinate transforms.

TPU-native equivalents of the detectron2 box utilities the reference
exercises (SURVEY.md §2.2):
  * pairwise IoU           — detectron2.structures.pairwise_iou
                             (reference: inference_utils.py:78-79, 199-200)
  * Box2BoxTransform       — encode/decode (dx,dy,dw,dh) deltas
                             (reference: probabilistic_retinanet.py:194;
                              probabilistic_inference.py:384-385)
  * sampled decode         — SampleBox2BoxTransform.apply_samples_deltas
                             (reference: inference_utils.py:505-547), here a
                             vmap over the sample axis
  * covariance transforms  — scale conjugation S Σ Sᵀ and xyxy→xywh Jacobian
                             (reference: inference_utils.py:374-451)

All functions are shape-polymorphic pure functions safe under jit/vmap.
Boxes are (..., 4) arrays in XYXY absolute coordinates unless stated.
"""

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

# Standard clamp preventing exp() overflow in box decode (matches
# detectron2's `_DEFAULT_SCALE_CLAMP` used by the reference transform).
SCALE_CLAMP = math.log(1000.0 / 16)

# Saturation cap (in scaled log-size variance) for the analytic decode
# moments — see decoded_box_moments; shared with the mean-only fast path
# so both produce bit-identical means.
_MOMENT_VAR_CLAMP = 2.0


def area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Box areas; negative extents clip to zero."""
    wh = jnp.maximum(boxes[..., 2:4] - boxes[..., 0:2], 0.0)
    return wh[..., 0] * wh[..., 1]


def pairwise_intersection(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """(N, M) intersection areas.

    Coordinates are unpacked into separate (N, M) planes rather than a
    stacked (N, M, 2) tensor: on TPU a trailing dim of 2 lands on the
    128-lane axis and tile-pads 64x, which made the training matcher's
    (G, R=176k) IoU cost 22.6 ms/step (measured, batch 8 BDD). Unpacked,
    every intermediate is (N, M) with M on lanes — no padding."""
    x1 = jnp.maximum(boxes1[:, None, 0], boxes2[None, :, 0])
    y1 = jnp.maximum(boxes1[:, None, 1], boxes2[None, :, 1])
    x2 = jnp.minimum(boxes1[:, None, 2], boxes2[None, :, 2])
    y2 = jnp.minimum(boxes1[:, None, 3], boxes2[None, :, 3])
    return jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)


def pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """(N, M) IoU matrix; IoU is 0 where either box is empty."""
    inter = pairwise_intersection(boxes1, boxes2)
    a1 = area(boxes1)[:, None]
    a2 = area(boxes2)[None, :]
    union = a1 + a2 - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def xyxy_to_xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """XYXY → COCO XYWH."""
    return jnp.concatenate(
        [boxes[..., 0:2], boxes[..., 2:4] - boxes[..., 0:2]], axis=-1
    )


def xywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """COCO XYWH → XYXY."""
    return jnp.concatenate(
        [boxes[..., 0:2], boxes[..., 0:2] + boxes[..., 2:4]], axis=-1
    )


def encode_deltas(
    anchors: jnp.ndarray,
    target_boxes: jnp.ndarray,
    weights: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Encode target boxes as (dx, dy, dw, dh) deltas relative to anchors."""
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = anchors[..., 0] + 0.5 * aw
    ay = anchors[..., 1] + 0.5 * ah

    gw = target_boxes[..., 2] - target_boxes[..., 0]
    gh = target_boxes[..., 3] - target_boxes[..., 1]
    gx = target_boxes[..., 0] + 0.5 * gw
    gy = target_boxes[..., 1] + 0.5 * gh

    wx, wy, ww, wh = weights
    dx = wx * (gx - ax) / aw
    dy = wy * (gy - ay) / ah
    dw = ww * jnp.log(gw / aw)
    dh = wh * jnp.log(gh / ah)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def decode_deltas(
    deltas: jnp.ndarray,
    anchors: jnp.ndarray,
    weights: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Decode (dx, dy, dw, dh) deltas on anchors into XYXY boxes.

    Broadcasts over any leading axes: a sample axis on `deltas` gives the
    vmapped equivalent of the reference's batched-sample decode
    (reference: inference_utils.py:510-547).
    """
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = anchors[..., 0] + 0.5 * aw
    ay = anchors[..., 1] + 0.5 * ah

    wx, wy, ww, wh = weights
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.minimum(deltas[..., 2] / ww, SCALE_CLAMP)
    dh = jnp.minimum(deltas[..., 3] / wh, SCALE_CLAMP)

    px = dx * aw + ax
    py = dy * ah + ay
    pw = jnp.exp(dw) * aw
    ph = jnp.exp(dh) * ah

    return jnp.stack(
        [px - 0.5 * pw, py - 0.5 * ph, px + 0.5 * pw, py + 0.5 * ph], axis=-1
    )


def _decoded_mean_terms(deltas, sww, shh, anchors, weights):
    """Shared exact prefix of decoded_box_moments / decoded_box_mean.

    Anchor decomposition, weight scaling, the SCALE_CLAMP /
    _MOMENT_VAR_CLAMP saturation guard (the sampled pipeline clamps every
    drawn dw/dh at SCALE_CLAMP, so exp() never overflows even for
    degenerate heads emitting ~1e6 log-variances; inactive for trained
    heads with sigma ~ 0.01-0.3), the lognormal size means, and the mean
    corner boxes — ELEMENTWISE ONLY, so both callers return bit-identical
    means on every backend. This shared helper is what makes the
    defer-covariance path's "bit-identical means" contract structural
    rather than by-convention.

    `sww`/`shh` are the RAW (unweighted) log-size delta variances; the
    returned pair is weight-scaled and clamped.

    Returns (mean_boxes, (ax, ay, aw, ah), (fw, fh), (sww, shh),
    (ew, eh)).
    """
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = anchors[..., 0] + 0.5 * aw
    ay = anchors[..., 1] + 0.5 * ah

    w = jnp.asarray(weights, deltas.dtype)
    m = deltas / w  # (..., 4) scaled means
    sww = sww / (w[2] * w[2])
    shh = shh / (w[3] * w[3])

    mx, my = m[..., 0], m[..., 1]
    mw = jnp.minimum(m[..., 2], SCALE_CLAMP)
    mh = jnp.minimum(m[..., 3], SCALE_CLAMP)
    fw = jnp.sqrt(_MOMENT_VAR_CLAMP / jnp.maximum(sww, _MOMENT_VAR_CLAMP))
    fh = jnp.sqrt(_MOMENT_VAR_CLAMP / jnp.maximum(shh, _MOMENT_VAR_CLAMP))
    sww = sww * fw * fw
    shh = shh * fh * fh

    ew = jnp.exp(mw + 0.5 * sww)  # E[exp(dw)]
    eh = jnp.exp(mh + 0.5 * shh)
    px = ax + aw * mx
    py = ay + ah * my
    pw = aw * ew
    ph = ah * eh
    mean_boxes = jnp.stack(
        [px - 0.5 * pw, py - 0.5 * ph, px + 0.5 * pw, py + 0.5 * ph], -1
    )
    # Materialize the (C, 4) mean instead of letting XLA re-fuse this
    # cheap elementwise chain into every downstream consumer (NMS, IoU
    # clustering, fusion). Without the barrier, consumer fusions
    # duplicate the producer chain and its INPUTS — gathers of the
    # (R, ·) head planes — stay live across the whole per-image
    # pipeline, which ballooned the BayesOD+MC b32 program's compiled
    # peak from 12.02 to 15.51 GB (round-4 regression: the einsum this
    # elementwise form replaced had acted as a fusion barrier). An
    # identity op: bit-identity between the mean-only and moments paths
    # is untouched. Measured (compile-only, tools/probe_hbm.py,
    # 2026-08-19): 15.51 -> 12.07 GB peak at batch 32.
    mean_boxes = lax.optimization_barrier(mean_boxes)
    return mean_boxes, (ax, ay, aw, ah), (fw, fh), (sww, shh), (ew, eh)


def decoded_box_moments(
    deltas: jnp.ndarray,
    cov: jnp.ndarray,
    anchors: jnp.ndarray,
    weights: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closed-form mean and covariance of decoded boxes under a Gaussian
    delta distribution — the S→∞ limit of the reference's 1000-sample
    Monte-Carlo decode (probabilistic_inference.py:344-374, which draws
    MVN delta samples, decodes each, and takes the sample mean/covariance).

    With d = (dx,dy,dw,dh) ~ N(μ, Σ) the decoded box is affine in
    (dx, dy, exp(dw), exp(dh)); every first/second moment of that vector
    is analytic (Gaussian/lognormal cross-moments):
        E[exp(dw)]            = exp(μw + Σww/2)
        cov(dx, exp(dw))      = Σxw · E[exp(dw)]
        cov(exp(dw), exp(dh)) = E[exp(dw)]·E[exp(dh)]·(exp(Σwh) − 1)
    so the whole sample bank collapses to O(C) elementwise math — the
    TPU-native replacement for a memory-bound (S, C, 4) pipeline. The
    decode's SCALE_CLAMP is ignored here: it sits ~40σ out for trained
    heads, so the censored-moment correction is far below the reference's
    own Monte-Carlo noise floor (~3% at S=1000).

    Args:
        deltas: (..., 4) mean deltas μ (raw head output scale).
        cov: (..., 4, 4) delta covariance Σ (e.g. chol @ cholᵀ).
        anchors: (..., 4) XYXY anchors.
        weights: Box2Box transform weights.
    Returns:
        (mean_boxes (..., 4) XYXY, box_covs (..., 4, 4)).
    """
    mean_boxes, (ax, ay, aw, ah), (fw, fh), (sww, shh), (ew, eh) = (
        _decoded_mean_terms(
            deltas, cov[..., 2, 2], cov[..., 3, 3], anchors, weights
        )
    )

    w = jnp.asarray(weights, deltas.dtype)
    s = cov / (w[:, None] * w[None, :])  # (..., 4, 4) scaled covariance
    sxx, syy = s[..., 0, 0], s[..., 1, 1]
    sxy, sxw, sxh = s[..., 0, 1], s[..., 0, 2], s[..., 0, 3]
    syw, syh, swh = s[..., 1, 2], s[..., 1, 3], s[..., 2, 3]

    # Complete the saturation guard (see _decoded_mean_terms, which
    # clamped sww/shh) PSD-safely on the off-diagonals: scaling the whole
    # w (resp. h) row/column of s by fw=sqrt(cap/s_ww) keeps
    # |s_iw| <= sqrt(s_ii * s_ww) holding.
    swh = swh * fw * fh
    sxw, syw = sxw * fw, syw * fw
    sxh, syh = sxh * fh, syh * fh

    # Covariance of t = (px, py, pw, ph) = (ax + aw·dx, ay + ah·dy,
    # aw·exp(dw), ah·exp(dh)).
    c00 = aw * aw * sxx
    c01 = aw * ah * sxy
    c02 = aw * aw * sxw * ew
    c03 = aw * ah * sxh * eh
    c11 = ah * ah * syy
    c12 = ah * aw * syw * ew
    c13 = ah * ah * syh * eh
    c22 = aw * aw * ew * ew * jnp.expm1(sww)
    c23 = aw * ah * ew * eh * jnp.expm1(swh)
    c33 = ah * ah * eh * eh * jnp.expm1(shh)
    t_cov = jnp.stack(
        [
            jnp.stack([c00, c01, c02, c03], -1),
            jnp.stack([c01, c11, c12, c13], -1),
            jnp.stack([c02, c12, c22, c23], -1),
            jnp.stack([c03, c13, c23, c33], -1),
        ],
        -2,
    )

    # Box corners are affine in t: b = A t. The MEAN comes from the
    # shared elementwise helper (an einsum here would ride the bf16 MXU
    # under TPU default precision and break the bit-identity contract
    # with decoded_box_mean that the defer-covariance path relies on);
    # the covariance congruence keeps the exact-f32 einsum.
    a_mat = jnp.asarray(
        [
            [1.0, 0.0, -0.5, 0.0],
            [0.0, 1.0, 0.0, -0.5],
            [1.0, 0.0, 0.5, 0.0],
            [0.0, 1.0, 0.0, 0.5],
        ],
        deltas.dtype,
    )
    box_covs = jnp.einsum(
        "ij,...jk,lk->...il", a_mat, t_cov, a_mat, precision="highest"
    )
    return mean_boxes, box_covs


def decoded_box_mean(
    deltas: jnp.ndarray,
    diag_cov: jnp.ndarray,
    anchors: jnp.ndarray,
    weights: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Mean of `decoded_box_moments` WITHOUT the covariance.

    The analytic decode mean depends only on the delta-covariance DIAGONAL
    (the lognormal shift exp(Σww/2)), so NMS-first pipelines compute means
    for every candidate at O(C·4) and defer the O(C·16) covariance
    algebra to the ≤max_dets survivors (inference/core.py
    `defer_covariance`). Shares `_decoded_mean_terms` with the moments
    path, so means are bit-identical BY CONSTRUCTION on every backend.

    Args:
        deltas: (..., 4) mean deltas μ (raw head output scale).
        diag_cov: (..., 4) diagonal of the delta covariance Σ.
        anchors: (..., 4) XYXY anchors.
    Returns:
        mean boxes (..., 4) XYXY.
    """
    mean_boxes, _, _, _, _ = _decoded_mean_terms(
        deltas, diag_cov[..., 2], diag_cov[..., 3], anchors, weights
    )
    return mean_boxes


def decode_delta_samples(
    delta_samples: jnp.ndarray,
    anchors: jnp.ndarray,
    weights: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Decode an (S, N, 4) bank of delta samples against (N, 4) anchors.

    vmap over the sample axis; the TPU-native analog of the reference's
    `SampleBox2BoxTransform.apply_samples_deltas` (inference_utils.py:505-547).
    """
    return jax.vmap(lambda d: decode_deltas(d, anchors, weights))(delta_samples)


def clip_boxes(boxes: jnp.ndarray, height, width) -> jnp.ndarray:
    """Clip XYXY boxes to [0, W] x [0, H]."""
    x1 = jnp.clip(boxes[..., 0], 0.0, width)
    y1 = jnp.clip(boxes[..., 1], 0.0, height)
    x2 = jnp.clip(boxes[..., 2], 0.0, width)
    y2 = jnp.clip(boxes[..., 3], 0.0, height)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def nonempty(boxes: jnp.ndarray, threshold: float = 0.0) -> jnp.ndarray:
    """Mask of boxes with positive width and height."""
    return ((boxes[..., 2] - boxes[..., 0]) > threshold) & (
        (boxes[..., 3] - boxes[..., 1]) > threshold
    )


def scale_boxes(boxes: jnp.ndarray, scale_x, scale_y) -> jnp.ndarray:
    """Scale XYXY boxes by (scale_x, scale_y)."""
    s = jnp.stack(
        [
            jnp.asarray(scale_x, boxes.dtype),
            jnp.asarray(scale_y, boxes.dtype),
            jnp.asarray(scale_x, boxes.dtype),
            jnp.asarray(scale_y, boxes.dtype),
        ]
    )
    return boxes * s


def scale_covariance(covs: jnp.ndarray, scale_x, scale_y) -> jnp.ndarray:
    """Conjugate 4x4 box covariances by the diagonal scale matrix: S Σ Sᵀ
    (reference: inference_utils.py:407-424)."""
    s = jnp.stack(
        [
            jnp.asarray(scale_x, covs.dtype),
            jnp.asarray(scale_y, covs.dtype),
            jnp.asarray(scale_x, covs.dtype),
            jnp.asarray(scale_y, covs.dtype),
        ]
    )
    return covs * s[:, None] * s[None, :]


# Jacobian of (x1,y1,x2,y2) → (x1,y1,w,h); used when dumping covariances to
# COCO json (reference: inference_utils.py:428-451) ...
_XYXY_TO_XYWH_J = jnp.array(
    [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [-1.0, 0.0, 1.0, 0.0],
        [0.0, -1.0, 0.0, 1.0],
    ]
)

# ... and its inverse (x1,y1,w,h) → (x1,y1,x2,y2); used when reading the json
# back for evaluation (reference: evaluation_utils.py:57-66).
_XYWH_TO_XYXY_J = jnp.array(
    [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [1.0, 0.0, 1.0, 0.0],
        [0.0, 1.0, 0.0, 1.0],
    ]
)


def covar_xyxy_to_xywh(covs: jnp.ndarray) -> jnp.ndarray:
    """Transform corner-corner covariances to corner-size (J Σ Jᵀ)."""
    j = _XYXY_TO_XYWH_J.astype(covs.dtype)
    return jnp.einsum("ij,...jk,lk->...il", j, covs, j, precision="highest")


def covar_xywh_to_xyxy(covs: jnp.ndarray) -> jnp.ndarray:
    """Transform corner-size covariances back to corner-corner."""
    j = _XYWH_TO_XYXY_J.astype(covs.dtype)
    return jnp.einsum("ij,...jk,lk->...il", j, covs, j, precision="highest")
