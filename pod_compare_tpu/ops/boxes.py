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

# Standard clamp preventing exp() overflow in box decode (matches
# detectron2's `_DEFAULT_SCALE_CLAMP` used by the reference transform).
SCALE_CLAMP = math.log(1000.0 / 16)


def area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Box areas; negative extents clip to zero."""
    wh = jnp.maximum(boxes[..., 2:4] - boxes[..., 0:2], 0.0)
    return wh[..., 0] * wh[..., 1]


def pairwise_intersection(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """(N, M) intersection areas."""
    lt = jnp.maximum(boxes1[:, None, 0:2], boxes2[None, :, 0:2])
    rb = jnp.minimum(boxes1[:, None, 2:4], boxes2[None, :, 2:4])
    wh = jnp.maximum(rb - lt, 0.0)
    return wh[..., 0] * wh[..., 1]


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
