"""Fixed-shape, padded non-maximum suppression for XLA.

TPU-native equivalent of torchvision's C++/CUDA `batched_nms` used throughout
the reference (reference: inference_utils.py:31-35, 83-88, 269-274;
probabilistic_inference.py:554-558).

Design: dynamic-length NMS is reformulated as a fixed-trip-count greedy
selection — `max_out` iterations of (argmax over scores, suppress one IoU
row). Work is O(max_out · N) instead of the O(N²) full-matrix approach, all
shapes static, output padded with a validity mask. Class awareness uses the
standard per-class coordinate-offset trick.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

_NEG_INF = -1e10


class NMSResult(NamedTuple):
    """Padded NMS output: indices into the input, score-descending order."""

    indices: jnp.ndarray  # (max_out,) int32
    valid: jnp.ndarray  # (max_out,) bool


def _iou_row(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """IoU of one box against (N, 4) boxes."""
    lt = jnp.maximum(box[0:2], boxes[:, 0:2])
    rb = jnp.minimum(box[2:4], boxes[:, 2:4])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[:, 0] * wh[:, 1]
    a1 = jnp.maximum(box[2] - box[0], 0.0) * jnp.maximum(box[3] - box[1], 0.0)
    a2 = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0.0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0.0
    )
    union = a1 + a2 - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


@partial(jax.jit, static_argnames=("max_out",))
def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
) -> NMSResult:
    """Class-agnostic greedy NMS over padded candidates.

    Args:
        boxes: (N, 4) XYXY.
        scores: (N,) — higher kept first.
        valid: (N,) bool — padded entries never selected.
        iou_threshold: suppress boxes with IoU > threshold (torchvision
            semantics: equality is kept).
        max_out: static output size.
    """
    live_scores = jnp.where(valid, scores, _NEG_INF)

    def body(carry, _):
        cur = carry
        idx = jnp.argmax(cur)
        ok = cur[idx] > _NEG_INF / 2
        row = _iou_row(boxes[idx], boxes)
        suppress = row > iou_threshold
        cur = jnp.where(ok & suppress, _NEG_INF, cur)
        cur = cur.at[idx].set(_NEG_INF)
        return cur, (idx.astype(jnp.int32), ok)

    _, (indices, ok) = jax.lax.scan(body, live_scores, None, length=max_out)
    return NMSResult(indices=indices, valid=ok)


@partial(jax.jit, static_argnames=("max_out",))
def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
) -> NMSResult:
    """Class-aware NMS: boxes of different classes never suppress each other.

    Uses the per-class coordinate-offset trick (the same strategy as
    detectron2's `batched_nms` wrapper the reference calls).
    """
    max_coord = jnp.max(jnp.where(valid[:, None], boxes, 0.0)) + 1.0
    offsets = classes.astype(boxes.dtype)[:, None] * max_coord
    return nms(boxes + offsets, scores, valid, iou_threshold, max_out)
