"""Shared probabilistic anchor-wise inference core (single image, jittable).

TPU-native equivalent of the reference's
`RetinaNetProbabilisticPredictor.retinanet_probabilistic_inference`
(reference: probabilistic_inference.py:178-388): MC-sample classification
probabilities from the predicted logit Gaussians, select top-k candidates,
build box covariances by decoding a bank of multivariate-normal delta
samples, and add epistemic covariance across stochastic runs.

Everything is fixed-shape: the dynamic top-k → score-filter chain of the
reference becomes a static top-k with a validity mask. The per-image core
vmaps over the batch axis.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from pod_compare_tpu.ops.boxes import decode_deltas
from pod_compare_tpu.ops.gaussian import (
    covariance_output_to_cholesky,
    sample_mean_covariance,
)


class Detections(NamedTuple):
    """Padded detection set (one image).

    boxes: (D, 4) XYXY in network-input coordinates.
    covs: (D, 4, 4) box covariance matrices (zeros when unavailable).
    scores: (D,) max class probability.
    classes: (D,) int32 class indices.
    prob_vectors: (D, K) per-class probabilities.
    valid: (D,) bool.
    """

    boxes: jnp.ndarray
    covs: jnp.ndarray
    scores: jnp.ndarray
    classes: jnp.ndarray
    prob_vectors: jnp.ndarray
    valid: jnp.ndarray

    def gather(self, idx: jnp.ndarray, idx_valid: jnp.ndarray) -> "Detections":
        """Reindex all fields by `idx`, intersecting validity."""
        return Detections(
            boxes=self.boxes[idx],
            covs=self.covs[idx],
            scores=self.scores[idx],
            classes=self.classes[idx],
            prob_vectors=self.prob_vectors[idx],
            valid=self.valid[idx] & idx_valid,
        )


class Candidates(NamedTuple):
    """Top-k anchor candidates before NMS/fusion (one image)."""

    boxes: jnp.ndarray  # (C, 4) decoded box means
    covs: jnp.ndarray  # (C, 4, 4); zeros if no covariance source
    has_cov: bool  # static: whether covs is meaningful
    scores: jnp.ndarray  # (C,)
    classes: jnp.ndarray  # (C,) int32
    prob_vectors: jnp.ndarray  # (C, K)
    valid: jnp.ndarray  # (C,)
    anchor_idx: jnp.ndarray = None  # (C,) source anchor of each candidate


def classification_probs(
    rng: Optional[jax.Array],
    box_cls: jnp.ndarray,
    box_cls_var: Optional[jnp.ndarray],
    num_samples: int,
) -> jnp.ndarray:
    """Mean sigmoid probability, MC-sampled from the logit Gaussian when a
    classification variance head exists (reference:
    probabilistic_inference.py:289-297)."""
    if box_cls_var is None:
        return jax.nn.sigmoid(box_cls)
    std = jnp.sqrt(jnp.exp(box_cls_var))
    noise = jax.random.normal(rng, (num_samples,) + box_cls.shape, box_cls.dtype)
    return jnp.mean(jax.nn.sigmoid(box_cls[None] + noise * std[None]), axis=0)


def probabilistic_inference_core(
    rng: jax.Array,
    anchors: jnp.ndarray,
    box_cls: jnp.ndarray,
    box_delta: jnp.ndarray,
    box_cls_var: Optional[jnp.ndarray],
    box_reg_var: Optional[jnp.ndarray],
    run_deltas: Optional[jnp.ndarray],
    *,
    topk: int,
    score_thresh: float,
    cls_num_samples: int,
    box_num_samples: int,
    box_reg_weights=(1.0, 1.0, 1.0, 1.0),
) -> Candidates:
    """Single-image anchor-wise probabilistic inference.

    Args:
        anchors: (R, 4).
        box_cls/box_delta: (R, K) logits / (R, 4) deltas — already averaged
            over MC/ensemble runs when applicable (reference:
            probabilistic_inference.py:211-270).
        box_cls_var/box_reg_var: optional (R, K) / (R, Ccov) heads.
        run_deltas: optional (M, R, 4) per-run deltas for epistemic box
            covariance across stochastic runs (reference: :322-331).
        topk: static candidate count (min(1000, R) in the reference).
        box_num_samples: MVN delta samples for the sampled box decode
            (1000 in the reference, :355).
    """
    rng_cls, rng_box = jax.random.split(rng)
    probs = classification_probs(rng_cls, box_cls, box_cls_var, cls_num_samples)

    scores_all = jnp.max(probs, axis=1)  # (R,)
    classes_all = jnp.argmax(probs, axis=1).astype(jnp.int32)

    top_scores, top_idx = jax.lax.top_k(scores_all, topk)
    valid = top_scores > score_thresh

    sel_deltas = box_delta[top_idx]  # (C, 4)
    sel_anchors = anchors[top_idx]
    sel_probs = probs[top_idx]
    sel_classes = classes_all[top_idx]

    epistemic_cov = None
    if run_deltas is not None:
        # Decode each run's mean deltas at the selected anchors; the spread
        # across runs is the epistemic box covariance.
        sel_run_deltas = run_deltas[:, top_idx, :]  # (M, C, 4)
        run_boxes = jax.vmap(
            lambda d: decode_deltas(d, sel_anchors, box_reg_weights)
        )(sel_run_deltas)
        _, epistemic_cov = sample_mean_covariance(run_boxes)

    if box_reg_var is not None:
        chol = covariance_output_to_cholesky(box_reg_var[top_idx])  # (C,4,4)
        z = jax.random.normal(
            rng_box, (box_num_samples,) + sel_deltas.shape, sel_deltas.dtype
        )
        delta_samples = sel_deltas[None] + jnp.einsum(
            "cij,scj->sci", chol, z, precision="highest"
        )
        box_samples = jax.vmap(
            lambda d: decode_deltas(d, sel_anchors, box_reg_weights)
        )(delta_samples)
        boxes, covs = sample_mean_covariance(box_samples)
        if epistemic_cov is not None:
            covs = covs + epistemic_cov
        has_cov = True
    else:
        boxes = decode_deltas(sel_deltas, sel_anchors, box_reg_weights)
        if epistemic_cov is not None:
            covs = epistemic_cov
            has_cov = True
        else:
            covs = jnp.zeros(boxes.shape[:-1] + (4, 4), boxes.dtype)
            has_cov = False

    return Candidates(
        boxes=boxes,
        covs=covs,
        has_cov=has_cov,
        scores=top_scores,
        classes=sel_classes,
        prob_vectors=sel_probs,
        valid=valid,
        anchor_idx=top_idx.astype(jnp.int32),
    )
