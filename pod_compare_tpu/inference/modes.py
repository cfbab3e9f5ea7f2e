"""The seven probabilistic inference/fusion strategies (single image,
jittable, fixed shapes).

TPU-native reformulations of the reference's postprocessing modes
(SURVEY.md §3.2/§3.4):
  * standard_nms               (reference: inference_utils.py:12-54)
  * anchor_statistics          (reference: inference_utils.py:57-162)
  * bayes_od                   (reference: probabilistic_inference.py:536-636)
  * black-box ensemble merge   (reference: inference_utils.py:165-289) —
    serves both mc_dropout_ensembles(post_nms) and ensembles(post_nms)

Pre-NMS MC-dropout/ensemble fusion happens upstream in the core (averaged
head outputs + epistemic covariance) followed by `standard_nms` here,
mirroring the reference's dispatch.
"""

import jax.numpy as jnp

from pod_compare_tpu.inference.core import Candidates, Detections
from pod_compare_tpu.ops.boxes import pairwise_iou
from pod_compare_tpu.ops.fusion import (
    bayesian_fusion,
    cluster_statistics,
    covariance_intersection_fusion,
    greedy_sequential_clusters,
)
from pod_compare_tpu.ops.nms import batched_nms

# Relative jitter added before precision-matrix inversion in Bayesian
# fusion. The reference inverts raw sampled covariances in float64 numpy
# (inference_utils.py:306); on-device Cholesky in f32 needs a floor scaled
# to the covariance magnitude (sampled covariances can have f32-roundoff
# negative eigenvalues proportional to their trace).
_FUSION_JITTER = 1e-5


def _condition(covs: jnp.ndarray) -> jnp.ndarray:
    """Add trace-relative diagonal jitter keeping fusion f32-stable."""
    mean_diag = jnp.mean(
        jnp.diagonal(covs, axis1=-2, axis2=-1), axis=-1, keepdims=True
    )
    eps = _FUSION_JITTER * jnp.maximum(mean_diag, 1.0)[..., None]
    return covs + eps * jnp.eye(covs.shape[-1], dtype=covs.dtype)


def _as_detections(c: Candidates) -> Detections:
    return Detections(
        boxes=c.boxes,
        covs=c.covs,
        scores=c.scores,
        classes=c.classes,
        prob_vectors=c.prob_vectors,
        valid=c.valid,
        anchor_idx=c.anchor_idx,
    )


def standard_nms(
    cands: Candidates, nms_thresh: float, max_dets: int
) -> Detections:
    """Class-aware NMS + top-`max_dets` (reference: inference_utils.py:12-54)."""
    keep = batched_nms(
        cands.boxes, cands.scores, cands.classes, cands.valid, nms_thresh, max_dets
    )
    return _as_detections(cands).gather(keep.indices, keep.valid)


def anchor_statistics(
    cands: Candidates,
    nms_thresh: float,
    max_dets: int,
    affinity_threshold: float,
) -> Detections:
    """Output-redundancy fusion: NMS centers, IoU clusters, member sample
    mean/covariance + mean aleatoric covariance
    (reference: inference_utils.py:57-162)."""
    keep = batched_nms(
        cands.boxes, cands.scores, cands.classes, cands.valid, nms_thresh, max_dets
    )
    # IoU only of kept rows vs all candidates: (max_dets, C), not (C, C) —
    # with per-level top-k C is ~4.5k at BDD geometry and the full matrix
    # would be 20M entries/image
    iou = pairwise_iou(cands.boxes[keep.indices], cands.boxes)
    raw_members = (iou > affinity_threshold) & cands.valid[None, :]
    center_classes = cands.classes[keep.indices]
    class_match = cands.classes[None, :] == center_classes[:, None]
    member_mask = raw_members & class_match

    boxes, probs, covs = cluster_statistics(
        member_mask,
        cands.boxes,
        cands.prob_vectors,
        cands.covs if cands.has_cov else None,
        min_members=2,
        center_idx=keep.indices,
        # The reference's >=2 test counts raw IoU members before the class
        # filter (inference_utils.py:102-106).
        fallback_counts=jnp.sum(raw_members, axis=1),
    )
    scores = jnp.max(probs, axis=1)
    classes = jnp.argmax(probs, axis=1).astype(jnp.int32)
    return Detections(
        boxes=boxes, covs=covs, scores=scores, classes=classes,
        prob_vectors=probs, valid=keep.valid,
    )


def bayes_od(
    cands: Candidates,
    nms_thresh: float,
    max_dets: int,
    affinity_threshold: float,
    box_merge_mode: str,
    cls_merge_mode: str,
) -> Detections:
    """BayesOD: NMS centers define clusters; per-cluster Gaussian fusion of
    class-consistent members; categorical fusion over all members
    (reference: probabilistic_inference.py:536-636).

    When no covariance source exists the fusion falls back to identical
    1e-4·I member covariances (= plain mean); the reference simply cannot
    run this mode without covariance.
    """
    keep = batched_nms(
        cands.boxes, cands.scores, cands.classes, cands.valid, nms_thresh, max_dets
    )
    # (max_dets, C) kept-vs-all IoU — see anchor_statistics note
    iou = pairwise_iou(cands.boxes[keep.indices], cands.boxes)
    cluster_mask = (iou > affinity_threshold) & cands.valid[None, :]
    center_classes = cands.classes[keep.indices]
    class_match = cands.classes[None, :] == center_classes[:, None]
    fusion_mask = cluster_mask & class_match

    if cands.has_cov:
        covs = _condition(cands.covs)
    else:
        covs = jnp.broadcast_to(
            1e-4 * jnp.eye(4, dtype=cands.boxes.dtype), cands.covs.shape
        )
    if box_merge_mode == "bayesian_inference":
        fused_boxes, fused_covs = bayesian_fusion(fusion_mask, cands.boxes, covs)
    elif box_merge_mode == "covariance_intersection":
        fused_boxes, fused_covs = covariance_intersection_fusion(
            fusion_mask, cands.boxes, covs
        )
    else:
        raise ValueError(f"Invalid BAYES_OD.BOX_MERGE_MODE {box_merge_mode}")

    if cls_merge_mode == "bayesian_inference":
        m = cluster_mask.astype(cands.prob_vectors.dtype)
        counts = jnp.maximum(jnp.sum(m, axis=1), 1.0)
        probs = jnp.einsum(
            "cn,nk->ck", m, cands.prob_vectors, precision="highest"
        ) / counts[:, None]
        scores = jnp.max(probs, axis=1)
        classes = jnp.argmax(probs, axis=1).astype(jnp.int32)
    elif cls_merge_mode == "max_score":
        probs = cands.prob_vectors[keep.indices]
        scores = cands.scores[keep.indices]
        classes = center_classes
    else:
        raise ValueError(f"Invalid BAYES_OD.CLS_MERGE_MODE {cls_merge_mode}")

    return Detections(
        boxes=fused_boxes, covs=fused_covs, scores=scores, classes=classes,
        prob_vectors=probs, valid=keep.valid,
    )


def black_box_merge(
    dets: Detections,
    nms_thresh: float,
    max_dets: int,
    affinity_threshold: float,
    is_generalized_rcnn: bool = False,
) -> Detections:
    """Merge post-NMS detections from M stochastic runs/ensemble members:
    greedy sequential same-class clustering, cluster mean + epistemic +
    aleatoric covariance, final NMS
    (reference: inference_utils.py:165-289).

    `dets` is the member detections concatenated run-major along the
    detection axis — preserving the reference's iteration order.
    """
    iou = pairwise_iou(dets.boxes, dets.boxes)
    centers, members = greedy_sequential_clusters(
        iou, dets.classes, dets.valid, affinity_threshold
    )
    n = dets.boxes.shape[0]
    boxes, probs, covs = cluster_statistics(
        members,
        dets.boxes,
        dets.prob_vectors,
        dets.covs,
        min_members=2,
        center_idx=jnp.arange(n),
    )
    # Generalized-RCNN probability vectors carry a trailing background
    # column excluded from scoring (reference: inference_utils.py:256-263).
    score_probs = probs[:, :-1] if is_generalized_rcnn else probs
    scores = jnp.max(score_probs, axis=1)
    classes = jnp.argmax(score_probs, axis=1).astype(jnp.int32)
    keep = batched_nms(boxes, scores, classes, centers, nms_thresh, max_dets)
    merged = Detections(
        boxes=boxes, covs=covs, scores=scores, classes=classes,
        prob_vectors=probs, valid=centers,
    )
    return merged.gather(keep.indices, keep.valid)


def concatenate_detections(dets_list) -> Detections:
    """Concatenate per-member Detections along the detection axis."""
    return Detections(
        boxes=jnp.concatenate([d.boxes for d in dets_list], axis=0),
        covs=jnp.concatenate([d.covs for d in dets_list], axis=0),
        scores=jnp.concatenate([d.scores for d in dets_list], axis=0),
        classes=jnp.concatenate([d.classes for d in dets_list], axis=0),
        prob_vectors=jnp.concatenate([d.prob_vectors for d in dets_list], axis=0),
        valid=jnp.concatenate([d.valid for d in dets_list], axis=0),
    )
