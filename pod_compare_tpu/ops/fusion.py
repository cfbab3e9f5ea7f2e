"""Device-resident probabilistic box fusion and clustering.

TPU-native reformulations of the reference's fusion strategies, which there
run as data-dependent Python loops and numpy calls (SURVEY.md §7 "hard
parts"). Every routine here works on fixed-size padded sets with validity
masks so the whole fusion graph stays inside one XLA program:

  * Gaussian Bayesian fusion + covariance intersection of cluster members
    (reference: inference_utils.py:292-334 — numpy on host there)
  * anchor-statistics cluster mean/covariance
    (reference: inference_utils.py:57-162 — Python loop over clusters there)
  * greedy sequential same-class clustering for black-box ensembles
    (reference: inference_utils.py:202-215 — Python loop there; here a
    `lax.scan` over the IoU-matrix rows)

Cluster membership is expressed as a (C, N) boolean matrix: row c flags the
members fused into output slot c.
"""

from typing import Tuple

import jax
import jax.numpy as jnp

from pod_compare_tpu.ops.gaussian import det4x4_psd, inv4x4_psd


def bayesian_fusion(
    member_mask: jnp.ndarray,
    boxes: jnp.ndarray,
    covs: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Precision-weighted Gaussian product over cluster members.

    Args:
        member_mask: (C, N) bool — members fused into each output.
        boxes: (N, 4) member means.
        covs: (N, 4, 4) member covariances (assumed PSD + conditioned).
    Returns:
        fused mean (C, 4), fused covariance (C, 4, 4)
        (reference: inference_utils.py:306-312).
    """
    precs = inv4x4_psd(covs)  # (N, 4, 4)
    m = member_mask.astype(boxes.dtype)  # (C, N)
    prec_sum = jnp.einsum("cn,nij->cij", m, precs, precision="highest")
    # Guard empty clusters against singular sums; caller masks them out.
    prec_sum = prec_sum + 1e-8 * jnp.eye(4, dtype=boxes.dtype)
    fused_cov = inv4x4_psd(prec_sum)
    weighted_means = jnp.einsum("cn,nij,nj->ci", m, precs, boxes, precision="highest")
    fused_mean = jnp.einsum("cij,cj->ci", fused_cov, weighted_means, precision="highest")
    return fused_mean, fused_cov


def covariance_intersection_fusion(
    member_mask: jnp.ndarray,
    boxes: jnp.ndarray,
    covs: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Covariance-intersection fusion with the reference's closed-form omega
    weights (reference: inference_utils.py:313-332):

        ω_i ∝ det(Λ_sum) − det(Λ_sum − Λ_i) + det(Λ_i)

    normalized by m·det(Λ_sum) + Σ_j (det(Λ_j) − det(Λ_sum − Λ_j)).
    """
    dtype = boxes.dtype
    precs = inv4x4_psd(covs)  # (N, 4, 4)
    m = member_mask.astype(dtype)  # (C, N)
    counts = jnp.sum(m, axis=1)  # (C,)
    prec_sum = jnp.einsum("cn,nij->cij", m, precs, precision="highest")  # (C, 4, 4)

    prec_dets = det4x4_psd(precs)  # (N,)
    total_det = det4x4_psd(prec_sum + 1e-12 * jnp.eye(4, dtype=dtype))  # (C,)
    # det(Λ_sum − Λ_i) per (cluster, member); non-members masked out later.
    diff = prec_sum[:, None] - precs[None]  # (C, N, 4, 4)
    # Not PSD in general; use the generic 4x4 determinant.
    diff_det = jnp.linalg.det(diff)  # (C, N)

    numer = total_det[:, None] - diff_det + prec_dets[None]  # (C, N)
    denom = counts * total_det + jnp.sum(
        m * (prec_dets[None] - diff_det), axis=1
    )  # (C,)
    omegas = m * numer / jnp.maximum(denom, 1e-20)[:, None]  # (C, N)

    weighted_prec_sum = jnp.einsum("cn,nij->cij", omegas, precs, precision="highest")
    weighted_prec_sum = weighted_prec_sum + 1e-8 * jnp.eye(4, dtype=dtype)
    fused_cov = inv4x4_psd(weighted_prec_sum)
    weighted_means = jnp.einsum("cn,nij,nj->ci", omegas, precs, boxes, precision="highest")
    fused_mean = jnp.einsum("cij,cj->ci", fused_cov, weighted_means, precision="highest")
    return fused_mean, fused_cov


def cluster_statistics(
    member_mask: jnp.ndarray,
    boxes: jnp.ndarray,
    prob_vectors: jnp.ndarray,
    covs: jnp.ndarray = None,
    min_members: int = 2,
    center_idx: jnp.ndarray = None,
    center_cov_fallback: float = 1e-4,
    fallback_counts: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-cluster sample mean/covariance + mean member statistics.

    Vectorized equivalent of the anchor-statistics / black-box cluster loop
    (reference: inference_utils.py:99-137, 222-247): for clusters with
    ≥ `min_members` members, the box is the member mean, the covariance is
    the unbiased member sample covariance plus the mean aleatoric member
    covariance, and the prob vector is the member mean. Smaller clusters fall
    back to the center's own values (covariance: the center's predicted one,
    or `center_cov_fallback`·I when absent).

    Args:
        member_mask: (C, N) bool.
        boxes: (N, 4); prob_vectors: (N, K); covs: (N, 4, 4) or None.
        center_idx: (C,) int — cluster centers, used for the fallback path.
        fallback_counts: (C,) — counts compared against `min_members` for
            the fallback decision when it should use a different membership
            than the statistics (the reference's anchor-statistics mode
            counts raw-IoU members but averages class-consistent ones,
            inference_utils.py:102-110).
    Returns:
        (C, 4) boxes, (C, K) prob vectors, (C, 4, 4) covariances.
    """
    dtype = boxes.dtype
    m = member_mask.astype(dtype)
    counts = jnp.sum(m, axis=1)  # (C,)

    mean_boxes = jnp.einsum("cn,ni->ci", m, boxes, precision="highest") / jnp.maximum(counts, 1.0)[:, None]
    resid = (boxes[None] - mean_boxes[:, None]) * m[..., None]  # (C, N, 4)
    sample_cov = jnp.einsum("cni,cnj->cij", resid, resid, precision="highest") / jnp.maximum(
        counts - 1.0, 1.0
    )[:, None, None]
    mean_probs = jnp.einsum("cn,nk->ck", m, prob_vectors, precision="highest") / jnp.maximum(
        counts, 1.0
    )[:, None]

    if covs is not None:
        mean_member_cov = jnp.einsum("cn,nij->cij", m, covs, precision="highest") / jnp.maximum(
            counts, 1.0
        )[:, None, None]
        cluster_cov = sample_cov + mean_member_cov
    else:
        cluster_cov = sample_cov

    if center_idx is not None:
        center_boxes = boxes[center_idx]
        center_probs = prob_vectors[center_idx]
        if covs is not None:
            center_cov = covs[center_idx]
        else:
            center_cov = jnp.broadcast_to(
                center_cov_fallback * jnp.eye(4, dtype=dtype),
                (center_idx.shape[0], 4, 4),
            )
        decision_counts = counts if fallback_counts is None else fallback_counts
        big = (decision_counts >= min_members)[:, None]
        mean_boxes = jnp.where(big, mean_boxes, center_boxes)
        mean_probs = jnp.where(big, mean_probs, center_probs)
        cluster_cov = jnp.where(big[..., None], cluster_cov, center_cov)

    return mean_boxes, mean_probs, cluster_cov


def greedy_sequential_clusters(
    iou_matrix: jnp.ndarray,
    classes: jnp.ndarray,
    valid: jnp.ndarray,
    affinity_threshold: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy same-class clustering over detections in input order.

    Scan reformulation of the reference's sequential loop
    (inference_utils.py:202-215): box i starts a cluster iff it is not yet a
    member of any earlier cluster; its cluster is every same-class box with
    IoU ≥ threshold (clusters may overlap — matching the reference exactly).

    Args:
        iou_matrix: (N, N) pairwise IoU.
        classes: (N,) int; valid: (N,) bool.
    Returns:
        centers: (N,) bool — rows that opened a cluster.
        members: (N, N) bool — members[i] is cluster i's membership (only
            meaningful where centers[i]).
    """
    affinity = (iou_matrix >= affinity_threshold) & (
        classes[:, None] == classes[None, :]
    )
    affinity = affinity & valid[None, :] & valid[:, None]
    n = iou_matrix.shape[0]

    # while_loop jumping straight to the next unclaimed index: the
    # sequential chain length is the number of CLUSTERS (dozens), not the
    # number of detections (M runs x max_dets = 1000 for the MC post-NMS
    # merge — an N-step scan made this the slowest inference mode). Only
    # small (n,) vectors ride in the loop state: a center's membership is
    # just its affinity row, so `members` is reconstructed afterwards
    # instead of dynamic-updating an (n, n) buffer inside the loop.
    def cond(state):
        claimed, _ = state
        return jnp.any(valid & ~claimed)

    def body(state):
        claimed, centers = state
        i = jnp.argmax(valid & ~claimed)  # first unclaimed valid index
        row = affinity[i]  # includes i itself (self-IoU = 1)
        return (
            claimed | row | (jnp.arange(n) == i),
            centers.at[i].set(True),
        )

    _, centers = jax.lax.while_loop(
        cond,
        body,
        (jnp.zeros((n,), bool), jnp.zeros((n,), bool)),
    )
    members = affinity & centers[:, None]
    return centers, members
