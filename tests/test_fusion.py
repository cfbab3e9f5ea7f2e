"""Fusion tests against numpy oracles replicating the reference formulas
(inference_utils.py:292-334, 57-162, 202-215)."""

import numpy as np
import jax.numpy as jnp

from pod_compare_tpu.ops import fusion as F
from pod_compare_tpu.ops.boxes import pairwise_iou


def random_psd(rng, n, k=4):
    a = rng.randn(n, k, k).astype(np.float32)
    return a @ a.transpose(0, 2, 1) + 0.5 * np.eye(k, dtype=np.float32)


def oracle_bayesian(cluster_means, cluster_covs):
    """Port of bounding_box_bayesian_inference(mode='bayesian_inference')."""
    precs = np.linalg.inv(cluster_covs)
    final_cov = np.linalg.inv(precs.sum(0))
    final_mean = np.matmul(precs, cluster_means[..., None]).sum(0)
    return np.squeeze(final_cov @ final_mean), final_cov


def oracle_covariance_intersection(cluster_means, cluster_covs):
    """Port of bounding_box_bayesian_inference(mode='covariance_intersection')."""
    precs = np.linalg.inv(cluster_covs)
    diff_precs = precs.sum(0) - precs
    dets = np.linalg.det(precs)
    total_det = np.linalg.det(precs.sum(0))
    diff_dets = np.linalg.det(diff_precs)
    omegas = (total_det - diff_dets + dets) / (
        precs.shape[0] * total_det + (dets - diff_dets).sum(0)
    )
    weighted = omegas[:, None, None] * precs
    final_cov = np.linalg.inv(weighted.sum(0))
    final_mean = final_cov @ np.matmul(weighted, cluster_means[..., None]).sum(0)
    return np.squeeze(final_mean), final_cov


def test_bayesian_fusion_matches_numpy_oracle(rng):
    n = 12
    boxes = rng.randn(n, 4).astype(np.float32) * 10
    covs = random_psd(rng, n)
    mask = np.zeros((2, n), bool)
    mask[0, [0, 3, 5]] = True
    mask[1, [1, 2, 6, 9]] = True

    mean, cov = F.bayesian_fusion(jnp.asarray(mask), jnp.asarray(boxes), jnp.asarray(covs))
    for c in range(2):
        ref_mean, ref_cov = oracle_bayesian(boxes[mask[c]], covs[mask[c]])
        np.testing.assert_allclose(np.asarray(mean)[c], ref_mean, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(cov)[c], ref_cov, rtol=1e-3, atol=1e-3)


def test_covariance_intersection_matches_numpy_oracle(rng):
    n = 10
    boxes = rng.randn(n, 4).astype(np.float32) * 10
    covs = random_psd(rng, n)
    mask = np.zeros((2, n), bool)
    mask[0, [0, 2, 4]] = True
    mask[1, [5]] = True  # singleton cluster

    mean, cov = F.covariance_intersection_fusion(
        jnp.asarray(mask), jnp.asarray(boxes), jnp.asarray(covs)
    )
    for c in range(2):
        ref_mean, ref_cov = oracle_covariance_intersection(boxes[mask[c]], covs[mask[c]])
        np.testing.assert_allclose(np.asarray(mean)[c], ref_mean, rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(cov)[c], ref_cov, rtol=2e-3, atol=2e-3)


def test_cluster_statistics_matches_loop(rng):
    n, k = 9, 5
    boxes = (rng.rand(n, 4) * 50).astype(np.float32)
    probs = rng.rand(n, k).astype(np.float32)
    covs = random_psd(rng, n)
    mask = np.zeros((3, n), bool)
    mask[0, [0, 1, 4]] = True   # multi-member
    mask[1, [2]] = True         # singleton -> center fallback
    mask[2, [3, 5]] = True
    centers = np.array([0, 2, 3])

    cb, cp, cc = F.cluster_statistics(
        jnp.asarray(mask), jnp.asarray(boxes), jnp.asarray(probs),
        jnp.asarray(covs), 2, jnp.asarray(centers),
    )
    for c in range(3):
        sub = np.where(mask[c])[0]
        if len(sub) >= 2:
            ref_box = boxes[sub].mean(0)
            resid = boxes[sub] - ref_box
            ref_cov = resid.T @ resid / max(len(sub) - 1, 1) + covs[sub].mean(0)
            ref_prob = probs[sub].mean(0)
        else:
            ref_box, ref_prob, ref_cov = (
                boxes[centers[c]], probs[centers[c]], covs[centers[c]],
            )
        np.testing.assert_allclose(np.asarray(cb)[c], ref_box, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(cp)[c], ref_prob, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(cc)[c], ref_cov, rtol=1e-3, atol=1e-3)


def oracle_greedy_clusters(iou, classes, thresh):
    """Port of the reference's sequential clustering loop
    (inference_utils.py:202-215)."""
    clusters = []
    claimed = set()
    for i in range(iou.shape[0]):
        if i in claimed:
            continue
        members = np.where((iou[i] >= thresh) & (classes == classes[i]))[0]
        clusters.append((i, set(members.tolist())))
        claimed |= set(members.tolist())
    return clusters


def test_greedy_sequential_clusters_matches_loop(rng):
    n = 30
    xy = rng.rand(n, 2).astype(np.float32) * 60
    wh = (rng.rand(n, 2) * 20 + 10).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], 1)
    classes = rng.randint(0, 3, n)
    iou = np.asarray(pairwise_iou(jnp.asarray(boxes), jnp.asarray(boxes)))

    centers, members = F.greedy_sequential_clusters(
        jnp.asarray(iou), jnp.asarray(classes), jnp.ones(n, bool), 0.5
    )
    centers = np.asarray(centers)
    members = np.asarray(members)
    ref = oracle_greedy_clusters(iou, classes, 0.5)

    assert centers.sum() == len(ref)
    for i, mem in ref:
        assert centers[i]
        assert set(np.where(members[i])[0].tolist()) == mem
    # Non-centers have no semantics but must not be flagged
    for i in range(n):
        if not any(i == c for c, _ in ref):
            assert not centers[i]
