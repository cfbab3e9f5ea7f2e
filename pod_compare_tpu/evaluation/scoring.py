"""Proper scoring rules for classification and regression uncertainty.

TPU-native equivalents of the reference's scoring rules
(reference: src/core/evaluation_tools/scoring_rules.py). The heavy pieces
(MVN log-prob / entropy) run as jitted JAX on device; the thin aggregation
stays numpy.
"""

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pod_compare_tpu.ops.gaussian import mvn_entropy, mvn_log_prob

# Covariance conditioning used by the reference before NLL/entropy
# (scoring_rules.py:68-69, 100-101).
REG_CONDITIONING = 1e-2


@jax.jit
def _reg_nll(means, covs, gt):
    covs = covs + REG_CONDITIONING * jnp.eye(4, dtype=covs.dtype)
    return -mvn_log_prob(gt, means, covs)


@jax.jit
def _reg_entropy(covs):
    covs = covs + REG_CONDITIONING * jnp.eye(4, dtype=covs.dtype)
    return mvn_entropy(covs)


def compute_cls_scores(
    predicted_score_of_gt_category: np.ndarray,
) -> Dict[str, Optional[float]]:
    """Binary-multilabel ignorance score: mean −log p(gt category)
    (reference: retinanet_compute_cls_scores, scoring_rules.py:6-42)."""
    p = np.asarray(predicted_score_of_gt_category, float)
    if p.size == 0:
        return {"ignorance_score_mean": None}
    return {"ignorance_score_mean": float(np.mean(-np.log(p)))}


def compute_reg_scores(
    predicted_box_means: np.ndarray,
    predicted_box_covariances: np.ndarray,
    gt_box_means: np.ndarray,
) -> Dict[str, Optional[float]]:
    """Multivariate-Gaussian NLL + MSE of matched detections
    (reference: compute_reg_scores, scoring_rules.py:45-81)."""
    if len(predicted_box_means) == 0:
        return {"ignorance_score_mean": None, "mean_squared_error": None}
    nll = _reg_nll(
        jnp.asarray(predicted_box_means, jnp.float32),
        jnp.asarray(predicted_box_covariances, jnp.float32),
        jnp.asarray(gt_box_means, jnp.float32),
    )
    mse = float(np.mean((predicted_box_means - gt_box_means) ** 2))
    return {
        "ignorance_score_mean": float(jnp.mean(nll)),
        "mean_squared_error": mse,
    }


def compute_reg_scores_fn(
    predicted_box_covariances: np.ndarray,
) -> Dict[str, Optional[float]]:
    """False-positive regression score: mean predictive entropy
    (reference: compute_reg_scores_fn, scoring_rules.py:84-114)."""
    if len(predicted_box_covariances) == 0:
        return {"total_entropy_mean": None}
    ent = _reg_entropy(jnp.asarray(predicted_box_covariances, jnp.float32))
    return {"total_entropy_mean": float(jnp.mean(ent))}
