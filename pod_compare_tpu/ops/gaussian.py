"""Gaussian/covariance primitives in pure JAX.

TPU-native equivalents of the torch.distributions functionality the
reference exercises (SURVEY.md §2.2):
  * Cholesky factor from predicted covariance params
    (reference: modeling_utils.py:4-22)
  * MVN sampling given a Cholesky factor: mean + L @ z
    (reference: probabilistic_inference.py:351-364)
  * sample mean + unbiased covariance
    (reference: inference_utils.py:337-371)
  * MVN log-prob / entropy, univariate normal CDF
    (reference: scoring_rules.py:68-108; compute_calibration_errors.py:211-254)

4x4 covariances stay on device; inverses go through Cholesky solves rather
than LAPACK round-trips (the reference drops to numpy for this,
probabilistic_inference.py:590).
"""

import math

import jax
import jax.numpy as jnp

_TRIL_ROWS = jnp.array([1, 2, 2, 3, 3, 3])
_TRIL_COLS = jnp.array([0, 0, 1, 0, 1, 2])


def covariance_output_to_cholesky(pred_bbox_cov: jnp.ndarray) -> jnp.ndarray:
    """Build a lower-triangular Cholesky factor from head outputs.

    First 4 channels are log-variances → sqrt(exp(·)) on the diagonal; for
    the 10-parameter 'full' type, the remaining 6 fill the strict lower
    triangle raw (reference: modeling_utils.py:4-22).

    Accepts (..., 4) or (..., 10); returns (..., 4, 4).
    """
    diag = jnp.sqrt(jnp.exp(pred_bbox_cov[..., 0:4]))
    chol = jnp.zeros(pred_bbox_cov.shape[:-1] + (4, 4), pred_bbox_cov.dtype)
    chol = chol.at[..., jnp.arange(4), jnp.arange(4)].set(diag)
    if pred_bbox_cov.shape[-1] > 4:
        chol = chol.at[..., _TRIL_ROWS, _TRIL_COLS].set(pred_bbox_cov[..., 4:10])
    return chol


def mvn_sample(
    rng: jax.Array,
    mean: jnp.ndarray,
    scale_tril: jnp.ndarray,
    num_samples: int,
) -> jnp.ndarray:
    """Draw (S, ..., k) samples from N(mean, L Lᵀ) as mean + L @ z."""
    k = mean.shape[-1]
    z = jax.random.normal(rng, (num_samples,) + mean.shape, dtype=mean.dtype)
    return mean[None] + jnp.einsum("...ij,s...j->s...i", scale_tril, z, precision="highest")


def sample_mean_covariance(samples: jnp.ndarray):
    """Mean and unbiased covariance over a leading sample axis.

    Args:
        samples: (S, ..., k).
    Returns:
        mean (..., k), covariance (..., k, k) — divisor S−1
        (reference: inference_utils.py:337-371).
    """
    num = samples.shape[0]
    mean = jnp.mean(samples, axis=0)
    resid = samples - mean[None]
    cov = jnp.einsum("s...i,s...j->...ij", resid, resid, precision="highest") / max(num - 1, 1)
    return mean, cov


def masked_mean_covariance(values: jnp.ndarray, mask: jnp.ndarray):
    """Mean and unbiased covariance over axis 0 with a validity mask.

    Args:
        values: (N, k); mask: (N,) boolean.
    Returns:
        mean (k,), covariance (k, k) with divisor max(count−1, 1)
        (matches the cluster statistics at reference:
        inference_utils.py:112-116).
    """
    m = mask.astype(values.dtype)[:, None]
    count = jnp.sum(m)
    mean = jnp.sum(values * m, axis=0) / jnp.maximum(count, 1.0)
    resid = (values - mean[None]) * m
    cov = jnp.einsum("ni,nj->ij", resid, resid, precision="highest") / jnp.maximum(
        count - 1.0, 1.0
    )
    return mean, cov


def mvn_log_prob(
    x: jnp.ndarray, mean: jnp.ndarray, cov: jnp.ndarray
) -> jnp.ndarray:
    """Multivariate normal log density via Cholesky (batched over leading
    axes). Equivalent of torch MultivariateNormal.log_prob
    (reference: scoring_rules.py:68-71)."""
    k = mean.shape[-1]
    chol = jnp.linalg.cholesky(cov)
    diff = x - mean
    sol = jax.scipy.linalg.solve_triangular(chol, diff[..., None], lower=True)[..., 0]
    maha = jnp.sum(sol * sol, axis=-1)
    log_det = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)
    return -0.5 * (k * math.log(2.0 * math.pi) + log_det + maha)


def mvn_entropy(cov: jnp.ndarray) -> jnp.ndarray:
    """Differential entropy of N(·, cov): 0.5·log det(2πe Σ)
    (reference: scoring_rules.py:100-108)."""
    k = cov.shape[-1]
    chol = jnp.linalg.cholesky(cov)
    log_det = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)
    return 0.5 * k * (1.0 + math.log(2.0 * math.pi)) + 0.5 * log_det


def normal_cdf(x: jnp.ndarray, mean: jnp.ndarray, std: jnp.ndarray) -> jnp.ndarray:
    """Univariate normal CDF via erf (reference:
    compute_calibration_errors.py:211-215)."""
    return 0.5 * (1.0 + jax.lax.erf((x - mean) / (std * math.sqrt(2.0))))


def inv4x4_psd(cov: jnp.ndarray) -> jnp.ndarray:
    """Batched inverse of PSD 4x4 matrices via Cholesky solves.

    Replaces the reference's numpy LAPACK round-trip in Bayesian box fusion
    (reference: probabilistic_inference.py:590; inference_utils.py:306).
    """
    chol = jnp.linalg.cholesky(cov)
    eye = jnp.broadcast_to(jnp.eye(4, dtype=cov.dtype), cov.shape)
    inv_l = jax.scipy.linalg.solve_triangular(chol, eye, lower=True)
    return jnp.einsum("...ki,...kj->...ij", inv_l, inv_l, precision="highest")


def det4x4_psd(cov: jnp.ndarray) -> jnp.ndarray:
    """Batched determinant of PSD 4x4 matrices via Cholesky."""
    chol = jnp.linalg.cholesky(cov)
    return jnp.prod(jnp.diagonal(chol, axis1=-2, axis2=-1), axis=-1) ** 2
