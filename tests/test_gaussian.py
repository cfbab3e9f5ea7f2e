"""Gaussian-op tests against torch.distributions oracles (the reference's
providers, SURVEY.md §2.2)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from pod_compare_tpu.ops import gaussian as G


def random_psd(rng, n, k=4, scale=1.0):
    a = rng.randn(n, k, k).astype(np.float32) * scale
    return a @ a.transpose(0, 2, 1) + 0.5 * np.eye(k, dtype=np.float32)


def test_cholesky_from_diagonal_params(rng):
    params = rng.randn(7, 4).astype(np.float32)
    ours = np.asarray(G.covariance_output_to_cholesky(jnp.asarray(params)))
    # Oracle: torch diag_embed(sqrt(exp(x))) (reference modeling_utils.py:14-15)
    ref = torch.diag_embed(torch.sqrt(torch.exp(torch.tensor(params)))).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_cholesky_from_full_params(rng):
    params = rng.randn(5, 10).astype(np.float32)
    ours = np.asarray(G.covariance_output_to_cholesky(jnp.asarray(params)))
    t = torch.tensor(params)
    ref = torch.diag_embed(torch.sqrt(torch.exp(t[:, :4])))
    tril = torch.tril_indices(row=4, col=4, offset=-1)
    ref[:, tril[0], tril[1]] = t[:, 4:]
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5, atol=1e-5)
    # Lower-triangularity
    assert np.allclose(np.triu(ours, k=1), 0)


def test_mvn_sample_statistics():
    mean = jnp.asarray([[1.0, -2.0, 0.5, 3.0]])
    chol = jnp.asarray(np.linalg.cholesky(random_psd(np.random.RandomState(1), 1))[0])[None]
    samples = G.mvn_sample(jax.random.PRNGKey(0), mean, chol, 20000)
    emp_mean, emp_cov = G.sample_mean_covariance(samples)
    np.testing.assert_allclose(np.asarray(emp_mean)[0], np.asarray(mean)[0], atol=0.05)
    np.testing.assert_allclose(
        np.asarray(emp_cov)[0], np.asarray(chol[0] @ chol[0].T), atol=0.15
    )


def test_sample_mean_covariance_matches_torch_oracle(rng):
    """Oracle replicates compute_mean_covariance_torch (inference_utils.py:337-371)."""
    samples = rng.randn(9, 6, 4).astype(np.float32)  # (S, N, k)
    ours_mean, ours_cov = G.sample_mean_covariance(jnp.asarray(samples))

    t = torch.tensor(samples).permute(1, 2, 0)  # (N, k, S) like the reference
    ref_mean = t.mean(2)
    resid = (t - t.mean(2, keepdim=True)).permute(0, 2, 1)  # (N, S, k)
    ref_cov = (resid.unsqueeze(3) @ resid.unsqueeze(2)).sum(1) / (9 - 1)
    np.testing.assert_allclose(np.asarray(ours_mean), ref_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours_cov), ref_cov.numpy(), atol=1e-4)


def test_masked_mean_covariance_matches_subset(rng):
    vals = rng.randn(10, 4).astype(np.float32)
    mask = np.array([1, 0, 1, 1, 0, 1, 0, 0, 1, 1], bool)
    mean, cov = G.masked_mean_covariance(jnp.asarray(vals), jnp.asarray(mask))
    sub = vals[mask]
    np.testing.assert_allclose(np.asarray(mean), sub.mean(0), atol=1e-5)
    ref_cov = (sub - sub.mean(0)).T @ (sub - sub.mean(0)) / (len(sub) - 1)
    np.testing.assert_allclose(np.asarray(cov), ref_cov, atol=1e-4)


def test_mvn_log_prob_matches_torch(rng):
    covs = random_psd(rng, 6)
    means = rng.randn(6, 4).astype(np.float32)
    x = rng.randn(6, 4).astype(np.float32)
    ours = np.asarray(G.mvn_log_prob(jnp.asarray(x), jnp.asarray(means), jnp.asarray(covs)))
    ref = (
        torch.distributions.MultivariateNormal(
            torch.tensor(means), torch.tensor(covs)
        )
        .log_prob(torch.tensor(x))
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_mvn_entropy_matches_torch(rng):
    covs = random_psd(rng, 5)
    ours = np.asarray(G.mvn_entropy(jnp.asarray(covs)))
    ref = (
        torch.distributions.MultivariateNormal(torch.zeros(5, 4), torch.tensor(covs))
        .entropy()
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_normal_cdf_matches_torch(rng):
    x = rng.randn(20).astype(np.float32)
    mean = rng.randn(20).astype(np.float32)
    std = rng.rand(20).astype(np.float32) + 0.1
    ours = np.asarray(G.normal_cdf(jnp.asarray(x), jnp.asarray(mean), jnp.asarray(std)))
    ref = (
        torch.distributions.Normal(torch.tensor(mean), torch.tensor(std))
        .cdf(torch.tensor(x))
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_inv_and_det_4x4(rng):
    covs = random_psd(rng, 8)
    inv = np.asarray(G.inv4x4_psd(jnp.asarray(covs)))
    np.testing.assert_allclose(inv, np.linalg.inv(covs), rtol=1e-3, atol=1e-4)
    det = np.asarray(G.det4x4_psd(jnp.asarray(covs)))
    np.testing.assert_allclose(det, np.linalg.det(covs), rtol=1e-3)
