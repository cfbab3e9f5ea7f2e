"""Fused Pallas stochastic-focal kernel (ops/pallas/focal.py).

Runs in Pallas interpreter mode on the CPU suite — same kernel code path
as the TPU Mosaic build. Checks: the per-element mean-over-samples loss
converges to the exact Gauss-Hermite expectation, analytic gradients
match finite differences of the (seed-deterministic) kernel, the
log-variance clamp gates the variance gradient, and the config dispatch
falls back to threefry off-TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pod_compare_tpu.ops.losses import sigmoid_focal_loss, stochastic_focal_loss
from pod_compare_tpu.ops.pallas.focal import stochastic_focal_elem_pallas


def _gauss_hermite_expected(logits, log_vars, targets, alpha, gamma, n=64):
    """Exact E_z[focal(logit + std·z)] via Gauss-Hermite quadrature."""
    nodes, weights = np.polynomial.hermite.hermgauss(n)
    nodes = jnp.asarray(np.sqrt(2.0) * nodes, jnp.float32)
    weights = jnp.asarray(weights / np.sqrt(np.pi), jnp.float32)
    std = jnp.sqrt(jnp.exp(jnp.clip(log_vars, -10.0, 10.0)))
    y = logits[None] + nodes[:, None] * std[None]
    loss = sigmoid_focal_loss(y, jnp.broadcast_to(targets, y.shape), alpha, gamma)
    return jnp.einsum("s,se->e", weights, loss)


def _example(n=4096, seed=0):
    rs = np.random.RandomState(seed)
    logits = jnp.asarray(rs.randn(n) * 2.0, jnp.float32)
    log_vars = jnp.asarray(rs.randn(n) * 1.5 - 1.0, jnp.float32)
    targets = jnp.asarray((rs.rand(n) < 0.3), jnp.float32)
    return logits, log_vars, targets


def test_forward_matches_expectation():
    """With S=128 iid draws the kernel's mean loss matches the exact
    expectation: tightly in aggregate, loosely per element."""
    logits, log_vars, targets = _example()
    seed = jnp.int32(17)
    loss = stochastic_focal_elem_pallas(
        logits, log_vars, targets, seed, 128, 0.25, 2.0
    )
    expected = _gauss_hermite_expected(logits, log_vars, targets, 0.25, 2.0)
    assert loss.shape == logits.shape
    assert np.all(np.isfinite(np.asarray(loss)))
    # Aggregate: MC standard error of the mean over 4096·128 draws.
    np.testing.assert_allclose(
        float(jnp.mean(loss)), float(jnp.mean(expected)), rtol=2e-2
    )
    # Per element: 6 sigma of a per-element S=128 estimator.
    per_elem_se = float(jnp.std(expected)) / np.sqrt(128)
    assert float(jnp.max(jnp.abs(loss - expected))) < 6 * (per_elem_se + 0.05)


def test_odd_sample_count():
    logits, log_vars, targets = _example(n=512)
    loss3 = stochastic_focal_elem_pallas(
        logits, log_vars, targets, jnp.int32(3), 3, 0.25, 2.0
    )
    assert np.all(np.isfinite(np.asarray(loss3)))
    expected = _gauss_hermite_expected(logits, log_vars, targets, 0.25, 2.0)
    # Very loose per-element band for S=3, just shape/scale sanity.
    np.testing.assert_allclose(
        float(jnp.mean(loss3)), float(jnp.mean(expected)), rtol=0.25
    )


def test_gradients_match_finite_differences():
    """Same seed -> same samples -> the loss is smooth in (logits,
    log_vars); directional derivatives must match the analytic VJP."""
    logits, log_vars, targets = _example(n=1024, seed=3)
    seed = jnp.int32(5)

    def total(x, s):
        return jnp.sum(
            stochastic_focal_elem_pallas(x, s, targets, seed, 8, 0.25, 2.0)
        )

    gx, gs = jax.grad(total, argnums=(0, 1))(logits, log_vars)
    assert np.all(np.isfinite(np.asarray(gx)))
    assert np.all(np.isfinite(np.asarray(gs)))

    rs = np.random.RandomState(0)
    for arg in (0, 1):
        v = jnp.asarray(rs.randn(1024), jnp.float32)
        eps = 1e-3
        if arg == 0:
            fp = total(logits + eps * v, log_vars)
            fm = total(logits - eps * v, log_vars)
            analytic = float(jnp.vdot(gx, v))
        else:
            fp = total(logits, log_vars + eps * v)
            fm = total(logits, log_vars - eps * v)
            analytic = float(jnp.vdot(gs, v))
        numeric = float((fp - fm) / (2 * eps))
        np.testing.assert_allclose(analytic, numeric, rtol=2e-2, atol=2e-2)


def test_clamp_gates_variance_gradient():
    logits = jnp.zeros((256,), jnp.float32)
    targets = jnp.zeros((256,), jnp.float32)
    log_vars = jnp.full((256,), 12.0, jnp.float32)  # beyond the +10 clamp

    def total(s):
        return jnp.sum(
            stochastic_focal_elem_pallas(
                logits, s, targets, jnp.int32(0), 4, 0.25, 2.0
            )
        )

    gs = jax.grad(total)(log_vars)
    np.testing.assert_array_equal(np.asarray(gs), 0.0)


def test_seed_determinism_and_streams():
    logits, log_vars, targets = _example(n=512)
    a = stochastic_focal_elem_pallas(
        logits, log_vars, targets, jnp.int32(9), 4, 0.25, 2.0
    )
    b = stochastic_focal_elem_pallas(
        logits, log_vars, targets, jnp.int32(9), 4, 0.25, 2.0
    )
    c = stochastic_focal_elem_pallas(
        logits, log_vars, targets, jnp.int32(10), 4, 0.25, 2.0
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(jnp.max(jnp.abs(a - c))) > 0.0


def test_dispatch_falls_back_off_tpu():
    """impl='pallas' on CPU uses the threefry bank (identical rng stream
    to impl='threefry', so results are bitwise equal)."""
    rng = jax.random.PRNGKey(0)
    logits = jnp.asarray(np.random.RandomState(0).randn(2, 64, 3), jnp.float32)
    log_vars = jnp.zeros_like(logits)
    targets = jnp.zeros_like(logits)
    valid = jnp.ones(logits.shape[:2], bool)
    a = stochastic_focal_loss(
        rng, logits, log_vars, targets, valid, 4, impl="threefry"
    )
    b = stochastic_focal_loss(
        rng, logits, log_vars, targets, valid, 4, impl="pallas"
    )
    assert jax.default_backend() == "cpu"
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multirank_shapes_and_padding():
    """Non-multiple-of-block sizes pad and unpad correctly."""
    rs = np.random.RandomState(1)
    logits = jnp.asarray(rs.randn(2, 333, 7), jnp.float32)
    log_vars = jnp.asarray(rs.randn(2, 333, 7) - 1.0, jnp.float32)
    targets = jnp.zeros((2, 333, 7), jnp.float32)
    loss = stochastic_focal_elem_pallas(
        logits, log_vars, targets, jnp.int32(2), 4, 0.25, 2.0
    )
    assert loss.shape == (2, 333, 7)
    assert np.all(np.isfinite(np.asarray(loss)))
