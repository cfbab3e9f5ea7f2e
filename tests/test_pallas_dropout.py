"""Dropout dispatcher tests (CPU path here; the Pallas TPU kernel is
exercised by bench/TPU runs and shares the same statistical contract)."""

import jax
import jax.numpy as jnp
import numpy as np

from pod_compare_tpu.ops.pallas.dropout import dropout


def test_deterministic_passthrough(rng):
    x = jnp.asarray(rng.randn(64, 256).astype(np.float32))
    out = dropout(x, jax.random.PRNGKey(0), 0.2, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    out = dropout(x, jax.random.PRNGKey(0), 0.0, deterministic=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_dropout_statistics(rng):
    x = jnp.ones((512, 256), jnp.float32)
    rate = 0.2
    out = np.asarray(dropout(x, jax.random.PRNGKey(1), rate, False))
    dropped = (out == 0).mean()
    np.testing.assert_allclose(dropped, rate, atol=0.01)
    # kept values scaled by 1/(1-rate); mean preserved
    kept = out[out != 0]
    np.testing.assert_allclose(kept, 1.0 / (1.0 - rate), atol=1e-5)
    np.testing.assert_allclose(out.mean(), 1.0, atol=0.02)


def test_different_keys_different_masks(rng):
    x = jnp.ones((128, 256), jnp.float32)
    a = np.asarray(dropout(x, jax.random.PRNGKey(1), 0.5, False))
    b = np.asarray(dropout(x, jax.random.PRNGKey(2), 0.5, False))
    assert (a != b).any()


def test_gradient_matches_mask(rng):
    x = jnp.asarray(rng.randn(64, 128).astype(np.float32))
    key = jax.random.PRNGKey(3)

    f = lambda x: jnp.sum(dropout(x, key, 0.3, False) * 2.0)
    out = dropout(x, key, 0.3, False)
    grads = jax.grad(f)(x)
    # gradient is 2 * mask * scale — nonzero exactly where output nonzero
    mask = np.asarray(out) != 0
    g = np.asarray(grads)
    assert (g[~mask] == 0).all()
    np.testing.assert_allclose(g[mask], 2.0 / 0.7, rtol=1e-5)
