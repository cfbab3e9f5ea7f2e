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


def test_packed_dropout_distribution():
    """packed_dropout (2 keep decisions per u32) has the same keep rate,
    scaling, and mean-preservation as the bernoulli path."""
    from pod_compare_tpu.ops.pallas.dropout import packed_dropout

    x = jnp.ones((512, 256), jnp.float32)
    rate = 0.2
    out = np.asarray(packed_dropout(x, jax.random.PRNGKey(5), rate, lanes=2))
    dropped = (out == 0).mean()
    np.testing.assert_allclose(dropped, rate, atol=0.01)
    kept = out[out != 0]
    np.testing.assert_allclose(kept, 1.0 / (1.0 - rate), atol=1e-5)
    np.testing.assert_allclose(out.mean(), 1.0, atol=0.02)


def test_packed_dropout_independent_lanes():
    """Adjacent elements (sharing one u32) must still be independently
    masked: the correlation of neighboring keep decisions is ~0."""
    from pod_compare_tpu.ops.pallas.dropout import packed_dropout

    x = jnp.ones((1, 1 << 16), jnp.float32)
    out = np.asarray(
        packed_dropout(x, jax.random.PRNGKey(7), 0.5, lanes=2)
    ).ravel()
    keep = (out != 0).astype(float)
    lo, hi = keep[0::2], keep[1::2]
    corr = np.corrcoef(lo, hi)[0, 1]
    assert abs(corr) < 0.02, corr
    # both sub-word lanes drop at the same rate
    np.testing.assert_allclose(lo.mean(), 0.5, atol=0.02)
    np.testing.assert_allclose(hi.mean(), 0.5, atol=0.02)


def test_packed_dropout_odd_sizes_and_grad():
    """Non-lane-divisible sizes pad/slice correctly; gradients follow the
    mask through the packed path."""
    from pod_compare_tpu.ops.pallas.dropout import packed_dropout

    x = jnp.ones((7, 13, 5), jnp.float32)
    key = jax.random.PRNGKey(9)
    out = packed_dropout(x, key, 0.3, lanes=2)
    assert out.shape == x.shape
    g = np.asarray(
        jax.grad(lambda v: jnp.sum(packed_dropout(v, key, 0.3, lanes=2)))(x)
    )
    mask = np.asarray(out) != 0
    assert (g[~mask] == 0).all()
    np.testing.assert_allclose(g[mask], 1.0 / 0.7, rtol=1e-5)


def test_dispatcher_impl_selection():
    """dropout(..., impl=...) routes to distinct streams with matched
    statistics across all mask-bit sources."""
    x = jnp.ones((256, 128), jnp.float32)
    key = jax.random.PRNGKey(11)
    outs = {
        impl: np.asarray(dropout(x, key, 0.4, False, impl=impl))
        for impl in ("bernoulli", "packed2", "packed4", "rbg")
    }
    for impl, a in outs.items():
        np.testing.assert_allclose((a == 0).mean(), 0.4, atol=0.02, err_msg=impl)
    assert (outs["packed2"] != outs["bernoulli"]).any()
    assert (outs["rbg"] != outs["bernoulli"]).any()


def test_rbg_dropout_distribution_and_keys():
    """rbg mask bits: keep rate, scaling, and distinct streams per key."""
    from pod_compare_tpu.ops.pallas.dropout import rbg_dropout

    x = jnp.ones((512, 256), jnp.float32)
    out = np.asarray(rbg_dropout(x, jax.random.PRNGKey(3), 0.2))
    np.testing.assert_allclose((out == 0).mean(), 0.2, atol=0.01)
    kept = out[out != 0]
    np.testing.assert_allclose(kept, 1.0 / 0.8, atol=1e-5)
    out2 = np.asarray(rbg_dropout(x, jax.random.PRNGKey(4), 0.2))
    assert (out != out2).any()
