"""Device-side resize+pad tests (serving path)."""

import numpy as np
import jax.numpy as jnp

from pod_compare_tpu.ops.preprocess import resize_and_pad


def test_bdd_geometry_identity_resize():
    """720x1280 at min 720: resize is identity, pad to 736 rows."""
    imgs = jnp.asarray(np.random.RandomState(0).rand(2, 720, 1280, 3) * 255,
                       jnp.float32)
    out, (nh, nw) = resize_and_pad(imgs, (720, 1280), 720, 1333, (736, 1280))
    assert out.shape == (2, 736, 1280, 3)
    assert (nh, nw) == (720, 1280)
    np.testing.assert_allclose(np.asarray(out[:, :720]), np.asarray(imgs),
                               atol=1e-3)
    assert float(jnp.abs(out[:, 720:]).max()) == 0.0


def test_downscale_matches_shortest_edge_rule():
    imgs = jnp.asarray(np.random.RandomState(1).rand(1, 100, 200, 3),
                       jnp.float32)
    out, (nh, nw) = resize_and_pad(imgs, (100, 200), 50, 90, (64, 96))
    # min 50 would give 50x100 but max_size 90 caps width: scale 90/200
    assert (nh, nw) == (45, 90)
    assert out.shape == (1, 64, 96, 3)
    assert float(jnp.abs(out[:, 45:, :]).max()) == 0.0
    assert float(jnp.abs(out[:, :, 90:]).max()) == 0.0
