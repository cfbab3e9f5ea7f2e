"""Visualizer tests: ellipse geometry against the reference formula and
end-to-end overlay rendering."""

import numpy as np
from scipy.stats import chi2, norm

from pod_compare_tpu.visualization.visualizer import (
    ProbabilisticVisualizer,
    cov_ellipse,
    entropy_color,
)


def test_cov_ellipse_isotropic():
    """Isotropic covariance: circle with diameter 2·sqrt(var·r²)."""
    var = 4.0
    w, h, rot = cov_ellipse(np.eye(2) * var, nsig=2)
    q = 2 * norm.cdf(2) - 1
    expected = 2 * np.sqrt(var * chi2.ppf(q, 2))
    np.testing.assert_allclose(w, expected, rtol=1e-6)
    np.testing.assert_allclose(h, expected, rtol=1e-6)


def test_cov_ellipse_anisotropic_rotation():
    # covariance elongated along x: larger eigenvalue on the second output
    cov = np.array([[9.0, 0.0], [0.0, 1.0]])
    w, h, rot = cov_ellipse(cov, nsig=1)
    # eigh returns ascending eigenvalues -> width from the small one
    assert h > w
    # 45°-correlated covariance: the reported angle (reference formula uses
    # the smallest-eigenvalue eigenvector) is 45° mod 90°
    cov45 = np.array([[5.0, 4.0], [4.0, 5.0]])
    w2, h2, rot2 = cov_ellipse(cov45, nsig=1)
    assert abs(rot2 % 90.0 - 45.0) < 1e-4


def test_overlay_renders_pixels():
    img = np.zeros((100, 120, 3), np.uint8)
    vis = ProbabilisticVisualizer(img)
    boxes = np.array([[10, 10, 60, 50], [30, 40, 90, 80]], float)
    covs = np.stack([np.eye(4) * 9.0, np.eye(4) * 4.0])
    out = vis.overlay_covariance_instances(boxes, covs).get_image()
    assert out.shape == (100, 120, 3)
    assert (out > 0).any()


def test_entropy_color_gradient():
    low = entropy_color(0.0)
    high = entropy_color(10.0)
    assert low[1] > low[2]   # green dominant when confident
    assert high[2] > high[1]  # red dominant when uncertain
