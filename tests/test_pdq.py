"""First-party PDQ (evaluation/pdq.py; Hall et al. WACV 2020).

The reference defers PDQ to external code (README.md:125) — these tests
pin the in-repo implementation to the metric's defining properties.
"""

import json
import os

import numpy as np
from scipy.special import ndtr

from pod_compare_tpu.evaluation.pdq import (
    bivariate_cdf_grid,
    evaluate_pdq,
    prob_in_map,
)


def test_bivariate_cdf_matches_product_when_uncorrelated():
    mean = np.array([10.0, 20.0])
    cov = np.diag([4.0, 9.0])
    us = np.linspace(0, 25, 13)
    vs = np.linspace(5, 40, 11)
    got = bivariate_cdf_grid(mean, cov, us, vs)
    want = ndtr((us[None, :] - 10.0) / 2.0) * ndtr((vs[:, None] - 20.0) / 3.0)
    np.testing.assert_allclose(got, want, atol=1e-4)  # quadrature accuracy


def test_bivariate_cdf_matches_monte_carlo_when_correlated():
    rng = np.random.RandomState(0)
    mean = np.array([5.0, -3.0])
    cov = np.array([[4.0, 2.4], [2.4, 9.0]])
    L = np.linalg.cholesky(cov)
    samples = mean + rng.randn(400_000, 2) @ L.T
    us = np.array([3.0, 5.0, 8.0])
    vs = np.array([-5.0, -3.0, 1.0])
    got = bivariate_cdf_grid(mean, cov, us, vs)
    for i, v in enumerate(vs):
        for j, u in enumerate(us):
            mc = np.mean((samples[:, 0] <= u) & (samples[:, 1] <= v))
            np.testing.assert_allclose(got[i, j], mc, atol=4e-3)


def test_prob_in_map_sharp_box():
    """Near-deterministic corners: probability ~1 inside the box, ~0
    outside."""
    box = np.array([10.0, 8.0, 30.0, 24.0])
    cov = np.eye(4) * 1e-4
    pmap = prob_in_map(box, cov, 48, 40)
    assert pmap[16, 20] > 0.95  # center
    assert pmap[16, 5] < 0.05   # left of box
    assert pmap[30, 20] < 0.05  # below box
    # monotone degradation: bigger corner sigma -> less mass inside
    blurry = prob_in_map(box, np.eye(4) * 36.0, 48, 40)
    assert blurry[16, 20] < pmap[16, 20]


def _write_case(tmp_path, detections, gt_annotations, images):
    out_dir = str(tmp_path / "inference_out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "coco_instances_results.json"), "w") as f:
        json.dump(detections, f)
    gt_path = str(tmp_path / "gt.json")
    with open(gt_path, "w") as f:
        json.dump({"annotations": gt_annotations, "images": images}, f)
    return out_dir, gt_path


def _det(image_id, box_xywh, cls_prob, var=0.01, cat=1):
    return {
        "image_id": image_id,
        "category_id": cat,
        "bbox": list(map(float, box_xywh)),
        "score": float(max(cls_prob)),
        "cls_prob": list(map(float, cls_prob)),
        "bbox_covar": (np.eye(4) * var).tolist(),
    }


CAT_MAP = {1: 0, 2: 1}
IMAGES = [{"id": 0, "width": 64, "height": 48}]


def test_pdq_perfect_detection(tmp_path):
    """Sharp, exactly-aligned, fully-confident detection -> PDQ ~ 1."""
    out_dir, gt_path = _write_case(
        tmp_path,
        [_det(0, [10, 8, 20, 16], [1.0, 0.0])],
        [{"image_id": 0, "category_id": 1, "bbox": [10, 8, 20, 16]}],
        IMAGES,
    )
    out = evaluate_pdq(out_dir, gt_path, CAT_MAP, verbose=False)
    assert out["tp"] == 1 and out["fp"] == 0 and out["fn"] == 0
    assert out["pdq"] > 0.8, out


def test_pdq_label_quality_geometric_mean(tmp_path):
    """Same geometry, label prob 0.49 -> pPDQ ~ sqrt(Q_S * 0.49)."""
    out_dir, gt_path = _write_case(
        tmp_path,
        [_det(0, [10, 8, 20, 16], [0.49, 0.51])],
        [{"image_id": 0, "category_id": 1, "bbox": [10, 8, 20, 16]}],
        IMAGES,
    )
    out = evaluate_pdq(out_dir, gt_path, CAT_MAP, verbose=False)
    full = evaluate_pdq(*_write_case(
        tmp_path / "b",
        [_det(0, [10, 8, 20, 16], [1.0, 0.0])],
        [{"image_id": 0, "category_id": 1, "bbox": [10, 8, 20, 16]}],
        IMAGES,
    )[:2], CAT_MAP, verbose=False)
    np.testing.assert_allclose(
        out["pdq"], full["pdq"] * np.sqrt(0.49), rtol=0.02
    )


def test_pdq_counts_fp_fn(tmp_path):
    """A far-away detection scores ~0 and both FP and FN are counted."""
    out_dir, gt_path = _write_case(
        tmp_path,
        [_det(0, [40, 30, 15, 10], [1.0, 0.0])],
        [{"image_id": 0, "category_id": 1, "bbox": [2, 2, 10, 10]}],
        IMAGES,
    )
    out = evaluate_pdq(out_dir, gt_path, CAT_MAP, verbose=False)
    assert out["pdq"] < 1e-6
    assert out["fp"] == 1 and out["fn"] == 1


def test_pdq_uncertainty_monotonicity(tmp_path):
    """Growing corner covariance on a correct box lowers spatial quality
    smoothly (the property PDQ exists to measure)."""
    scores = []
    for var in (0.25, 9.0, 100.0):
        out_dir, gt_path = _write_case(
            tmp_path / f"v{var}",
            [_det(0, [10, 8, 20, 16], [1.0, 0.0], var=var)],
            [{"image_id": 0, "category_id": 1, "bbox": [10, 8, 20, 16]}],
            IMAGES,
        )
        scores.append(
            evaluate_pdq(out_dir, gt_path, CAT_MAP, verbose=False)["pdq"]
        )
    assert scores[0] > scores[1] > scores[2] > 0.0, scores


def test_pdq_orphan_detection_counts_fp(tmp_path):
    """Detections on an image id absent from the gt json are FPs, not
    silently dropped."""
    out_dir, gt_path = _write_case(
        tmp_path,
        [_det(0, [10, 8, 20, 16], [1.0, 0.0]),
         _det(7, [10, 8, 20, 16], [1.0, 0.0])],  # image 7 not in gt
        [{"image_id": 0, "category_id": 1, "bbox": [10, 8, 20, 16]}],
        IMAGES,
    )
    out = evaluate_pdq(out_dir, gt_path, CAT_MAP, verbose=False)
    assert out["tp"] == 1 and out["fp"] == 1 and out["fn"] == 0


def test_pdq_nonfinite_covariance_is_fp_not_crash(tmp_path):
    """One NaN covariance must not abort the dataset evaluation; the bad
    detection scores 0 (FP) and the good one still matches."""
    bad = _det(0, [40, 30, 15, 10], [1.0, 0.0], cat=2)
    bad["bbox_covar"] = (np.full((4, 4), np.nan)).tolist()
    out_dir, gt_path = _write_case(
        tmp_path,
        [_det(0, [10, 8, 20, 16], [1.0, 0.0]), bad],
        [{"image_id": 0, "category_id": 1, "bbox": [10, 8, 20, 16]}],
        IMAGES,
    )
    out = evaluate_pdq(out_dir, gt_path, CAT_MAP, verbose=False)
    assert out["tp"] == 1 and out["fp"] == 1
    assert np.isfinite(out["pdq"]) and out["pdq"] > 0.3


def test_pdq_window_matches_full_grid():
    """The ±9σ windowed probability map equals the full-image map on the
    window, and the full map is ~0 outside it."""
    from pod_compare_tpu.evaluation.pdq import _detection_window, _prob_in_grid

    box = np.array([20.0, 12.0, 36.0, 28.0])
    cov = np.eye(4) * 2.0
    W, H = 96, 64
    full = prob_in_map(box, cov, W, H)
    r0, r1, c0, c1 = _detection_window(box, cov, W, H)
    win = _prob_in_grid(box, cov, np.arange(c0, c1) + 0.5,
                        np.arange(r0, r1) + 0.5)
    np.testing.assert_allclose(win, full[r0:r1, c0:c1], rtol=0, atol=1e-12)
    # Outside the window the full-grid map holds only far-field trapezoid
    # quadrature noise (measured ~3e-5); the true probability there is 0 to
    # float64 precision, and the windowed evaluator treats it as exactly 0.
    outside = full.copy()
    outside[r0:r1, c0:c1] = 0.0
    assert outside.max() < 1e-4


def test_pdq_missed_gt_image(tmp_path):
    """Images with gt but no detections contribute FNs to the divisor."""
    images = [{"id": 0, "width": 64, "height": 48},
              {"id": 1, "width": 64, "height": 48}]
    out_dir, gt_path = _write_case(
        tmp_path,
        [_det(0, [10, 8, 20, 16], [1.0, 0.0])],
        [{"image_id": 0, "category_id": 1, "bbox": [10, 8, 20, 16]},
         {"image_id": 1, "category_id": 1, "bbox": [10, 8, 20, 16]}],
        images,
    )
    out = evaluate_pdq(out_dir, gt_path, CAT_MAP, verbose=False)
    assert out["tp"] == 1 and out["fn"] == 1
    # PDQ halves: one perfect TP over (1 TP + 1 FN)
    assert 0.35 < out["pdq"] < 0.55, out
