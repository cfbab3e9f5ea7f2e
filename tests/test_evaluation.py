"""Evaluation-suite tests: COCO mAP oracle scenarios, matcher semantics,
scoring rules, calibration/MUE."""

import json
import os

import numpy as np
import pytest
import torch

from pod_compare_tpu.evaluation import calibration as cal
from pod_compare_tpu.evaluation import scoring
from pod_compare_tpu.evaluation.coco_eval import COCOEvaluator, optimal_score_threshold
from pod_compare_tpu.evaluation.matching import (
    iou_matrix,
    match_predictions_to_groundtruth,
    preprocess_gt,
    preprocess_predictions,
)


# --------------------------------------------------------------- COCO mAP
def make_gt(boxes_per_image, cat=1):
    images, anns = [], []
    aid = 0
    for img_id, boxes in enumerate(boxes_per_image):
        images.append({"id": img_id, "width": 200, "height": 200,
                       "file_name": f"{img_id}.jpg"})
        for b in boxes:
            anns.append({
                "id": aid + 1, "image_id": img_id, "category_id": cat,
                "bbox": list(map(float, b)), "area": float(b[2] * b[3]),
                "iscrowd": 0,
            })
            aid += 1
    return {
        "images": images,
        "annotations": anns,
        "categories": [{"id": cat, "name": "x"}],
    }


def det(img, box, score, cat=1):
    return {"image_id": img, "category_id": cat,
            "bbox": list(map(float, box)), "score": float(score)}


def test_coco_eval_perfect_detections():
    gt = make_gt([[[10, 10, 50, 50]], [[20, 20, 40, 60]]])
    dets = [det(0, [10, 10, 50, 50], 0.9), det(1, [20, 20, 40, 60], 0.8)]
    ev = COCOEvaluator(gt, dets, cat_ids=[1])
    stats = ev.run(verbose=False)
    np.testing.assert_allclose(stats[0], 1.0, atol=1e-6)  # AP
    np.testing.assert_allclose(stats[1], 1.0, atol=1e-6)  # AP50
    np.testing.assert_allclose(stats[8], 1.0, atol=1e-6)  # AR100


def test_coco_eval_miss_and_fp():
    """One gt matched, one missed, one FP with higher score.

    Ranking: FP(0.95) then TP(0.9); P@ranks = [0, 0.5]; recall=0.5.
    101-pt AP = 0.5 precision over recalls ≤ 0.5 → AP ≈ 0.5 * 0.505.
    """
    gt = make_gt([[[10, 10, 50, 50], [100, 100, 50, 50]]])
    dets = [det(0, [10, 10, 50, 50], 0.9), det(0, [160, 10, 30, 30], 0.95)]
    ev = COCOEvaluator(gt, dets, cat_ids=[1])
    stats = ev.run(verbose=False)
    expected = 0.5 * (51 / 101)
    np.testing.assert_allclose(stats[1], expected, atol=1e-3)


def test_coco_eval_iou_threshold_sensitivity():
    """A det with IoU 0.6 counts at AP50 but not AP75."""
    gt = make_gt([[[0, 0, 100, 100]]])
    dets = [det(0, [0, 0, 100, 60], 0.9)]  # IoU = 0.6
    ev = COCOEvaluator(gt, dets, cat_ids=[1])
    stats = ev.run(verbose=False)
    np.testing.assert_allclose(stats[1], 1.0, atol=1e-6)
    np.testing.assert_allclose(stats[2], 0.0, atol=1e-6)


def test_coco_eval_crowd_ignored():
    gt = make_gt([[[10, 10, 50, 50]]])
    gt["annotations"][0]["iscrowd"] = 1
    dets = [det(0, [10, 10, 50, 50], 0.9)]
    ev = COCOEvaluator(gt, dets, cat_ids=[1])
    stats = ev.run(verbose=False)
    # no valid gt at all -> AP stays -1 (undefined), matching pycocotools
    assert stats[0] == -1.0


def test_optimal_score_threshold_reasonable():
    gt = make_gt([[[10, 10, 50, 50]], [[20, 20, 40, 60]]])
    dets = [
        det(0, [10, 10, 50, 50], 0.8),
        det(1, [20, 20, 40, 60], 0.7),
        det(0, [150, 150, 20, 20], 0.3),  # FP below the good scores
    ]
    ev = COCOEvaluator(gt, dets, cat_ids=[1])
    ev.run(verbose=False)
    thr = optimal_score_threshold(ev)
    assert 0.3 < thr <= 0.8


# ---------------------------------------------------------------- matcher
def make_matched_inputs():
    """One image: 2 gts; det0 = TP for gt0, det1 = duplicate for gt0,
    det2 = localization error (iou between min and correct), det3 = FP,
    gt1 = FN."""
    gts = {
        0: {
            "boxes": np.array([[0, 0, 50, 50], [100, 100, 150, 150]], float),
            "cats": np.array([1, 3]),
        }
    }
    preds = {
        0: {
            "boxes": np.array(
                [
                    [0, 0, 50, 50],        # iou 1.0 with gt0
                    [2, 2, 50, 50],        # iou ~0.85 with gt0
                    [0, 25, 50, 75],       # iou 0.33 with gt0 (between)
                    [300, 300, 320, 320],  # no overlap
                ],
                float,
            ),
            "probs": np.array(
                [[0.1, 0.9], [0.2, 0.7], [0.3, 0.3], [0.8, 0.1]]
            ),
            "covs": np.tile(np.eye(4), (4, 1, 1)),
        }
    }
    return preds, gts


def test_matcher_partitions():
    preds, gts = make_matched_inputs()
    m = match_predictions_to_groundtruth(preds, gts, 0.1, 0.7)
    assert len(m["true_positives"]["predicted_box_means"]) == 1
    np.testing.assert_allclose(
        m["true_positives"]["predicted_box_means"][0], [0, 0, 50, 50]
    )
    assert len(m["duplicates"]["predicted_box_means"]) == 1
    np.testing.assert_allclose(
        m["duplicates"]["predicted_box_means"][0], [2, 2, 50, 50]
    )
    assert len(m["false_positives"]["predicted_box_means"]) == 1
    np.testing.assert_allclose(
        m["false_positives"]["predicted_box_means"][0], [300, 300, 320, 320]
    )
    assert len(m["false_negatives"]["gt_box_means"]) == 1
    assert m["false_negatives"]["gt_cat_idxs"][0] == 3
    # TP iou recorded
    np.testing.assert_allclose(m["true_positives"]["iou_with_ground_truth"], [1.0])


def test_matcher_tp_is_highest_scoring():
    preds, gts = make_matched_inputs()
    # swap scores: det1 now scores higher than det0
    preds[0]["probs"][0] = [0.1, 0.5]
    preds[0]["probs"][1] = [0.2, 0.95]
    m = match_predictions_to_groundtruth(preds, gts, 0.1, 0.7)
    np.testing.assert_allclose(
        m["true_positives"]["predicted_box_means"][0], [2, 2, 50, 50]
    )


def test_matcher_image_without_gt_all_fp():
    preds, _ = make_matched_inputs()
    m = match_predictions_to_groundtruth(preds, {}, 0.1, 0.7)
    assert len(m["false_positives"]["predicted_box_means"]) == 4
    assert len(m["true_positives"].get("predicted_box_means", [])) == 0


def test_preprocess_predictions_filters_and_transforms():
    insts = [
        {"image_id": 0, "category_id": 1, "bbox": [10, 10, 20, 30],
         "score": 0.9, "cls_prob": [0.9, 0.1],
         "bbox_covar": np.eye(4).tolist()},
        {"image_id": 0, "category_id": -1, "bbox": [0, 0, 5, 5],
         "score": 0.9, "cls_prob": [0.9, 0.1],
         "bbox_covar": np.eye(4).tolist()},
        {"image_id": 0, "category_id": 1, "bbox": [0, 0, 5, 5],
         "score": 0.01, "cls_prob": [0.02, 0.01],
         "bbox_covar": np.eye(4).tolist()},
    ]
    out = preprocess_predictions(insts, min_allowed_score=0.5)
    assert len(out[0]["boxes"]) == 1  # -1 category and low score dropped
    np.testing.assert_allclose(out[0]["boxes"][0], [10, 10, 30, 40])
    # covariance transformed with the xywh->xyxy Jacobian of the reference
    J = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [1, 0, 1, 0], [0, 1, 0, 1]], float)
    np.testing.assert_allclose(out[0]["covs"][0], J @ np.eye(4) @ J.T)


# ------------------------------------------------------- scoring/calibration
def test_cls_scores_match_reference_formula():
    p = np.array([0.9, 0.8, 0.5])
    out = scoring.compute_cls_scores(p)
    np.testing.assert_allclose(
        out["ignorance_score_mean"], float(np.mean(-np.log(p))), rtol=1e-6
    )
    assert scoring.compute_cls_scores(np.zeros(0))["ignorance_score_mean"] is None


def test_reg_scores_match_torch(rng):
    means = rng.randn(6, 4).astype(np.float32) * 10
    covs = rng.randn(6, 4, 4).astype(np.float32)
    covs = covs @ covs.transpose(0, 2, 1)
    gts = means + rng.randn(6, 4).astype(np.float32)
    out = scoring.compute_reg_scores(means, covs, gts)
    dist = torch.distributions.MultivariateNormal(
        torch.tensor(means),
        torch.tensor(covs) + 1e-2 * torch.eye(4),
    )
    ref_nll = float((-dist.log_prob(torch.tensor(gts))).mean())
    np.testing.assert_allclose(out["ignorance_score_mean"], ref_nll, rtol=1e-3)
    ent = scoring.compute_reg_scores_fn(covs)
    ref_ent = float(dist.entropy().mean())
    np.testing.assert_allclose(ent["total_entropy_mean"], ref_ent, rtol=1e-3)


def test_minimum_uncertainty_error_separable():
    """Perfectly separable entropies -> MUE 0; random -> ~0.5."""
    ent = np.concatenate([np.zeros(50), np.ones(50)])
    labels = np.concatenate([np.ones(50), np.zeros(50)])
    assert cal.minimum_uncertainty_error(ent, labels) < 0.02
    rng = np.random.RandomState(0)
    mue = cal.minimum_uncertainty_error(rng.rand(2000), rng.rand(2000) > 0.5)
    assert 0.4 < mue <= 0.5


def test_marginal_calibration_error():
    rng = np.random.RandomState(0)
    probs = rng.rand(20000)
    labels = (rng.rand(20000) < probs).astype(float)  # perfectly calibrated
    assert cal.marginal_calibration_error(probs, labels) < 0.05
    miscal = cal.marginal_calibration_error(probs, 1.0 - labels)
    assert miscal > 0.3


def test_regression_calibration_perfect(rng):
    n = 5000
    means = rng.randn(n, 4).astype(np.float64) * 5
    stds = rng.rand(n, 4) + 0.5
    covs = np.stack([np.diag(s ** 2) for s in stds])
    gts = means + rng.randn(n, 4) * stds
    ece, mce = cal.regression_calibration_errors(means, covs, gts)
    assert max(ece) < 1e-3
    # badly miscalibrated: overconfident by 10x
    ece_bad, _ = cal.regression_calibration_errors(means, covs * 0.01, gts)
    assert np.mean(ece_bad) > np.mean(ece)
