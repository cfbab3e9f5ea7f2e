"""Golden-fixture validation of the first-party COCO evaluator
(VERDICT round-1 item #3).

The numpy and C++ COCOeval engines were previously only validated against
each other; these fixtures have ANALYTICALLY derived AP/AR values
(101-point interpolation worked out by hand), covering the semantics the
reference relies on through pycocotools (compute_average_precision.py:35-44):
greedy best-IoU matching, crowd/ignore handling, area ranges, max-det
truncation, duplicate suppression, and score-threshold extraction.
"""

import numpy as np
import pytest

from pod_compare_tpu import native
from pod_compare_tpu.evaluation.coco_eval import (
    COCOEvaluator,
    optimal_score_threshold,
)

ENGINES = ["numpy"] + (["native"] if native.available() else [])


def make_gt(num_images, anns, num_cats=2):
    return {
        "images": [{"id": i, "height": 100, "width": 100} for i in range(num_images)],
        "annotations": [
            {
                "id": k + 1,
                "image_id": a[0],
                "category_id": a[1],
                "bbox": list(map(float, a[2])),
                "iscrowd": a[3] if len(a) > 3 else 0,
            }
            for k, a in enumerate(anns)
        ],
        "categories": [{"id": c + 1} for c in range(num_cats)],
    }


def det(img, cat, bbox, score):
    return {
        "image_id": img,
        "category_id": cat,
        "bbox": list(map(float, bbox)),
        "score": float(score),
    }


def run(gt, dets, engine, cat_ids=None):
    ev = COCOEvaluator(gt, dets, cat_ids=cat_ids)
    stats = ev.run(verbose=False, use_native=(engine == "native"))
    return ev, stats


@pytest.mark.parametrize("engine", ENGINES)
def test_perfect_detection(engine):
    """One perfect match → every stat with support is exactly 1.

    Single-category fixture: with an unsupported extra class in cat_ids
    the reference's optimal-F1 threshold math averages in that class's -1
    sentinel scores (compute_average_precision.py:50-58) — a quirk we
    preserve, so keep it out of this golden."""
    gt = make_gt(1, [(0, 1, (10, 10, 20, 20))], num_cats=1)
    ev, stats = run(gt, [det(0, 1, (10, 10, 20, 20), 0.9)], engine)
    assert stats[0] == pytest.approx(1.0)  # AP
    assert stats[1] == pytest.approx(1.0)  # AP@.50
    assert stats[2] == pytest.approx(1.0)  # AP@.75
    assert stats[8] == pytest.approx(1.0)  # AR@100
    # 20x20 box → area 400 < 32² → 'small'
    assert stats[3] == pytest.approx(1.0)  # AP-small
    assert stats[4] == -1.0 and stats[5] == -1.0  # no medium/large support
    assert optimal_score_threshold(ev) == pytest.approx(0.9)


@pytest.mark.parametrize("engine", ENGINES)
def test_high_scoring_false_positive_halves_ap(engine):
    """FP ranked above the TP: precision envelope is 0.5 everywhere →
    AP = 0.5 at every IoU threshold."""
    gt = make_gt(1, [(0, 1, (10, 10, 20, 20))])
    dets = [
        det(0, 1, (60, 60, 20, 20), 0.9),  # FP (IoU 0 with the gt)
        det(0, 1, (10, 10, 20, 20), 0.8),  # TP
    ]
    _, stats = run(gt, dets, engine)
    assert stats[0] == pytest.approx(0.5)
    assert stats[1] == pytest.approx(0.5)
    assert stats[8] == pytest.approx(1.0)  # the gt is still recalled


@pytest.mark.parametrize("engine", ENGINES)
def test_low_scoring_false_positive_keeps_ap_one(engine):
    """FP ranked below the TP arrives after full recall → the envelope at
    every recall threshold is still 1 → AP = 1 (pycocotools semantics)."""
    gt = make_gt(1, [(0, 1, (10, 10, 20, 20))])
    dets = [
        det(0, 1, (10, 10, 20, 20), 0.9),  # TP
        det(0, 1, (60, 60, 20, 20), 0.8),  # FP
    ]
    _, stats = run(gt, dets, engine)
    assert stats[0] == pytest.approx(1.0)


@pytest.mark.parametrize("engine", ENGINES)
def test_missed_gt_51_of_101(engine):
    """2 gts, 1 matched → recall caps at 0.5: precision 1 for the 51
    recall thresholds ≤ 0.5, 0 above → AP = 51/101."""
    gt = make_gt(1, [(0, 1, (10, 10, 20, 20)), (0, 1, (60, 60, 20, 20))])
    _, stats = run(gt, [det(0, 1, (10, 10, 20, 20), 0.9)], engine)
    assert stats[0] == pytest.approx(51.0 / 101.0)
    assert stats[8] == pytest.approx(0.5)  # AR@100


@pytest.mark.parametrize("engine", ENGINES)
def test_iou_exactly_half_matches_only_lowest_threshold(engine):
    """det (0,0,10,10) vs gt (0,0,10,20): IoU = 100/200 = 0.5 exactly —
    matches only the t=0.50 threshold (inclusive), so AP = 1/10 of a
    perfect match and AP@.50 = 1."""
    gt = make_gt(1, [(0, 1, (0, 0, 10, 20))])
    _, stats = run(gt, [det(0, 1, (0, 0, 10, 10), 0.9)], engine)
    assert stats[1] == pytest.approx(1.0)  # AP@.50
    assert stats[2] == pytest.approx(0.0)  # AP@.75
    assert stats[0] == pytest.approx(0.1)  # mean over the 10 thresholds


@pytest.mark.parametrize("engine", ENGINES)
def test_crowd_gt_absorbs_detection(engine):
    """A detection inside a crowd region is IGNORED (not an FP): AP on the
    remaining real gt stays 1.0. Crowd IoU = intersection / det-area."""
    gt = make_gt(
        2,
        [
            (0, 1, (10, 10, 20, 20)),          # real gt, image 0
            (1, 1, (0, 0, 50, 50), 1),         # crowd, image 1
        ],
    )
    dets = [
        det(1, 1, (5, 5, 10, 10), 0.95),  # fully inside crowd → ignored
        det(0, 1, (10, 10, 20, 20), 0.9),  # TP
    ]
    _, stats = run(gt, dets, engine)
    assert stats[0] == pytest.approx(1.0)
    # sanity: with NO gt in image 1 the same detection is an FP ranked
    # above the TP → AP 0.5 (validates the crowd branch is exercised)
    gt_nocrowd = make_gt(2, [(0, 1, (10, 10, 20, 20))])
    _, stats2 = run(gt_nocrowd, dets, engine)
    assert stats2[0] == pytest.approx(0.5)


@pytest.mark.parametrize("engine", ENGINES)
def test_area_range_partition(engine):
    """Small (20x20=400) and medium (40x40=1600) gts, both matched: the
    small/medium APs are 1 with support, large is -1, overall AP 1."""
    gt = make_gt(
        2, [(0, 1, (10, 10, 20, 20)), (1, 1, (10, 10, 40, 40))]
    )
    dets = [
        det(0, 1, (10, 10, 20, 20), 0.9),
        det(1, 1, (10, 10, 40, 40), 0.8),
    ]
    _, stats = run(gt, dets, engine)
    assert stats[0] == pytest.approx(1.0)
    assert stats[3] == pytest.approx(1.0)   # AP-small
    assert stats[4] == pytest.approx(1.0)   # AP-medium
    assert stats[5] == -1.0                  # AP-large: no support
    assert stats[9] == pytest.approx(1.0)   # AR-small
    assert stats[10] == pytest.approx(1.0)  # AR-medium


@pytest.mark.parametrize("engine", ENGINES)
def test_max_det_truncation(engine):
    """2 gts with 2 perfect dets: AR@1 = 0.5 (only the top det counts),
    AR@10/AR@100 = 1.0."""
    gt = make_gt(1, [(0, 1, (10, 10, 20, 20)), (0, 1, (60, 60, 20, 20))])
    dets = [
        det(0, 1, (10, 10, 20, 20), 0.9),
        det(0, 1, (60, 60, 20, 20), 0.8),
    ]
    _, stats = run(gt, dets, engine)
    assert stats[6] == pytest.approx(0.5)  # AR@1
    assert stats[7] == pytest.approx(1.0)  # AR@10
    assert stats[8] == pytest.approx(1.0)  # AR@100
    assert stats[0] == pytest.approx(1.0)


@pytest.mark.parametrize("engine", ENGINES)
def test_duplicates_after_match_do_not_hurt(engine):
    """Extra duplicates on an already-matched gt rank BELOW the TP →
    envelope still 1 at every recall threshold → AP = 1."""
    gt = make_gt(1, [(0, 1, (10, 10, 20, 20))])
    dets = [
        det(0, 1, (10, 10, 20, 20), 0.9),
        det(0, 1, (10, 10, 20, 20), 0.8),
        det(0, 1, (10, 10, 20, 20), 0.7),
    ]
    _, stats = run(gt, dets, engine)
    assert stats[0] == pytest.approx(1.0)


@pytest.mark.parametrize("engine", ENGINES)
def test_best_iou_wins_not_first(engine):
    """Two gts, one det overlapping both: the det must match the
    HIGHER-IoU gt (greedy best-match, not first-above-threshold). The
    other gt is missed → AP = 51/101 at thresholds where IoU suffices."""
    # det (0,0,10,10); gtA (0,0,10,12): IoU = 100/120 = 0.8333
    # gtB (0,0,10,20): IoU = 100/200 = 0.5
    gt = make_gt(1, [(0, 1, (0, 0, 10, 20)), (0, 1, (0, 0, 10, 12))])
    _, stats = run(gt, [det(0, 1, (0, 0, 10, 10), 0.9)], engine)
    # at t = 0.50..0.80 (7 thresholds) the det matches gtA (IoU .8333);
    # gtB (.5) would also qualify at t=0.5 but has lower IoU. One of two
    # gts recalled → per-threshold AP = 51/101 for t ≤ 0.8333 → 7
    # thresholds, 0 after.
    assert stats[0] == pytest.approx((51.0 / 101.0) * 7.0 / 10.0)
    assert stats[1] == pytest.approx(51.0 / 101.0)


@pytest.mark.parametrize("engine", ENGINES)
def test_class_without_gt_excluded_from_mean(engine):
    """A category with no gt has no support (num_gt = 0) and must be
    EXCLUDED from the mean — not counted as 0 (pycocotools -1 handling)."""
    gt = make_gt(1, [(0, 1, (10, 10, 20, 20))], num_cats=2)
    dets = [
        det(0, 1, (10, 10, 20, 20), 0.9),
        det(0, 2, (60, 60, 20, 20), 0.8),  # detection for an absent class
    ]
    _, stats = run(gt, dets, engine, cat_ids=(1, 2))
    assert stats[0] == pytest.approx(1.0)


@pytest.mark.parametrize("engine", ENGINES)
def test_cross_image_score_interleaving(engine):
    """PR accumulation is GLOBAL over images, sorted by score: an FP in
    image 1 ranked between two TPs of image 0 gives pr = [1, 1/2, 2/3] at
    rc = [0.5, 0.5, 1.0] → envelope [1, 2/3, 2/3] → AP = (51 + 50·(2/3))/101."""
    gt = make_gt(
        2, [(0, 1, (10, 10, 20, 20)), (0, 1, (60, 60, 20, 20))]
    )
    dets = [
        det(0, 1, (10, 10, 20, 20), 0.9),   # TP
        det(1, 1, (10, 10, 20, 20), 0.85),  # FP (no gt in image 1)
        det(0, 1, (60, 60, 20, 20), 0.8),   # TP
    ]
    _, stats = run(gt, dets, engine)
    expected = (51.0 * 1.0 + 50.0 * (2.0 / 3.0)) / 101.0
    assert stats[0] == pytest.approx(expected)


@pytest.mark.parametrize("engine", ENGINES)
def test_two_class_mean(engine):
    """Per-class APs 1.0 (cat 1) and 0.5 (cat 2, FP above TP) → mAP 0.75
    — classes average with equal weight regardless of gt counts."""
    gt = make_gt(
        1, [(0, 1, (10, 10, 20, 20)), (0, 2, (60, 60, 20, 20))], num_cats=2
    )
    dets = [
        det(0, 1, (10, 10, 20, 20), 0.9),
        det(0, 2, (10, 60, 20, 20), 0.95),  # FP for cat 2, above its TP
        det(0, 2, (60, 60, 20, 20), 0.8),   # TP for cat 2
    ]
    _, stats = run(gt, dets, engine, cat_ids=(1, 2))
    assert stats[0] == pytest.approx(0.75)


@pytest.mark.skipif(len(ENGINES) < 2, reason="native engine not built")
def test_engines_agree_on_random_fixture():
    """Randomized cross-check numpy vs C++ on a denser scene (kept as a
    consistency property on top of the analytic goldens)."""
    rng = np.random.RandomState(0)
    anns, dets = [], []
    for img in range(4):
        for _ in range(6):
            cat = int(rng.randint(1, 3))
            x, y = rng.randint(0, 60, 2)
            w, h = rng.randint(8, 40, 2)
            anns.append((img, cat, (x, y, w, h), int(rng.rand() < 0.15)))
            jitter = rng.randint(-6, 6, 2)
            dets.append(
                det(img, cat, (x + jitter[0], y + jitter[1], w, h), rng.rand())
            )
        dets.append(det(img, 1, tuple(rng.randint(0, 50, 4) + 5), rng.rand()))
    gt = make_gt(4, anns)
    _, stats_np = run(gt, dets, "numpy")
    _, stats_cc = run(gt, dets, "native")
    np.testing.assert_allclose(stats_np, stats_cc, atol=1e-9)
