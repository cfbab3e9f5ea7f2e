"""Native matching engine vs the python matcher: full partition
equivalence on randomized scenarios."""

import numpy as np
import pytest

from pod_compare_tpu import native
from pod_compare_tpu.evaluation.matching import match_predictions_to_groundtruth

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def random_scenario(rng, num_images=8, k=4):
    preds, gts = {}, {}
    for img in range(num_images):
        n_gt = rng.randint(0, 5)
        if n_gt and rng.rand() < 0.9:
            xy = rng.rand(n_gt, 2) * 200
            wh = rng.rand(n_gt, 2) * 60 + 20
            gts[img] = {
                "boxes": np.concatenate([xy, xy + wh], 1),
                "cats": rng.randint(1, k + 1, n_gt).astype(np.int64),
            }
        n_det = rng.randint(0, 8)
        if n_det == 0:
            continue
        boxes = []
        for _ in range(n_det):
            if img in gts and rng.rand() < 0.7:
                base = gts[img]["boxes"][rng.randint(len(gts[img]["boxes"]))]
                jitter = rng.randn(4) * rng.choice([1.0, 8.0, 40.0])
                boxes.append(base + jitter)
            else:
                xy = rng.rand(2) * 220
                boxes.append(np.concatenate([xy, xy + rng.rand(2) * 50 + 10]))
        preds[img] = {
            "boxes": np.stack(boxes),
            "probs": rng.rand(n_det, k),
            "covs": np.tile(np.eye(4), (n_det, 1, 1)) * rng.rand(n_det, 1, 1),
        }
    return preds, gts


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_native_matches_python(seed):
    rng = np.random.RandomState(seed)
    preds, gts = random_scenario(rng)
    py = match_predictions_to_groundtruth(preds, gts, 0.1, 0.7, use_native=False)
    cc = match_predictions_to_groundtruth(preds, gts, 0.1, 0.7, use_native=True)
    for part in py:
        for field in py[part]:
            a, b = cc[part][field], py[part][field]
            if len(a) == 0 and len(b) == 0:
                continue  # empty schemas may differ in trailing dims
            np.testing.assert_allclose(
                a, b, atol=1e-9, err_msg=f"{part}/{field}"
            )


def test_native_no_gt_images():
    rng = np.random.RandomState(5)
    preds, _ = random_scenario(rng)
    py = match_predictions_to_groundtruth(preds, {}, 0.1, 0.7, use_native=False)
    cc = match_predictions_to_groundtruth(preds, {}, 0.1, 0.7, use_native=True)
    np.testing.assert_allclose(
        cc["false_positives"]["predicted_box_means"],
        py["false_positives"]["predicted_box_means"],
    )
    assert len(cc["true_positives"]["predicted_box_means"]) == 0
