"""Native C++ COCOeval engine vs the numpy reference implementation:
full-tensor equivalence on randomized scenarios."""

import numpy as np
import pytest

from pod_compare_tpu import native
from pod_compare_tpu.evaluation.coco_eval import COCOEvaluator

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def random_scenario(rng, num_images=6, num_cats=3, crowd=False):
    images = [
        {"id": i * 7, "width": 300, "height": 300, "file_name": f"{i}.jpg"}
        for i in range(num_images)
    ]
    anns, dets = [], []
    aid = 0
    for im in images:
        for _ in range(rng.randint(0, 5)):
            x, y = rng.rand(2) * 200
            w, h = rng.rand(2) * 80 + 10
            cat = int(rng.randint(1, num_cats + 1))
            anns.append(
                {
                    "id": aid + 1, "image_id": im["id"], "category_id": cat,
                    "bbox": [float(x), float(y), float(w), float(h)],
                    "area": float(w * h),
                    "iscrowd": int(crowd and rng.rand() < 0.2),
                }
            )
            aid += 1
            # a noisy detection near the gt + some misses
            if rng.rand() < 0.8:
                jitter = rng.randn(4) * 4
                dets.append(
                    {
                        "image_id": im["id"], "category_id": cat,
                        "bbox": [
                            float(x + jitter[0]), float(y + jitter[1]),
                            float(max(w + jitter[2], 4)),
                            float(max(h + jitter[3], 4)),
                        ],
                        "score": float(rng.rand()),
                    }
                )
        for _ in range(rng.randint(0, 3)):  # pure false positives
            x, y = rng.rand(2) * 250
            dets.append(
                {
                    "image_id": im["id"],
                    "category_id": int(rng.randint(1, num_cats + 1)),
                    "bbox": [float(x), float(y), 20.0, 20.0],
                    "score": float(rng.rand()),
                }
            )
    gt = {
        "images": images,
        "annotations": anns,
        "categories": [{"id": c + 1, "name": str(c)} for c in range(num_cats)],
    }
    return gt, dets


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("crowd", [False, True])
def test_native_matches_numpy(seed, crowd):
    rng = np.random.RandomState(seed)
    gt, dets = random_scenario(rng, crowd=crowd)

    ev_np = COCOEvaluator(gt, dets)
    stats_np = ev_np.run(verbose=False, use_native=False)

    ev_cc = COCOEvaluator(gt, dets)
    stats_cc = ev_cc.run(verbose=False, use_native=True)

    np.testing.assert_allclose(stats_cc, stats_np, atol=1e-10)
    np.testing.assert_allclose(
        ev_cc.eval["precision"], ev_np.eval["precision"], atol=1e-10
    )
    np.testing.assert_allclose(
        ev_cc.eval["recall"], ev_np.eval["recall"], atol=1e-10
    )
    np.testing.assert_allclose(
        ev_cc.eval["scores"], ev_np.eval["scores"], atol=1e-10
    )


def test_native_empty_detections():
    rng = np.random.RandomState(3)
    gt, _ = random_scenario(rng)
    ev_np = COCOEvaluator(gt, [])
    s_np = ev_np.run(verbose=False, use_native=False)
    ev_cc = COCOEvaluator(gt, [])
    s_cc = ev_cc.run(verbose=False, use_native=True)
    np.testing.assert_allclose(s_cc, s_np, atol=1e-10)
