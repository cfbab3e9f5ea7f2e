"""Postprocess tests: rescale/clip/conditioning and COCO-json dump."""

import numpy as np
import jax.numpy as jnp

from pod_compare_tpu.inference.core import Detections
from pod_compare_tpu.inference.postprocess import (
    detections_to_json,
    detector_postprocess,
)


def make_dets():
    return Detections(
        boxes=jnp.asarray([[10.0, 10.0, 50.0, 50.0], [0.0, 0.0, 0.0, 0.0],
                           [90.0, 90.0, 130.0, 120.0]]),
        covs=jnp.tile(jnp.eye(4)[None], (3, 1, 1)) * 4.0,
        scores=jnp.asarray([0.9, 0.5, 0.7]),
        classes=jnp.asarray([0, 1, 2], jnp.int32),
        prob_vectors=jnp.asarray([[0.9, 0.1, 0.0], [0.2, 0.5, 0.1],
                                  [0.1, 0.2, 0.7]]),
        valid=jnp.asarray([True, True, True]),
    )


def test_detector_postprocess_scale_clip_and_conditioning():
    det = detector_postprocess(make_dets(), 100.0, 100.0, 200.0, 50.0)
    boxes = np.asarray(det.boxes)
    # scale x0.5 horizontally, x2 vertically
    np.testing.assert_allclose(boxes[0], [5, 20, 25, 50 + 50], atol=1e-4)
    # clip to output width 50
    assert (boxes[:, 2] <= 50.0 + 1e-5).all()
    # degenerate box invalidated
    assert not bool(det.valid[1])
    # covariance: (4 + 1e-4) conditioned then S Σ Sᵀ with s=(0.5,2,0.5,2)
    covs = np.asarray(det.covs)
    np.testing.assert_allclose(covs[0, 0, 0], (4 + 1e-4) * 0.25, rtol=1e-5)
    np.testing.assert_allclose(covs[0, 1, 1], (4 + 1e-4) * 4.0, rtol=1e-5)


def test_detections_to_json_mapping_and_fields():
    det = detector_postprocess(make_dets(), 100.0, 100.0, 100.0, 100.0)
    det_np = Detections(*[np.asarray(f) for f in det])
    recs = detections_to_json(det_np, image_id=7, cat_mapping={0: 1, 2: 3})
    # class 1 unmapped -> dropped; invalid row dropped
    assert [r["category_id"] for r in recs] == [1, 3]
    r = recs[0]
    assert r["image_id"] == 7
    assert len(r["bbox"]) == 4 and r["bbox"][2] > 0
    assert len(r["cls_prob"]) == 3
    cov = np.asarray(r["bbox_covar"])
    assert cov.shape == (4, 4)
    # xywh-transformed covariance stays symmetric
    np.testing.assert_allclose(cov, cov.T, atol=1e-6)
