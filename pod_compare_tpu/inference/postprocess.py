"""Detection postprocessing: rescaling to original resolution + JSON dump.

TPU-native equivalents of the reference's
`probabilistic_detector_postprocess` (inference_utils.py:374-425) and
`instances_to_json` (inference_utils.py:454-502). Rescaling is jittable and
vmapped over the batch; JSON conversion is host-side (off the hot path).
"""

from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from pod_compare_tpu.inference.core import Detections
from pod_compare_tpu.ops.boxes import (
    clip_boxes,
    covar_xyxy_to_xywh,
    nonempty,
    scale_boxes,
    scale_covariance,
)

# Conditioning added to covariances before rescaling
# (reference: inference_utils.py:409).
COV_CONDITIONING = 1e-4


def detector_postprocess(
    det: Detections,
    input_height,
    input_width,
    output_height,
    output_width,
) -> Detections:
    """Rescale boxes and conjugate covariances to the original image
    resolution; drop empty boxes (single image; sizes may be traced)."""
    scale_x = output_width / input_width
    scale_y = output_height / input_height
    boxes = scale_boxes(det.boxes, scale_x, scale_y)
    boxes = clip_boxes(boxes, output_height, output_width)
    valid = det.valid & nonempty(boxes)
    covs = det.covs + COV_CONDITIONING * jnp.eye(4, dtype=det.covs.dtype)
    covs = scale_covariance(covs, scale_x, scale_y)
    return det._replace(boxes=boxes, covs=covs, valid=valid)


def detections_to_json(
    det,
    image_id,
    cat_mapping: Optional[Dict[int, int]] = None,
) -> List[dict]:
    """Convert one image's (host) detections to COCO-format records with the
    reference's `cls_prob` and `bbox_covar` extensions
    (reference: inference_utils.py:454-502).

    Args:
        det: Detections of numpy arrays (single image).
        cat_mapping: contiguous class index -> dataset category id; unmapped
            classes are dropped (reference: :477-479).
    """
    boxes = np.asarray(det.boxes, np.float64)
    covs = np.asarray(covar_xyxy_to_xywh(jnp.asarray(det.covs)), np.float64)
    scores = np.asarray(det.scores, np.float64)
    classes = np.asarray(det.classes)
    probs = np.asarray(det.prob_vectors, np.float64)
    valid = np.asarray(det.valid)

    results = []
    for k in range(boxes.shape[0]):
        if not valid[k]:
            continue
        cls = int(classes[k])
        if cat_mapping is not None:
            if cls not in cat_mapping:
                continue
            cat_id = int(cat_mapping[cls])
        else:
            cat_id = cls
        x1, y1, x2, y2 = boxes[k]
        results.append(
            {
                "image_id": image_id,
                "category_id": cat_id,
                "bbox": [float(x1), float(y1), float(x2 - x1), float(y2 - y1)],
                "score": float(scores[k]),
                "cls_prob": probs[k].tolist(),
                "bbox_covar": covs[k].tolist(),
            }
        )
    return results
