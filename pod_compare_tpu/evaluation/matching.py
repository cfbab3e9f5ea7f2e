"""GT↔prediction matcher producing TP / duplicate / FP / FN partitions.

TPU-native counterpart of the reference's matching engine
(reference: evaluation_utils.py:19-367):
  * predictions read back from the COCO json with xywh→xyxy box and
    covariance transforms (evaluation_utils.py:45-66)
  * per-image partitioning with iou_min / iou_correct thresholds; for each
    gt, the highest-scoring detection with IoU ≥ iou_correct is the true
    positive and the rest are duplicates (evaluation_utils.py:191-367)
  * results cached on disk keyed by thresholds (evaluation_utils.py:101-136)

The reference's per-gt Python loop becomes a vectorized per-image
computation (argmax over masked score matrices); note the reference's
`gt_idxs_processed` filter is never updated there, so a detection CAN be
assigned to multiple gts — behavior preserved exactly.
"""

import json
import os
from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np


def _xywh_to_xyxy(b: np.ndarray) -> np.ndarray:
    return np.concatenate([b[..., :2], b[..., :2] + b[..., 2:]], axis=-1)


# (x1,y1,w,h)->(x1,y1,x2,y2) covariance Jacobian
# (reference: evaluation_utils.py:57-66)
_COV_J = np.array(
    [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [1.0, 0, 1.0, 0], [0, 1.0, 0.0, 1.0]]
)


def iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N, M) IoU between xyxy box arrays."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)))
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.prod(a[:, 2:] - a[:, :2], axis=1)[:, None]
    area_b = np.prod(b[:, 2:] - b[:, :2], axis=1)[None]
    union = area_a + area_b - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def preprocess_predictions(
    predicted_instances: List[dict], min_allowed_score: float = 0.0
) -> Dict[int, Dict[str, np.ndarray]]:
    """Group predictions per image as xyxy boxes / prob vectors / xyxy
    covariances (reference: eval_predictions_preprocess,
    evaluation_utils.py:19-73). Detections with category_id == -1 or max
    prob below the threshold are dropped."""
    per_image = defaultdict(lambda: {"boxes": [], "probs": [], "covs": []})
    for inst in predicted_instances:
        probs = np.asarray(inst["cls_prob"], float)
        if inst["category_id"] == -1 or probs.max() < min_allowed_score:
            continue
        entry = per_image[inst["image_id"]]
        entry["boxes"].append(_xywh_to_xyxy(np.asarray(inst["bbox"], float)))
        entry["probs"].append(probs)
        cov = np.asarray(inst["bbox_covar"], float)
        if cov.size == 16:
            cov = _COV_J @ cov.reshape(4, 4) @ _COV_J.T
        else:
            cov = np.eye(4)
        entry["covs"].append(cov)
    return {
        img: {
            "boxes": np.stack(v["boxes"]),
            "probs": np.stack(v["probs"]),
            "covs": np.stack(v["covs"]),
        }
        for img, v in per_image.items()
    }


def preprocess_gt(gt_instances: List[dict]) -> Dict[int, Dict[str, np.ndarray]]:
    """Group GT per image (reference: eval_gt_preprocess,
    evaluation_utils.py:76-92)."""
    per_image = defaultdict(lambda: {"boxes": [], "cats": []})
    for g in gt_instances:
        per_image[g["image_id"]]["boxes"].append(
            _xywh_to_xyxy(np.asarray(g["bbox"], float))
        )
        per_image[g["image_id"]]["cats"].append(g["category_id"])
    return {
        img: {
            "boxes": np.stack(v["boxes"]),
            "cats": np.asarray(v["cats"], np.int64),
        }
        for img, v in per_image.items()
    }


def _empty_partitions() -> Dict[str, Dict[str, List[np.ndarray]]]:
    return {
        "true_positives": defaultdict(list),
        "duplicates": defaultdict(list),
        "false_positives": defaultdict(list),
        "false_negatives": defaultdict(list),
    }


def match_predictions_to_groundtruth(
    preds: Dict[int, Dict[str, np.ndarray]],
    gts: Dict[int, Dict[str, np.ndarray]],
    iou_min: float = 0.1,
    iou_correct: float = 0.7,
) -> Dict[str, Dict[str, np.ndarray]]:
    """Partition detections (reference: evaluation_utils.py:191-367)."""
    parts = _empty_partitions()

    def add(part, **arrays):
        for k, v in arrays.items():
            parts[part][k].append(v)

    for img, p in preds.items():
        if img not in gts:
            add(
                "false_positives",
                predicted_box_means=p["boxes"],
                predicted_cls_probs=p["probs"],
                predicted_box_covariances=p["covs"],
            )
            continue
        g = gts[img]
        iou = iou_matrix(g["boxes"], p["boxes"])  # (G, D)

        fn_mask = (iou <= iou_min).all(axis=1)
        add(
            "false_negatives",
            gt_box_means=g["boxes"][fn_mask],
            gt_cat_idxs=g["cats"][fn_mask],
        )
        fp_mask = (iou <= iou_min).all(axis=0)
        add(
            "false_positives",
            predicted_box_means=p["boxes"][fp_mask],
            predicted_cls_probs=p["probs"][fp_mask],
            predicted_box_covariances=p["covs"][fp_mask],
        )

        tp_pairs = iou >= iou_correct  # (G, D)
        if not tp_pairs.any():
            continue
        det_scores = p["probs"].max(axis=1)  # (D,)
        masked_scores = np.where(tp_pairs, det_scores[None, :], -np.inf)
        best = masked_scores.argmax(axis=1)  # (G,)
        has_match = tp_pairs.any(axis=1)
        for gi in np.where(has_match)[0]:
            bi = best[gi]
            add(
                "true_positives",
                predicted_box_means=p["boxes"][bi : bi + 1],
                predicted_cls_probs=p["probs"][bi : bi + 1],
                predicted_box_covariances=p["covs"][bi : bi + 1],
                gt_box_means=g["boxes"][gi : gi + 1],
                gt_cat_idxs=g["cats"][gi : gi + 1],
                iou_with_ground_truth=iou[gi, bi : bi + 1],
            )
            dup = tp_pairs[gi].copy()
            dup[bi] = False
            if dup.any():
                di = np.where(dup)[0]
                add(
                    "duplicates",
                    predicted_box_means=p["boxes"][di],
                    predicted_cls_probs=p["probs"][di],
                    predicted_box_covariances=p["covs"][di],
                    gt_box_means=np.repeat(g["boxes"][gi : gi + 1], len(di), 0),
                    gt_cat_idxs=np.repeat(g["cats"][gi : gi + 1], len(di)),
                    iou_with_ground_truth=iou[gi, di],
                )

    # Canonical field schema so downstream code can index empty partitions.
    schema = {
        "true_positives": {
            "predicted_box_means": (0, 4),
            "predicted_cls_probs": (0, 0),
            "predicted_box_covariances": (0, 4, 4),
            "gt_box_means": (0, 4),
            "gt_cat_idxs": (0,),
            "iou_with_ground_truth": (0,),
        },
        "duplicates": {
            "predicted_box_means": (0, 4),
            "predicted_cls_probs": (0, 0),
            "predicted_box_covariances": (0, 4, 4),
            "gt_box_means": (0, 4),
            "gt_cat_idxs": (0,),
            "iou_with_ground_truth": (0,),
        },
        "false_positives": {
            "predicted_box_means": (0, 4),
            "predicted_cls_probs": (0, 0),
            "predicted_box_covariances": (0, 4, 4),
        },
        "false_negatives": {"gt_box_means": (0, 4), "gt_cat_idxs": (0,)},
    }
    out = {}
    for part, empty_shapes in schema.items():
        fields = parts[part]
        out[part] = {
            k: (
                np.concatenate(fields[k])
                if fields.get(k)
                else np.zeros(empty_shapes[k])
            )
            for k in empty_shapes
        }
    return out


def get_matched_results(
    inference_output_dir: str,
    gt_json_file: str,
    iou_min: float = 0.1,
    iou_correct: float = 0.7,
    min_allowed_score: float = 0.0,
    use_cache: bool = True,
) -> Dict[str, Dict[str, np.ndarray]]:
    """Load-or-compute matched results with threshold-keyed disk caching
    (reference: evaluation_utils.py:95-138; .pth caches become .npz)."""
    cache_path = os.path.join(
        inference_output_dir,
        f"matched_results_{iou_min}_{iou_correct}_{min_allowed_score}.npz",
    )
    if use_cache and os.path.isfile(cache_path):
        flat = np.load(cache_path, allow_pickle=False)
        out: Dict[str, Dict[str, np.ndarray]] = defaultdict(dict)
        for key in flat.files:
            part, field = key.split("/", 1)
            out[part][field] = flat[key]
        return dict(out)

    with open(
        os.path.join(inference_output_dir, "coco_instances_results.json")
    ) as f:
        predictions = json.load(f)
    with open(gt_json_file) as f:
        gt = json.load(f)

    preds = preprocess_predictions(predictions, min_allowed_score)
    gts = preprocess_gt(gt["annotations"])
    matched = match_predictions_to_groundtruth(preds, gts, iou_min, iou_correct)

    if use_cache:
        flat = {
            f"{part}/{field}": arr
            for part, fields in matched.items()
            for field, arr in fields.items()
        }
        np.savez(cache_path, **flat)
    return matched
