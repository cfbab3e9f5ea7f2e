"""Prediction viewer CLI (reference: src/visualize_predictions.py).

Overlays ground truth (green) and predictions colored by categorical
entropy with 2σ corner covariance ellipses; writes pngs to
`<inference_output_dir>/viz/` instead of opening GUI windows.
"""

import os

import cv2
import numpy as np

from pod_compare_tpu.config import (
    inference_output_dir,
    setup_arg_parser,
    setup_config,
)
from pod_compare_tpu.data.datasets import get_dataset
from pod_compare_tpu.data.loader import load_image_bgr
from pod_compare_tpu.evaluation.matching import (
    preprocess_gt,
    preprocess_predictions,
)
from pod_compare_tpu.visualization.visualizer import (
    ProbabilisticVisualizer,
    entropy_color,
)


def categorical_entropy(probs: np.ndarray) -> np.ndarray:
    """Entropy of the predicted categorical distribution per detection
    (reference: visualize_predictions.py:88-107)."""
    p = probs / np.clip(probs.sum(axis=-1, keepdims=True), 1e-9, None)
    return -np.sum(p * np.log(np.clip(p, 1e-9, None)), axis=-1)


def visualize_dataset(
    test_dataset: str,
    out_dir: str,
    predictions_file: str,
    min_allowed_score: float = 0.0,
    max_images: int = 50,
):
    import json

    dataset = get_dataset(test_dataset)
    with open(predictions_file) as f:
        preds = preprocess_predictions(json.load(f), min_allowed_score)
    with open(dataset.json_file) as f:
        gt = json.load(f)
    gts = preprocess_gt(gt["annotations"])

    os.makedirs(out_dir, exist_ok=True)
    records = {r["image_id"]: r for r in dataset.load()}
    for i, (img_id, p) in enumerate(preds.items()):
        if i >= max_images or img_id not in records:
            break
        img = load_image_bgr(records[img_id]["file_name"]).astype(np.uint8)
        vis = ProbabilisticVisualizer(img)
        if img_id in gts:
            for box in gts[img_id]["boxes"]:
                vis.draw_box(box, color=(0, 255, 0), thickness=1)
        entropies = categorical_entropy(p["probs"])
        colors = [entropy_color(e) for e in entropies]
        vis.overlay_covariance_instances(p["boxes"], p["covs"], colors=colors)
        cv2.imwrite(os.path.join(out_dir, f"{img_id}.png"), vis.get_image())
    return out_dir


def main(args):
    cfg = setup_config(args, random_seed=args.random_seed, is_testing=True)
    inf_dir = inference_output_dir(cfg, args.test_dataset, args.inference_config)
    return visualize_dataset(
        args.test_dataset,
        os.path.join(inf_dir, "viz"),
        os.path.join(inf_dir, "coco_instances_results.json"),
        min_allowed_score=args.min_allowed_score,
    )


if __name__ == "__main__":
    parser = setup_arg_parser()
    args = parser.parse_args()
    main(args)
