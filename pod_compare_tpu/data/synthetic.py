"""Synthetic COCO-format dataset generator for tests and benchmarks.

The reference has no test assets; SURVEY.md §4 calls for integration tests
on a tiny synthetic COCO dataset. Images contain solid rectangles on noise
backgrounds so a detector can actually learn/localize them.
"""

import json
import os
from typing import List, Tuple

import cv2
import numpy as np

from pod_compare_tpu.data.datasets import register_coco_instances


def generate_synthetic_dataset(
    root: str,
    name: str = "synthetic",
    num_images: int = 8,
    image_size: Tuple[int, int] = (64, 80),
    num_classes: int = 3,
    max_objects: int = 3,
    seed: int = 0,
) -> Tuple[str, str]:
    """Write images + COCO json; returns (json_file, image_dir)."""
    rng = np.random.RandomState(seed)
    h, w = image_size
    image_dir = os.path.join(root, f"{name}_images")
    os.makedirs(image_dir, exist_ok=True)

    colors = (rng.rand(num_classes, 3) * 155 + 100).astype(np.uint8)
    images, annotations = [], []
    ann_id = 0
    for img_id in range(num_images):
        img = (rng.rand(h, w, 3) * 40).astype(np.uint8)
        for _ in range(rng.randint(1, max_objects + 1)):
            bw = rng.randint(10, max(11, w // 3))
            bh = rng.randint(10, max(11, h // 3))
            x = rng.randint(0, w - bw)
            y = rng.randint(0, h - bh)
            cls = rng.randint(0, num_classes)
            img[y : y + bh, x : x + bw] = colors[cls]
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": img_id,
                    "category_id": cls + 1,
                    "bbox": [float(x), float(y), float(bw), float(bh)],
                    "area": float(bw * bh),
                    "iscrowd": 0,
                }
            )
            ann_id += 1
        fname = f"img_{img_id:04d}.png"
        cv2.imwrite(os.path.join(image_dir, fname), img)
        images.append(
            {"id": img_id, "file_name": fname, "height": h, "width": w, "license": 1}
        )

    coco = {
        "images": images,
        "annotations": annotations,
        "categories": [
            {"id": i + 1, "name": f"class_{i}"} for i in range(num_classes)
        ],
        "licenses": [{"id": 1, "name": "synthetic"}],
    }
    json_file = os.path.join(root, f"{name}_coco.json")
    with open(json_file, "w") as f:
        json.dump(coco, f)
    return json_file, image_dir


def register_synthetic(
    root: str, name: str = "synthetic", num_classes: int = 3, **kwargs
):
    json_file, image_dir = generate_synthetic_dataset(
        root, name, num_classes=num_classes, **kwargs
    )
    classes: List[str] = [f"class_{i}" for i in range(num_classes)]
    register_coco_instances(
        name, json_file, image_dir, classes, {i + 1: i for i in range(num_classes)}
    )
    return name
