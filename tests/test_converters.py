"""Converter tests on synthetic raw-format fixtures."""

import json
import os

import cv2
import numpy as np

from pod_compare_tpu.data.converters import (
    convert_bdd_to_coco,
    convert_kitti_to_coco,
    convert_lyft_to_coco,
)


def test_bdd_converter(tmp_path):
    labels = [
        {"name": "a.jpg", "category": "car", "bbox": [10, 20, 110, 70]},
        {"name": "a.jpg", "category": "person", "bbox": [5, 5, 25, 65]},
        {"name": "a.jpg", "category": "traffic light", "bbox": [0, 0, 5, 5]},
        {"name": "b.jpg", "category": "bus", "bbox": [100, 100, 300, 200]},
    ]
    images, anns = convert_bdd_to_coco.convert_split(labels)
    assert len(images) == 2
    assert images[0]["width"] == 1280 and images[0]["height"] == 720
    assert len(anns) == 3  # traffic light dropped (not in the 7 classes)
    car = anns[0]
    assert car["category_id"] == 1
    np.testing.assert_allclose(car["bbox"], [10, 20, 100, 50])
    assert car["area"] == 100 * 50
    by_cat = sorted(a["category_id"] for a in anns)
    assert by_cat == [1, 2, 4]  # car, bus, person


def make_kitti_tree(tmp_path, heights=(375,)):
    image_dir = tmp_path / "object" / "training" / "image_2"
    label_dir = tmp_path / "object" / "training" / "label_2"
    image_dir.mkdir(parents=True)
    label_dir.mkdir(parents=True)
    img = np.zeros((heights[0], 1242, 3), np.uint8)
    for iid in ["000000", "000001"]:
        cv2.imwrite(str(image_dir / f"{iid}.png"), img)
    (label_dir / "000000.txt").write_text(
        "Car 0.0 0 1.5 10.0 20.0 110.0 70.0 1.5 1.6 3.8 1 1 10 0.5\n"
        "Pedestrian 0.0 0 1.5 5.0 5.0 25.0 65.0 1.7 0.6 0.7 1 1 10 0.5\n"
        "Cyclist 0.0 0 1.5 0.0 0.0 9.0 9.0 1.7 0.6 1.8 1 1 10 0.5\n"
        "DontCare -1 -1 -10 0 0 2 2 -1 -1 -1 -1000 -1000 -1000 -10\n"
    )
    (label_dir / "000001.txt").write_text(
        "Car 0.0 0 1.5 1.0 2.0 50.0 40.0 1.5 1.6 3.8 1 1 10 0.5\n"
    )
    (tmp_path / "object" / "train.txt").write_text("000000\n")
    (tmp_path / "object" / "val.txt").write_text("000001\n")
    return tmp_path


def test_kitti_converter(tmp_path):
    root = make_kitti_tree(tmp_path)
    import argparse

    convert_kitti_to_coco.main(
        argparse.Namespace(dataset_dir=str(root), output_dir=None)
    )
    out = root / "object" / "training" / "label2-COCO-Format"
    with open(out / "train_coco_format.json") as f:
        train = json.load(f)
    assert len(train["images"]) == 1
    assert train["images"][0]["width"] == 1242
    # Cyclist + DontCare dropped; Car->car(1), Pedestrian->person(2)
    cats = sorted(a["category_id"] for a in train["annotations"])
    assert cats == [1, 2]
    with open(out / "val_coco_format.json") as f:
        val = json.load(f)
    assert len(val["annotations"]) == 1
    np.testing.assert_allclose(val["annotations"][0]["bbox"], [1, 2, 49, 38])


def test_lyft_converter(tmp_path):
    image_dir = tmp_path / "train" / "image_2"
    label_dir = tmp_path / "train" / "label_2"
    image_dir.mkdir(parents=True)
    label_dir.mkdir(parents=True)
    img = np.zeros((1024, 1224, 3), np.uint8)
    cv2.imwrite(str(image_dir / "frame0.png"), img)
    cv2.imwrite(str(image_dir / "frame1.png"), img)
    (label_dir / "frame0.txt").write_text(
        "car 0 0 0 10 10 60 50 0 0 0 0 0 0 0\n"
        "pedestrian 0 0 0 1 1 11 31 0 0 0 0 0 0 0\n"
        "motorcycle 0 0 0 2 2 22 22 0 0 0 0 0 0 0\n"
        "animal 0 0 0 3 3 13 13 0 0 0 0 0 0 0\n"
    )
    # frame1 has no label file -> skipped
    import argparse

    convert_lyft_to_coco.main(
        argparse.Namespace(dataset_dir=str(tmp_path), output_dir=None)
    )
    with open(
        tmp_path / "train" / "label2-COCO-Format" / "val_coco_format.json"
    ) as f:
        coco = json.load(f)
    assert len(coco["images"]) == 1
    cats = sorted(a["category_id"] for a in coco["annotations"])
    # car(1), person(4), motor(7); animal dropped
    assert cats == [1, 4, 7]
    assert {c["name"] for c in coco["categories"]} == {
        "car", "bus", "truck", "person", "rider", "bike", "motor",
    }
