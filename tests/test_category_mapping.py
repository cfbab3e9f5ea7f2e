"""Cross-dataset category mapping tests (BDD-trained → KITTI/Lyft eval),
replicating the reference's two mapping directions
(apply_net.py:53-79; evaluation_utils.py:370-397)."""

import pytest

from pod_compare_tpu.data.datasets import setup_all_datasets
from pod_compare_tpu.evaluation.category_mapping import (
    dataset_id_to_model_contiguous_map,
    model_to_dataset_id_map,
)


@pytest.fixture(autouse=True)
def register():
    # Registration is metadata-only; no files are touched until load().
    setup_all_datasets("/nonexistent")


def test_same_dataset_roundtrip():
    fwd = model_to_dataset_id_map("bdd_train", "bdd_val")
    # BDD: contiguous i -> dataset id i+1
    assert fwd == {i: i + 1 for i in range(7)}
    inv = dataset_id_to_model_contiguous_map("bdd_train", "bdd_val")
    assert inv == {i + 1: i for i in range(7)}


def test_bdd_to_kitti_dump_direction():
    """BDD-trained model dumping KITTI-category json: only car/person map;
    other BDD classes are dropped (category_id -1 in the reference)."""
    fwd = model_to_dataset_id_map("bdd_train", "kitti_val")
    # BDD contiguous: car=0 ... person=3; KITTI ids: car=1, person=2
    assert fwd == {0: 1, 3: 2}


def test_kitti_to_bdd_eval_direction():
    """KITTI gt ids -> BDD-contiguous indices for scoring a BDD model."""
    inv = dataset_id_to_model_contiguous_map("bdd_train", "kitti_val")
    assert inv == {1: 0, 2: 3}  # kitti car -> bdd car(0); person -> bdd person(3)


def test_lyft_uses_bdd_space():
    """Lyft is registered with BDD classes; mapping is identity-shaped."""
    fwd = model_to_dataset_id_map("bdd_train", "lyft_val")
    assert fwd == {i: i + 1 for i in range(7)}


def test_incompatible_pair_raises():
    with pytest.raises(ValueError):
        model_to_dataset_id_map("kitti_train", "bdd_val")
