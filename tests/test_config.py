"""Config-system tests: _BASE_ inheritance, two-file merge, freeze."""

import os

import pytest

from pod_compare_tpu.config import ConfigNode, get_cfg, load_yaml_with_base


def test_defaults_have_reference_namespaces():
    cfg = get_cfg()
    assert cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NAME == "none"
    assert cfg.PROBABILISTIC_INFERENCE.INFERENCE_MODE == "standard_nms"
    assert cfg.PROBABILISTIC_INFERENCE.ENSEMBLES.RANDOM_SEED_NUMS == [
        0, 1000, 2000, 3000, 4000,
    ]
    assert cfg.MODEL.RETINANET.IOU_THRESHOLDS == [0.4, 0.5]


def test_merge_rejects_unknown_keys():
    cfg = get_cfg()
    with pytest.raises(KeyError):
        cfg.merge_from_other(ConfigNode({"MODEL": {"TYPO_KEY": 1}}))


def test_base_inheritance(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("MODEL:\n  RETINANET:\n    NUM_CLASSES: 7\nSOLVER:\n  BASE_LR: 0.0025\n")
    child = tmp_path / "child.yaml"
    child.write_text(
        '_BASE_: "base.yaml"\nMODEL:\n  PROBABILISTIC_MODELING:\n    DROPOUT_RATE: 0.2\n'
    )
    cfg = get_cfg()
    cfg.merge_from_file(str(child))
    assert cfg.MODEL.RETINANET.NUM_CLASSES == 7
    assert cfg.SOLVER.BASE_LR == 0.0025
    assert cfg.MODEL.PROBABILISTIC_MODELING.DROPOUT_RATE == 0.2


def test_two_file_merge(tmp_path):
    """Training config defines the model, inference config overlays the
    fusion method (reference: setup.py:156-166)."""
    train = tmp_path / "train.yaml"
    train.write_text("MODEL:\n  RETINANET:\n    NUM_CLASSES: 7\n")
    inference = tmp_path / "inf.yaml"
    inference.write_text(
        "PROBABILISTIC_INFERENCE:\n  INFERENCE_MODE: 'bayes_od'\n"
        "  AFFINITY_THRESHOLD: 0.9\n"
    )
    cfg = get_cfg()
    cfg.merge_from_file(str(train))
    cfg.merge_from_file(str(inference))
    assert cfg.MODEL.RETINANET.NUM_CLASSES == 7
    assert cfg.PROBABILISTIC_INFERENCE.INFERENCE_MODE == "bayes_od"
    assert cfg.PROBABILISTIC_INFERENCE.AFFINITY_THRESHOLD == 0.9


def test_freeze_blocks_writes():
    cfg = get_cfg()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.SOLVER.BASE_LR = 1.0
    cfg.defrost()
    cfg.SOLVER.BASE_LR = 1.0
    assert cfg.SOLVER.BASE_LR == 1.0


def test_clone_independent():
    cfg = get_cfg()
    c2 = cfg.clone()
    c2.SOLVER.BASE_LR = 42.0
    assert cfg.SOLVER.BASE_LR != 42.0


def test_merge_from_list():
    cfg = get_cfg()
    cfg.merge_from_list(["SOLVER.BASE_LR", "0.01", "MODEL.RETINANET.NUM_CLASSES", "2"])
    assert cfg.SOLVER.BASE_LR == 0.01
    assert cfg.MODEL.RETINANET.NUM_CLASSES == 2


def test_tuple_coercion():
    cfg = get_cfg()
    cfg.merge_from_other(ConfigNode({"SOLVER": {"STEPS": [100, 200]}}))
    assert cfg.SOLVER.STEPS == (100, 200)


def test_bundled_configs_load():
    """All shipped YAML configs must merge cleanly into the defaults."""
    from pod_compare_tpu import configs_dir

    root = configs_dir()
    if not os.path.isdir(root):
        pytest.skip("configs not yet present")
    count = 0
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".yaml"):
                cfg = get_cfg()
                cfg.merge_from_file(os.path.join(dirpath, f))
                count += 1
    assert count >= 10
