"""AOT serving export: artifact roundtrip equals the live pipeline.

The exported StableHLO artifact must reproduce the live predictor
bit-exactly (same params, inputs and rng), survive a save/load cycle
through disk with no model code in the loop, and carry an honest
manifest. (The reference has no export path — apply_net.py re-runs the
research stack for deployment.)
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pod_compare_tpu.config import get_cfg
from pod_compare_tpu.inference import build_predictor
from pod_compare_tpu.inference.export import (
    load_artifact,
    save_artifact,
)
from pod_compare_tpu.models import build_model, init_model_params

IMAGE_SIZE = (32, 32)
BATCH = 2


def make_cfg(mode="standard_nms", mc=False):
    cfg = get_cfg()
    cfg.MODEL.RETINANET.NUM_CLASSES = 5
    cfg.MODEL.PROBABILISTIC_MODELING.DROPOUT_RATE = 0.2 if mc else 0.0
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NAME = "loss_attenuation"
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NUM_SAMPLES = 3
    cfg.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NAME = (
        "negative_log_likelihood"
    )
    cfg.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NUM_SAMPLES = 20
    cfg.MODEL.RETINANET.TOPK_CANDIDATES_TEST = 32
    cfg.TEST.DETECTIONS_PER_IMAGE = 10
    cfg.PARALLEL.COMPUTE_DTYPE = "float32"
    cfg.PROBABILISTIC_INFERENCE.INFERENCE_MODE = mode
    if mc:
        cfg.PROBABILISTIC_INFERENCE.MC_DROPOUT.ENABLE = True
        cfg.PROBABILISTIC_INFERENCE.MC_DROPOUT.NUM_RUNS = 2
    return cfg


def make_predictor(cfg):
    model = build_model(cfg)
    params = init_model_params(model, IMAGE_SIZE, seed=0)
    return build_predictor(cfg, IMAGE_SIZE, params=params)


def example_batch():
    rs = np.random.RandomState(3)
    images = jnp.asarray(rs.rand(BATCH, *IMAGE_SIZE, 3) * 255, jnp.float32)
    sizes = np.tile(np.asarray(IMAGE_SIZE, np.float32), (BATCH, 1))
    return images, sizes


@pytest.mark.parametrize(
    "mode,mc", [("standard_nms", False), ("bayes_od", True)]
)
def test_artifact_roundtrip_exact(tmp_path, mode, mc):
    cfg = make_cfg(mode, mc)
    predictor = make_predictor(cfg)
    out = save_artifact(
        predictor, str(tmp_path / "artifact"), batch_size=BATCH,
        platforms=("cpu",),
    )
    served = load_artifact(out)

    images, sizes = example_batch()
    rng = jax.random.PRNGKey(7)
    live = predictor(images, sizes, sizes, rng)
    frozen = served(images, sizes, sizes, rng)
    for name, a, b in zip(live._fields, live, frozen):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=name
        )


def test_manifest_contents(tmp_path):
    cfg = make_cfg("bayes_od", mc=True)
    predictor = make_predictor(cfg)
    out = save_artifact(
        predictor, str(tmp_path / "artifact"), batch_size=BATCH,
        platforms=("cpu",), extra_manifest={"train_config": "unit-test"},
    )
    served = load_artifact(out)
    m = served.manifest
    assert m["format"].startswith("pod_compare_tpu.serving/")
    assert m["inference_mode"] == "bayes_od"
    assert m["image_size"] == list(IMAGE_SIZE)
    assert m["batch_size"] == BATCH
    assert m["platforms"] == ["cpu"]
    assert m["mc_runs"] == 2
    assert m["num_params"] > 1_000_000  # R50+FPN+head
    assert m["train_config"] == "unit-test"
    assert m["config"]["NUM_CLASSES"] == 5
    # All three artifact files exist and are non-trivial.
    assert os.path.getsize(os.path.join(out, "pipeline.stablehlo")) > 10_000
    assert os.path.getsize(os.path.join(out, "params.msgpack")) > 1_000_000


def test_multi_platform_lowering(tmp_path):
    """One artifact carries tpu+cpu lowerings; the cpu one still runs here."""
    cfg = make_cfg("standard_nms", mc=False)
    predictor = make_predictor(cfg)
    out = save_artifact(
        predictor, str(tmp_path / "artifact"), batch_size=BATCH,
        platforms=("tpu", "cpu"),
    )
    served = load_artifact(out)
    assert served.manifest["platforms"] == ["tpu", "cpu"]
    images, sizes = example_batch()
    live = predictor(images, sizes, sizes, jax.random.PRNGKey(0))
    frozen = served(images, sizes, sizes, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(
        np.asarray(live.boxes), np.asarray(frozen.boxes)
    )


def test_export_refuses_meshed_predictor(tmp_path):
    from pod_compare_tpu.parallel.mesh import create_mesh

    cfg = make_cfg("standard_nms", mc=False)
    model = build_model(cfg)
    params = init_model_params(model, IMAGE_SIZE, seed=0)
    predictor = build_predictor(
        cfg, IMAGE_SIZE, params=params, mesh=create_mesh(2)
    )
    with pytest.raises(ValueError, match="without a mesh"):
        save_artifact(predictor, str(tmp_path / "a"), batch_size=BATCH)


def test_export_cli_smoke(tmp_path, monkeypatch):
    """End-to-end: the export CLI writes a servable artifact."""
    import argparse

    from pod_compare_tpu.cli import export_model

    monkeypatch.setenv("POD_COMPARE_DATA_DIR", str(tmp_path / "data"))
    args = argparse.Namespace(
        config_file="BDD-Detection/retinanet/retinanet_R_50_FPN_1x_reg_cls_var.yaml",
        inference_config="Inference/standard_nms.yaml",
        random_seed=0,
        dataset_dir=str(tmp_path),
        test_dataset="", iou_min=0.1, iou_correct=0.7,
        min_allowed_score=0.0, resume=False, eval_only=False, opts=[
            "MODEL.RETINANET.TOPK_CANDIDATES_TEST", "16",
            "TEST.DETECTIONS_PER_IMAGE", "5",
            "PARALLEL.COMPUTE_DTYPE", "float32",
        ],
        batch_size=1, platforms="cpu",
        output_dir=str(tmp_path / "artifact"),
        canvas_height=32, canvas_width=64,
        random_init=True,
    )
    out = export_model.main(args)
    served = load_artifact(out)
    images = jnp.zeros((1, 32, 64, 3), jnp.float32)
    sizes = np.asarray([[32.0, 64.0]], np.float32)
    dets = served(images, sizes, sizes)
    assert np.asarray(dets.boxes).shape[1] == 5
