"""CI dry run of the reference-parity runbook (tools/parity_report.py).

Real BDD data and reference checkpoints don't exist in this environment,
so this exercises the ENTIRE runbook path on synthetic assets: a
reference-format (detectron2-named, OIHW) checkpoint is synthesized from
our own params, converted back by the runbook, run through inference +
the metric suite, and the same predictions are scored again as the
"reference" column — the report must come out PASS with ~zero deltas,
and the converted params must round-trip exactly.
"""

import json
import os
import pickle
import shutil

import jax
import numpy as np
import pytest

from pod_compare_tpu.config import get_cfg
from pod_compare_tpu.data.synthetic import register_synthetic
from pod_compare_tpu.models import build_model, init_model_params

from tests.test_torch_convert import torch_key_for


def params_to_reference_sd(params):
    """Inverse of train/torch_convert.py: our pytree -> detectron2-named
    flat state dict (flax HWIO kernels -> torch OIHW)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    sd = {}
    for path, leaf in flat:
        keys = tuple(p.key for p in path)
        tkey = torch_key_for(keys, np.shape(leaf))
        arr = np.asarray(leaf)
        if tkey.endswith(".weight") and arr.ndim == 4:
            arr = np.transpose(arr, (3, 2, 0, 1))
        sd[tkey] = arr
    return sd


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    name = register_synthetic(
        root, "synth_parity", num_images=6, image_size=(64, 80)
    )
    cfg = get_cfg()
    cfg.MODEL.RETINANET.NUM_CLASSES = 3
    cfg.MODEL.PROBABILISTIC_MODELING.DROPOUT_RATE = 0.2
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NAME = "loss_attenuation"
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NUM_SAMPLES = 2
    cfg.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NAME = (
        "negative_log_likelihood"
    )
    cfg.PROBABILISTIC_INFERENCE.CLS_SAMPLING = "analytic"
    cfg.PROBABILISTIC_INFERENCE.BOX_SAMPLING = "analytic"
    cfg.MODEL.RETINANET.TOPK_CANDIDATES_TEST = 64
    cfg.MODEL.RETINANET.SCORE_THRESH_TEST = 0.0
    cfg.TEST.DETECTIONS_PER_IMAGE = 10
    cfg.PARALLEL.COMPUTE_DTYPE = "float32"
    cfg.DATASETS.TRAIN = (name,)
    cfg.DATASETS.TEST = (name,)
    cfg.INPUT.MIN_SIZE_TRAIN = (64,)
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.OUTPUT_DIR = str(tmp_path_factory.mktemp("out"))
    cfg.SEED = 0
    return cfg, name


def test_parity_report_roundtrip_passes(setup, tmp_path):
    import sys

    sys.path.insert(0, ".")
    from tools.parity_report import (
        convert_reference_params,
        evaluate_prediction_dir,
        render_report,
    )
    from pod_compare_tpu.cli.apply_net import run_inference

    cfg, name = setup
    model = build_model(cfg)
    params = init_model_params(model, (64, 64), seed=0)

    # Synthesize a reference-format checkpoint and round-trip it.
    ckpt = tmp_path / "model_final.pkl"
    with open(ckpt, "wb") as f:
        pickle.dump({"model": params_to_reference_sd(params)}, f)
    converted = convert_reference_params(cfg, str(ckpt))
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(converted)[0],
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))

    # Our column: the runbook's inference + metric suite on the converted
    # checkpoint.
    summary = run_inference(
        cfg, name, "parity_dry", batch_size=2, params=converted,
        run_metrics=True, run_map=True, verbose=False,
    )
    ours = {"mAP": summary.get("mAP"), "AP50": summary.get("AP50")}
    ours.update(summary.get("probabilistic_metrics", {}))
    ours.update(summary.get("calibration_errors", {}))

    # "Reference" column: the same prediction dump re-scored through
    # evaluate_prediction_dir (the --reference-predictions path).
    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    shutil.copyfile(
        os.path.join(summary["inference_output_dir"],
                     "coco_instances_results.json"),
        ref_dir / "coco_instances_results.json",
    )
    reference = evaluate_prediction_dir(str(ref_dir), name, name)

    report = render_report(ours, reference, "dry-run self-comparison")
    assert "**Verdict:** PASS" in report, report
    # and the deltas on the banded rows are numerically zero-ish
    for key in ("mAP", "AP50"):
        if ours.get(key) is not None and np.isfinite(ours[key]):
            assert abs(ours[key] - reference[key]) < 1e-9


def test_parity_report_fails_on_real_gap(setup):
    from tools.parity_report import render_report

    ours = {"mAP": 0.300, "AP50": 0.50}
    reference = {"mAP": 0.310, "AP50": 0.50}  # 3.2% off -> FAIL
    report = render_report(ours, reference, "synthetic")
    assert "**Verdict:** FAIL" in report
    assert "mAP" in report.split("failing: ")[-1]
