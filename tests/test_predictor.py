"""End-to-end predictor tests: every bundled inference config runs as one
jitted pipeline on a tiny model (the reference's method matrix,
README.md:110-120)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pod_compare_tpu import configs_dir
from pod_compare_tpu.config import get_cfg
from pod_compare_tpu.inference import build_predictor
from pod_compare_tpu.models import build_model, init_model_params

IMAGE_SIZE = (32, 32)
BATCH = 2

MODEL_OVERRIDES = {
    "MODEL.RETINANET.NUM_CLASSES": 7,
    "MODEL.PROBABILISTIC_MODELING.DROPOUT_RATE": 0.2,
    "MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NAME": "loss_attenuation",
    "MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NUM_SAMPLES": 3,
    "MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NAME": "negative_log_likelihood",
    "MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NUM_SAMPLES": 50,
    "PARALLEL.COMPUTE_DTYPE": "float32",
    # keep CPU test cost down
    "MODEL.RETINANET.TOPK_CANDIDATES_TEST": 64,
    "TEST.DETECTIONS_PER_IMAGE": 20,
    "PROBABILISTIC_INFERENCE.MC_DROPOUT.NUM_RUNS": 2,
    "PROBABILISTIC_INFERENCE.ENSEMBLES.RANDOM_SEED_NUMS": [0, 1000],
}


def make_cfg(inference_config):
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(configs_dir(), "Inference", inference_config))
    opts = []
    for k, v in MODEL_OVERRIDES.items():
        opts += [k, repr(v)]
    cfg.merge_from_list(opts)
    # NUM_RUNS override must come after the inference yaml merge
    if cfg.PROBABILISTIC_INFERENCE.MC_DROPOUT.NUM_RUNS > 2:
        cfg.PROBABILISTIC_INFERENCE.MC_DROPOUT.NUM_RUNS = 2
    return cfg


_PARAM_CACHE = {}


def get_params(cfg, seed=0):
    key = (seed,)
    if key not in _PARAM_CACHE:
        model = build_model(cfg)
        _PARAM_CACHE[key] = init_model_params(model, IMAGE_SIZE, seed=seed)
    return _PARAM_CACHE[key]


def run_predictor(inference_config):
    cfg = make_cfg(inference_config)
    if cfg.PROBABILISTIC_INFERENCE.INFERENCE_MODE == "ensembles":
        params_list = [get_params(cfg, s) for s in [0, 1]]
        pred = build_predictor(cfg, IMAGE_SIZE, params_list=params_list)
    else:
        pred = build_predictor(cfg, IMAGE_SIZE, params=get_params(cfg))
    images = jnp.asarray(
        np.random.RandomState(0).rand(BATCH, *IMAGE_SIZE, 3) * 255, jnp.float32
    )
    input_sizes = np.tile(np.asarray(IMAGE_SIZE, np.float32), (BATCH, 1))
    output_sizes = np.asarray([[64, 64], [128, 96]], np.float32)
    dets = pred(images, input_sizes, output_sizes, jax.random.PRNGKey(0))
    return cfg, dets


ALL_INFERENCE_CONFIGS = [
    "standard_nms.yaml",
    "anchor_statistics.yaml",
    "bayes_od.yaml",
    "bayes_od_mc_dropout.yaml",
    "ensembles_pre_nms.yaml",
    "ensembles_post_nms.yaml",
    "mc_dropout_ensembles_pre_nms.yaml",
    "mc_dropout_ensembles_post_nms.yaml",
]


@pytest.mark.parametrize("inference_config", ALL_INFERENCE_CONFIGS)
def test_inference_config_runs(inference_config):
    cfg, dets = run_predictor(inference_config)
    max_dets = cfg.TEST.DETECTIONS_PER_IMAGE
    assert dets.boxes.shape == (BATCH, max_dets, 4)
    assert dets.covs.shape == (BATCH, max_dets, 4, 4)
    assert dets.scores.shape == (BATCH, max_dets)
    assert dets.prob_vectors.shape == (BATCH, max_dets, 7)
    assert np.isfinite(np.asarray(dets.boxes)).all()
    v = np.asarray(dets.valid)
    # boxes rescaled into the original-image frame and clipped
    for b in range(BATCH):
        if v[b].any():
            boxes = np.asarray(dets.boxes)[b][v[b]]
            h, w = [64, 64] if b == 0 else [128, 96]
            assert (boxes[:, 0] >= 0).all() and (boxes[:, 2] <= w + 1e-3).all()
            assert (boxes[:, 1] >= 0).all() and (boxes[:, 3] <= h + 1e-3).all()
            covs = np.asarray(dets.covs)[b][v[b]]
            assert (np.diagonal(covs, axis1=1, axis2=2) > 0).all()


def test_mc_dropout_requires_dropout_model():
    cfg = make_cfg("bayes_od_mc_dropout.yaml")
    cfg.MODEL.PROBABILISTIC_MODELING.DROPOUT_RATE = 0.0
    with pytest.raises(ValueError):
        build_predictor(cfg, IMAGE_SIZE, params={})


def test_mc_dropout_stochastic_outputs_differ():
    cfg, dets1 = run_predictor("bayes_od_mc_dropout.yaml")
    cfg2 = make_cfg("bayes_od_mc_dropout.yaml")
    pred = build_predictor(cfg2, IMAGE_SIZE, params=get_params(cfg2))
    images = jnp.asarray(
        np.random.RandomState(0).rand(BATCH, *IMAGE_SIZE, 3) * 255, jnp.float32
    )
    input_sizes = np.tile(np.asarray(IMAGE_SIZE, np.float32), (BATCH, 1))
    output_sizes = np.asarray([[64, 64], [128, 96]], np.float32)
    d_a = pred(images, input_sizes, output_sizes, jax.random.PRNGKey(7))
    d_b = pred(images, input_sizes, output_sizes, jax.random.PRNGKey(8))
    # different dropout keys -> different scores (statistically certain)
    assert np.abs(np.asarray(d_a.scores) - np.asarray(d_b.scores)).max() > 0
