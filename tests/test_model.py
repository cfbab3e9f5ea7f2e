"""Model tests: shapes, anchor-count consistency, dropout stochasticity,
freezing, and parameter count sanity (the reference model is ~38M params)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pod_compare_tpu.config import get_cfg
from pod_compare_tpu.models import (
    build_anchor_generator,
    build_model,
    init_model_params,
    num_params,
)

IMAGE_SIZE = (64, 64)  # tiny for CPU tests


def small_cfg(**overrides):
    cfg = get_cfg()
    cfg.MODEL.RETINANET.NUM_CLASSES = 7
    cfg.PARALLEL.COMPUTE_DTYPE = "float32"
    for k, v in overrides.items():
        node = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    return cfg


@pytest.fixture(scope="module")
def full_model_and_params():
    cfg = small_cfg(**{
        "MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NAME": "loss_attenuation",
        "MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NAME": "negative_log_likelihood",
        "MODEL.PROBABILISTIC_MODELING.DROPOUT_RATE": 0.2,
    })
    model = build_model(cfg)
    params = init_model_params(model, IMAGE_SIZE, seed=0)
    return cfg, model, params


def test_output_shapes_match_anchors(full_model_and_params):
    cfg, model, params = full_model_and_params
    gen = build_anchor_generator(cfg)
    R = gen.num_anchors(IMAGE_SIZE)
    images = jnp.zeros((2, *IMAGE_SIZE, 3), jnp.float32)
    out = model.apply({"params": params}, images, True)
    assert out["box_cls"].shape == (2, R, 7)
    assert out["box_delta"].shape == (2, R, 4)
    assert out["box_cls_var"].shape == (2, R, 7)
    assert out["box_reg_var"].shape == (2, R, 4)
    assert out["box_cls"].dtype == jnp.float32


def test_vanilla_model_has_no_var_heads():
    cfg = small_cfg()
    model = build_model(cfg)
    params = init_model_params(model, IMAGE_SIZE)
    out = model.apply(
        {"params": params}, jnp.zeros((1, *IMAGE_SIZE, 3)), True
    )
    assert out["box_cls_var"] is None
    assert out["box_reg_var"] is None


def test_cls_score_prior_bias():
    """At head init, sigmoid(logit) ≈ prior_prob and cls_var ≈ −10
    (reference: probabilistic_retinanet.py:453-470). Tested on the head in
    isolation with unit-scale features (the bias only dominates when the
    backbone is pretrained)."""
    from pod_compare_tpu.models import ProbabilisticRetinaNetHead

    head = ProbabilisticRetinaNetHead(
        num_classes=7, num_anchors=9, compute_cls_var=True, compute_bbox_cov=True
    )
    feats = [jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 256), jnp.float32)]
    params = head.init(jax.random.PRNGKey(0), feats, True)["params"]
    out = head.apply({"params": params}, feats, True)
    probs = jax.nn.sigmoid(out["box_cls"])
    np.testing.assert_allclose(np.asarray(probs).mean(), 0.01, atol=0.005)
    np.testing.assert_allclose(np.asarray(out["box_cls_var"]).mean(), -10.0, atol=0.5)
    # bbox_cov init is near-zero (std 1e-4 weights, zero bias)
    assert np.abs(np.asarray(out["box_reg_var"])).max() < 0.1


def test_dropout_stochastic_and_deterministic(full_model_and_params):
    cfg, model, params = full_model_and_params
    images = jnp.ones((1, *IMAGE_SIZE, 3), jnp.float32) * 100.0
    det1 = model.apply({"params": params}, images, True)
    det2 = model.apply({"params": params}, images, True)
    np.testing.assert_array_equal(np.asarray(det1["box_cls"]), np.asarray(det2["box_cls"]))
    s1 = model.apply(
        {"params": params}, images, False, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    s2 = model.apply(
        {"params": params}, images, False, rngs={"dropout": jax.random.PRNGKey(2)}
    )
    assert np.abs(np.asarray(s1["box_cls"]) - np.asarray(s2["box_cls"])).max() > 0


def test_backbone_head_split_matches_full(full_model_and_params):
    """backbone + forward_head must equal __call__ (the MC-dropout path
    depends on this split)."""
    cfg, model, params = full_model_and_params
    images = jnp.ones((1, *IMAGE_SIZE, 3), jnp.float32) * 50.0
    full = model.apply({"params": params}, images, True)
    feats = model.apply({"params": params}, images, method="backbone")
    split = model.apply({"params": params}, feats, True, method="forward_head")
    np.testing.assert_array_equal(
        np.asarray(full["box_cls"]), np.asarray(split["box_cls"])
    )


def test_frozen_backbone_gets_zero_grads(full_model_and_params):
    cfg, model, params = full_model_and_params
    images = jnp.ones((1, *IMAGE_SIZE, 3), jnp.float32)

    def loss_fn(p):
        out = model.apply({"params": p}, images, True)
        return jnp.sum(out["box_cls"] ** 2) + jnp.sum(out["box_delta"] ** 2)

    grads = jax.grad(loss_fn)(params)
    res = grads["resnet"]
    # stem + res2 frozen (FREEZE_AT=2)
    assert np.abs(np.asarray(res["stem_conv1"]["kernel"])).max() == 0
    assert np.abs(np.asarray(res["res2_block0"]["conv1"]["kernel"])).max() == 0
    # res3 trains
    assert np.abs(np.asarray(res["res3_block0"]["conv1"]["kernel"])).max() > 0
    # FrozenBN params always zero-grad
    assert np.abs(np.asarray(res["res4_block0"]["norm1"]["scale"])).max() == 0


def test_param_count_close_to_reference(full_model_and_params):
    """R50-FPN RetinaNet with 7 classes + var heads ≈ 38-42M params
    (SURVEY.md §2.3 cites a ~38M-param CNN)."""
    cfg, model, params = full_model_and_params
    n = num_params(params)
    assert 30e6 < n < 50e6, n


def test_head_prefix_rest_equals_full(full_model_and_params):
    """prefix() + rest() (the shared-first-conv MC decomposition, kept for
    future fused-kernel work) must equal the full head deterministically."""
    cfg, model, params = full_model_and_params
    images = jnp.ones((1, *IMAGE_SIZE, 3), jnp.float32) * 30.0
    feats = model.apply({"params": params}, images, method="backbone")
    full = model.apply({"params": params}, feats, True, method="forward_head")
    prefix = model.apply({"params": params}, feats, method="head_prefix")
    split = model.apply(
        {"params": params}, prefix, True, method="forward_head_rest"
    )
    np.testing.assert_allclose(
        np.asarray(full["box_cls"]), np.asarray(split["box_cls"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(full["box_reg_var"]), np.asarray(split["box_reg_var"]),
        atol=1e-5,
    )
