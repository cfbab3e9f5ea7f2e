"""Int8 head-tower quantization (ops/quant.py, models/retinanet.py::TowerConv3).

An exceed-the-reference serving feature (the reference has no quantized
path); these tests pin the three safety properties the knob relies on:
the 'none' path is numerically identical to the nn.Conv it replaced, the
int8 path is a small bounded perturbation, and parameter trees (and thus
checkpoints/converters) are unaffected.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from pod_compare_tpu.config import get_cfg
from pod_compare_tpu.models import build_model, init_model_params
from pod_compare_tpu.models.retinanet import (
    ProbabilisticRetinaNetHead,
    TowerConv3,
)
from pod_compare_tpu.ops.quant import (
    quantize_weight_per_channel,
    quantized_conv3x3,
)

IMAGE_SIZE = (64, 64)


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


def test_tower_conv_none_matches_nn_conv():
    """The full-precision TowerConv3 path must be numerically identical to
    the nn.Conv it replaced (parity surface for existing checkpoints)."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 16), jnp.float32)
    init = nn.initializers.normal(stddev=0.1)
    ref = nn.Conv(16, (3, 3), padding=[(1, 1), (1, 1)],
                  kernel_init=init, bias_init=nn.initializers.normal(0.1))
    variables = ref.init(jax.random.PRNGKey(1), x)
    ours = TowerConv3(features=16, in_features=16, kernel_init=init,
                      bias_init=nn.initializers.zeros)
    y_ref = ref.apply(variables, x)
    y_ours = ours.apply(variables, x)
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_ours))


def test_weight_quantization_roundtrip():
    rng = np.random.RandomState(1)
    k = jnp.asarray(rng.randn(3, 3, 16, 32) * 0.05, jnp.float32)
    k8, sw = quantize_weight_per_channel(k)
    assert k8.dtype == jnp.int8
    assert sw.shape == (32,)
    recon = np.asarray(k8, np.float32) * np.asarray(sw)
    err = np.abs(recon - np.asarray(k)).max()
    # max quantization error is scale/2 per channel
    assert err <= float(np.asarray(sw).max()) / 2 + 1e-7


@pytest.mark.parametrize("signed", [True, False])
def test_quantized_conv_close_to_f32(signed):
    rng = np.random.RandomState(2)
    x = rng.randn(2, 12, 12, 32).astype(np.float32)
    if not signed:
        x = np.abs(x)  # post-ReLU regime
    k = jnp.asarray(rng.randn(3, 3, 32, 32) / np.sqrt(9 * 32), jnp.float32)
    b = jnp.asarray(rng.randn(32) * 0.01, jnp.float32)
    y_q = np.asarray(quantized_conv3x3(jnp.asarray(x), k, b, act_signed=signed))
    y_f = np.asarray(
        jax.lax.conv_general_dilated(
            jnp.asarray(x), k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + b
    )
    rel = np.linalg.norm(y_q - y_f) / np.linalg.norm(y_f)
    assert rel < 0.02, rel


def test_activation_scale_is_per_image():
    """An extreme outlier in image 0 must not change image 1's quantization
    (the reference's deployment mode is batch-1; per-image scales keep the
    batched path image-independent)."""
    rng = np.random.RandomState(3)
    x1 = rng.randn(1, 8, 8, 16).astype(np.float32)
    outlier = rng.randn(1, 8, 8, 16).astype(np.float32) * 1000.0
    k = jnp.asarray(rng.randn(3, 3, 16, 16) * 0.05, jnp.float32)
    b = jnp.zeros((16,), jnp.float32)
    alone = np.asarray(quantized_conv3x3(jnp.asarray(x1), k, b))
    stacked = np.asarray(
        quantized_conv3x3(jnp.asarray(np.concatenate([outlier, x1])), k, b)
    )[1:]
    np.testing.assert_allclose(alone, stacked, rtol=0, atol=0)


def test_head_int8_close_to_f32():
    """Standalone head: int8 towers perturb the outputs only slightly."""
    head_kw = dict(num_classes=7, num_anchors=9, num_convs=4, channels=32,
                   compute_cls_var=True, compute_bbox_cov=True)
    h0 = ProbabilisticRetinaNetHead(**head_kw)
    h8 = ProbabilisticRetinaNetHead(head_quant="int8", **head_kw)
    rng = np.random.RandomState(4)
    feats = [jnp.asarray(rng.randn(2, s, s, 32), jnp.float32)
             for s in (8, 4, 2)]
    params = h0.init({"params": jax.random.PRNGKey(0)}, feats, True)["params"]
    # default inits put tower weights at std 0.01 -> activations vanish
    # after 4 layers; rescale towers to a realistic trained magnitude.
    params = jax.tree_util.tree_map(lambda p: p * 50.0 if p.ndim == 4 else p,
                                    params)
    o0 = h0.apply({"params": params}, feats, True)
    o8 = h8.apply({"params": params}, feats, True)
    for key in ("box_cls", "box_delta", "box_cls_var", "box_reg_var"):
        a = np.asarray(o0[key], np.float64).ravel()
        b = np.asarray(o8[key], np.float64).ravel()
        denom = np.linalg.norm(a - a.mean()) + 1e-12
        rel = np.linalg.norm(a - b) / denom
        assert rel < 0.15, (key, rel)
        assert np.isfinite(b).all()


def test_param_trees_identical_and_training_unquantized():
    cfg = small_cfg()
    m0 = build_model(cfg)
    m8 = build_model(cfg, head_quant="int8")
    assert m0.head_quant == "none"  # training path default
    p0 = init_model_params(m0, IMAGE_SIZE, seed=0)
    p8 = init_model_params(m8, IMAGE_SIZE, seed=0)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p8)
    for a, b in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p8)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_predictor_int8_smoke():
    """End-to-end jitted pipeline with HEAD_QUANT=int8 (BayesOD + MC)."""
    from pod_compare_tpu.inference.predictor import build_predictor

    cfg = small_cfg(**{
        "MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NAME": "loss_attenuation",
        "MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NAME": "negative_log_likelihood",
        "MODEL.PROBABILISTIC_MODELING.DROPOUT_RATE": 0.2,
        "PROBABILISTIC_INFERENCE.INFERENCE_MODE": "bayes_od",
        "PROBABILISTIC_INFERENCE.MC_DROPOUT.ENABLE": True,
        "PROBABILISTIC_INFERENCE.MC_DROPOUT.NUM_RUNS": 2,
        "PROBABILISTIC_INFERENCE.HEAD_QUANT": "int8",
    })
    model = build_model(cfg)
    params = init_model_params(model, IMAGE_SIZE, seed=0)
    predictor = build_predictor(cfg, IMAGE_SIZE, params=params)
    assert predictor.model.head_quant == "int8"
    rng = np.random.RandomState(5)
    images = jnp.asarray(rng.rand(2, *IMAGE_SIZE, 3) * 255, jnp.float32)
    sizes = np.tile(np.array([IMAGE_SIZE], np.float32), (2, 1)).reshape(2, 2)
    dets = predictor(images, sizes, sizes, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(dets.boxes)).all()
    assert np.isfinite(np.asarray(dets.covs)).all()
