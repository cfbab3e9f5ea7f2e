"""Checkpoint-converter tests: numeric parity of converted blocks against
torch functional forwards, and full-model structural round-trip."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from pod_compare_tpu.models import build_model, init_model_params
from pod_compare_tpu.models.resnet import BottleneckBlock
from pod_compare_tpu.train.torch_convert import (
    convert_torch_state_dict,
    merge_into_params,
)


def torch_frozen_bn(x, w, b, mean, var, eps=1e-5):
    scale = w / torch.sqrt(var + eps)
    return x * scale[None, :, None, None] + (b - mean * scale)[None, :, None, None]


def test_bottleneck_block_parity(rng):
    """Torch-functional caffe-style bottleneck == flax block with converted
    weights (stride 2 in the 1x1, shortcut path)."""
    cin, cmid, cout, stride = 16, 8, 32, 2
    sd = {}
    def rand(*shape, scale=0.1):
        return (rng.randn(*shape) * scale).astype(np.float32)

    for conv, (co, ci, k) in {
        "conv1": (cmid, cin, 1), "conv2": (cmid, cmid, 3),
        "conv3": (cout, cmid, 1), "shortcut": (cout, cin, 1),
    }.items():
        sd[f"res3.0.{conv}.weight"] = rand(co, ci, k, k)
        sd[f"res3.0.{conv}.norm.weight"] = rand(co, scale=1) + 1
        sd[f"res3.0.{conv}.norm.bias"] = rand(co)
        sd[f"res3.0.{conv}.norm.running_mean"] = rand(co)
        sd[f"res3.0.{conv}.norm.running_var"] = np.abs(rand(co, scale=1)) + 0.5

    x = rng.randn(1, 12, 12, cin).astype(np.float32)

    # torch forward (NCHW)
    t = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
    def tconv(name, inp, stride=1, pad=0):
        w = torch.tensor(sd[f"res3.0.{name}.weight"])
        y = F.conv2d(inp, w, stride=stride, padding=pad)
        return torch_frozen_bn(
            y,
            torch.tensor(sd[f"res3.0.{name}.norm.weight"]),
            torch.tensor(sd[f"res3.0.{name}.norm.bias"]),
            torch.tensor(sd[f"res3.0.{name}.norm.running_mean"]),
            torch.tensor(sd[f"res3.0.{name}.norm.running_var"]),
        )
    y = F.relu(tconv("conv1", t, stride=stride))
    y = F.relu(tconv("conv2", y, stride=1, pad=1))
    y = tconv("conv3", y)
    ref = F.relu(y + tconv("shortcut", t, stride=stride))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))

    converted = convert_torch_state_dict(sd)
    block_params = converted["resnet"]["res3_block0"]
    block = BottleneckBlock(
        out_channels=cout, bottleneck_channels=cmid, stride=stride,
        stride_in_1x1=True, dtype=jnp.float32,
    )
    ours = block.apply({"params": block_params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


def make_full_cfg():
    from pod_compare_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.MODEL.RETINANET.NUM_CLASSES = 7
    cfg.MODEL.PROBABILISTIC_MODELING.DROPOUT_RATE = 0.2
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NAME = "loss_attenuation"
    cfg.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NAME = "negative_log_likelihood"
    cfg.PARALLEL.COMPUTE_DTYPE = "float32"
    return cfg


def torch_key_for(path, shape):
    """Independent inverse mapping from our param paths to reference keys."""
    import re

    top = path[0]
    if top == "resnet":
        mod = path[1]
        if mod == "stem_conv1":
            return "backbone.bottom_up.stem.conv1.weight"
        if mod == "stem_norm1":
            leaf = {"scale": "weight", "bias": "bias", "mean": "running_mean",
                    "var": "running_var"}[path[2]]
            return f"backbone.bottom_up.stem.conv1.norm.{leaf}"
        m = re.match(r"res(\d)_block(\d+)", mod)
        stage, block = m.groups()
        sub = path[2]
        if sub.startswith("conv") or sub == "shortcut":
            return f"backbone.bottom_up.res{stage}.{block}.{sub}.weight"
        if sub == "shortcut_norm":
            conv = "shortcut"
        else:
            conv = "conv" + sub[-1]
        leaf = {"scale": "weight", "bias": "bias", "mean": "running_mean",
                "var": "running_var"}[path[3]]
        return f"backbone.bottom_up.res{stage}.{block}.{conv}.norm.{leaf}"
    if top == "fpn":
        mod, leaf = path[1], {"kernel": "weight", "bias": "bias"}[path[2]]
        m = re.match(r"(lateral|output)_res(\d)", mod)
        if m:
            return f"backbone.fpn_{m.group(1)}{m.group(2)}.{leaf}"
        return f"backbone.top_block.{mod}.{leaf}"
    if top == "head":
        mod, leaf = path[1], {"kernel": "weight", "bias": "bias"}[path[2]]
        m = re.match(r"(cls|bbox)_subnet_conv(\d)", mod)
        if m:
            # with dropout: Sequential = [Conv, ReLU, Dropout] per conv
            torch_idx = int(m.group(2)) * 3
            return f"head.{m.group(1)}_subnet.{torch_idx}.{leaf}"
        return f"head.{mod}.{leaf}"
    raise KeyError(path)


def test_full_model_conversion_structure(rng):
    cfg = make_full_cfg()
    model = build_model(cfg)
    params = init_model_params(model, (64, 64), seed=0)

    # Build a synthetic reference state dict covering every leaf.
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    sd = {}
    for path, leaf in flat:
        keys = tuple(p.key for p in path)
        tkey = torch_key_for(keys, leaf.shape)
        shape = np.shape(leaf)
        if tkey.endswith(".weight") and len(shape) == 4:
            # flax HWIO -> torch OIHW
            tshape = (shape[3], shape[2], shape[0], shape[1])
        else:
            tshape = shape
        sd[tkey] = rng.randn(*tshape).astype(np.float32) * 0.01
    sd["pixel_mean"] = np.zeros(3)

    converted = convert_torch_state_dict(sd)
    merged = merge_into_params(params, converted)
    # identical structure
    assert jax.tree_util.tree_structure(merged) == jax.tree_util.tree_structure(params)
    # every leaf replaced (not equal to init) and correctly transposed
    k0 = sd["backbone.bottom_up.stem.conv1.weight"]
    np.testing.assert_allclose(
        merged["resnet"]["stem_conv1"]["kernel"],
        np.transpose(k0, (2, 3, 1, 0)),
    )
    cs = sd["head.cls_score.weight"]
    np.testing.assert_allclose(
        merged["head"]["cls_score"]["kernel"], np.transpose(cs, (2, 3, 1, 0))
    )


def test_backbone_only_checkpoint_merges(rng):
    """ImageNet-style pickle (bare stem/res keys, no head) merges onto init
    params leaving the head untouched."""
    cfg = make_full_cfg()
    model = build_model(cfg)
    params = init_model_params(model, (64, 64), seed=0)
    sd = {
        "stem.conv1.weight": rng.randn(64, 3, 7, 7).astype(np.float32),
        "stem.conv1.norm.weight": np.ones(64, np.float32),
        "stem.conv1.norm.bias": np.zeros(64, np.float32),
        "stem.conv1.norm.running_mean": np.zeros(64, np.float32),
        "stem.conv1.norm.running_var": np.ones(64, np.float32),
    }
    converted = convert_torch_state_dict(sd)
    merged = merge_into_params(params, converted)
    np.testing.assert_allclose(
        merged["resnet"]["stem_conv1"]["kernel"],
        np.transpose(sd["stem.conv1.weight"], (2, 3, 1, 0)),
    )
    # head untouched
    np.testing.assert_allclose(
        merged["head"]["cls_score"]["kernel"],
        params["head"]["cls_score"]["kernel"],
    )
