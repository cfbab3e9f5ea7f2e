"""Full-network numerical parity: the flax model with converted weights
must match an independently-written torch-functional implementation of the
reference architecture (detectron2 ProbabilisticRetinaNet semantics:
caffe-style R50 FrozenBN + FPN(P6P7 from res5) + probabilistic head).

This is the strongest checkpoint-porting guarantee available without the
actual reference model zoo (zero-egress environment): every layer, stride,
padding and init-order decision is cross-checked at once.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from pod_compare_tpu.config import get_cfg
from pod_compare_tpu.models import build_model, init_model_params
from pod_compare_tpu.train.torch_convert import (
    convert_torch_state_dict,
    merge_into_params,
)

BLOCKS = {"res2": 3, "res3": 4, "res4": 6, "res5": 3}
CHANNELS = {"res2": (64, 256), "res3": (128, 512), "res4": (256, 1024),
            "res5": (512, 2048)}


def make_reference_state(rng, num_classes=3, num_anchors=9, cov_dims=4):
    """Random state dict in the reference's key namespace."""
    sd = {}

    def conv(name, co, ci, k):
        sd[f"{name}.weight"] = (rng.randn(co, ci, k, k) * 0.05).astype(np.float32)

    def norm(name, c):
        sd[f"{name}.norm.weight"] = (rng.rand(c) + 0.5).astype(np.float32)
        sd[f"{name}.norm.bias"] = (rng.randn(c) * 0.1).astype(np.float32)
        sd[f"{name}.norm.running_mean"] = (rng.randn(c) * 0.1).astype(np.float32)
        sd[f"{name}.norm.running_var"] = (rng.rand(c) + 0.5).astype(np.float32)

    pre = "backbone.bottom_up."
    conv(pre + "stem.conv1", 64, 3, 7)
    norm(pre + "stem.conv1", 64)
    cin = 64
    for stage, nblocks in BLOCKS.items():
        cmid, cout = CHANNELS[stage]
        for b in range(nblocks):
            base = f"{pre}{stage}.{b}"
            if b == 0:
                conv(f"{base}.shortcut", cout, cin, 1)
                norm(f"{base}.shortcut", cout)
            conv(f"{base}.conv1", cmid, cin if b == 0 else cout, 1)
            norm(f"{base}.conv1", cmid)
            conv(f"{base}.conv2", cmid, cmid, 3)
            norm(f"{base}.conv2", cmid)
            conv(f"{base}.conv3", cout, cmid, 1)
            norm(f"{base}.conv3", cout)
        cin = cout

    def biased_conv(name, co, ci, k):
        conv(name, co, ci, k)
        sd[f"{name}.bias"] = (rng.randn(co) * 0.05).astype(np.float32)

    for lvl, ci in [(3, 512), (4, 1024), (5, 2048)]:
        biased_conv(f"backbone.fpn_lateral{lvl}", 256, ci, 1)
        biased_conv(f"backbone.fpn_output{lvl}", 256, 256, 3)
    biased_conv("backbone.top_block.p6", 256, 2048, 3)
    biased_conv("backbone.top_block.p7", 256, 256, 3)

    for i in range(4):
        biased_conv(f"head.cls_subnet.{i * 2}", 256, 256, 3)
        biased_conv(f"head.bbox_subnet.{i * 2}", 256, 256, 3)
    biased_conv("head.cls_score", num_anchors * num_classes, 256, 3)
    biased_conv("head.bbox_pred", num_anchors * 4, 256, 3)
    biased_conv("head.cls_var", num_anchors * num_classes, 256, 3)
    biased_conv("head.bbox_cov", num_anchors * cov_dims, 256, 3)
    return sd


# ------------------------------------------------- torch-functional oracle
def t(sd, key):
    return torch.tensor(sd[key])


def frozen_bn(x, sd, name, eps=1e-5):
    w, b = t(sd, f"{name}.norm.weight"), t(sd, f"{name}.norm.bias")
    m, v = t(sd, f"{name}.norm.running_mean"), t(sd, f"{name}.norm.running_var")
    scale = w / torch.sqrt(v + eps)
    return x * scale[None, :, None, None] + (b - m * scale)[None, :, None, None]


def conv_bn(x, sd, name, stride=1, pad=0):
    x = F.conv2d(x, t(sd, f"{name}.weight"), stride=stride, padding=pad)
    return frozen_bn(x, sd, name)


def bottleneck(x, sd, base, stride, has_shortcut):
    sc = conv_bn(x, sd, f"{base}.shortcut", stride) if has_shortcut else x
    y = F.relu(conv_bn(x, sd, f"{base}.conv1", stride))  # stride_in_1x1
    y = F.relu(conv_bn(y, sd, f"{base}.conv2", 1, pad=1))
    y = conv_bn(y, sd, f"{base}.conv3", 1)
    return F.relu(y + sc)


def biased_conv_t(x, sd, name, stride=1, pad=0):
    return F.conv2d(x, t(sd, f"{name}.weight"), t(sd, f"{name}.bias"),
                    stride=stride, padding=pad)


def torch_reference_forward(sd, images_nchw, num_classes, num_anchors,
                            cov_dims, pixel_mean, pixel_std):
    pre = "backbone.bottom_up."
    x = images_nchw - torch.tensor(pixel_mean)[None, :, None, None]
    x = x / torch.tensor(pixel_std)[None, :, None, None]
    x = F.relu(conv_bn(x, sd, pre + "stem.conv1", stride=2, pad=3))
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    feats = {}
    for stage, nblocks in BLOCKS.items():
        stride = 1 if stage == "res2" else 2
        for b in range(nblocks):
            x = bottleneck(x, sd, f"{pre}{stage}.{b}", stride if b == 0 else 1,
                           has_shortcut=(b == 0))
        feats[stage] = x

    # FPN: laterals + top-down nearest + output convs; P6/P7 from res5.
    l5 = biased_conv_t(feats["res5"], sd, "backbone.fpn_lateral5")
    l4 = biased_conv_t(feats["res4"], sd, "backbone.fpn_lateral4")
    l3 = biased_conv_t(feats["res3"], sd, "backbone.fpn_lateral3")
    m5 = l5
    m4 = l4 + F.interpolate(m5, scale_factor=2, mode="nearest")
    m3 = l3 + F.interpolate(m4, scale_factor=2, mode="nearest")
    p5 = biased_conv_t(m5, sd, "backbone.fpn_output5", pad=1)
    p4 = biased_conv_t(m4, sd, "backbone.fpn_output4", pad=1)
    p3 = biased_conv_t(m3, sd, "backbone.fpn_output3", pad=1)
    p6 = biased_conv_t(feats["res5"], sd, "backbone.top_block.p6", stride=2, pad=1)
    p7 = biased_conv_t(F.relu(p6), sd, "backbone.top_block.p7", stride=2, pad=1)

    def tower(x, prefix):
        for i in range(4):
            x = F.relu(biased_conv_t(x, sd, f"head.{prefix}.{i * 2}", pad=1))
        return x

    def flatten(x, k):
        n, _, h, w = x.shape
        return (
            x.view(n, -1, k, h, w).permute(0, 3, 4, 1, 2).reshape(n, -1, k)
        )

    outs = {"box_cls": [], "box_delta": [], "box_cls_var": [], "box_reg_var": []}
    for p in [p3, p4, p5, p6, p7]:
        c = tower(p, "cls_subnet")
        b = tower(p, "bbox_subnet")
        outs["box_cls"].append(flatten(biased_conv_t(c, sd, "head.cls_score", pad=1), num_classes))
        outs["box_delta"].append(flatten(biased_conv_t(b, sd, "head.bbox_pred", pad=1), 4))
        outs["box_cls_var"].append(flatten(biased_conv_t(c, sd, "head.cls_var", pad=1), num_classes))
        outs["box_reg_var"].append(flatten(biased_conv_t(b, sd, "head.bbox_cov", pad=1), cov_dims))
    return {k: torch.cat(v, dim=1).numpy() for k, v in outs.items()}


@pytest.mark.parametrize("image_size", [(64, 64)])
def test_full_model_matches_torch_reference(rng, image_size):
    cfg = get_cfg()
    cfg.MODEL.RETINANET.NUM_CLASSES = 3
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NAME = "loss_attenuation"
    cfg.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NAME = "negative_log_likelihood"
    cfg.PARALLEL.COMPUTE_DTYPE = "float32"

    sd = make_reference_state(rng, num_classes=3)
    model = build_model(cfg)
    params = init_model_params(model, image_size, seed=0)
    params = merge_into_params(params, convert_torch_state_dict(sd))

    images = (rng.rand(1, *image_size, 3) * 255).astype(np.float32)
    ours = model.apply({"params": params}, jnp.asarray(images), True)

    ref = torch_reference_forward(
        sd,
        torch.tensor(np.transpose(images, (0, 3, 1, 2))),
        num_classes=3, num_anchors=9, cov_dims=4,
        pixel_mean=list(cfg.MODEL.PIXEL_MEAN),
        pixel_std=list(cfg.MODEL.PIXEL_STD),
    )

    for key in ["box_cls", "box_delta", "box_cls_var", "box_reg_var"]:
        a = np.asarray(ours[key])
        b = ref[key]
        assert a.shape == b.shape, key
        scale = max(np.abs(b).max(), 1.0)
        np.testing.assert_allclose(
            a / scale, b / scale, atol=2e-4,
            err_msg=f"{key}: max abs {np.abs(a - b).max()}",
        )
