"""Convert reference (detectron2/torch) checkpoints to this framework.

Supports the two formats the reference consumes
(reference: probabilistic_inference.py:72-84; Base-BDD-RetinaNet.yaml:6):
  * full ProbabilisticRetinaNet state dicts (torch .pth, key 'model')
  * detectron2 ImageNet R-50 pickles ('detectron2://ImageNetPretrained/
    MSRA/R-50.pkl' — backbone-only Caffe2 format)

Key mapping (torch NCHW → flax NHWC/HWIO):
  backbone.bottom_up.stem.conv1            → resnet/stem_conv1 (+stem_norm1)
  backbone.bottom_up.res{S}.{B}.conv{i}    → resnet/res{S}_block{B}/conv{i}
  backbone.fpn_lateral{L} / fpn_output{L}  → fpn/lateral_res{L} / output_res{L}
  backbone.top_block.p6/p7                 → fpn/p6 / p7
  head.cls_subnet.{conv idx} etc.          → head/cls_subnet_conv{i} ...
FrozenBN buffers map 1:1 onto the FrozenBatchNorm params (same eps=1e-5).
"""

import pickle
import re
from typing import Any, Dict, Tuple

import numpy as np


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch OIHW → flax HWIO."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value, np.float32)


_NORM_MAP = {
    "weight": "scale",
    "bias": "bias",
    "running_mean": "mean",
    "running_var": "var",
}


def _convert_backbone_key(key: str, value, out: Dict) -> bool:
    """Handle `stem.*` / `res{S}.{B}.*` keys (no prefix)."""
    m = re.match(r"stem\.conv1\.(.*)$", key)
    if m:
        rest = m.group(1)
        if rest == "weight":
            _set(out, ("resnet", "stem_conv1", "kernel"), _conv_kernel(value))
        elif rest.startswith("norm."):
            _set(
                out,
                ("resnet", "stem_norm1", _NORM_MAP[rest[len("norm."):]]),
                value,
            )
        return True
    m = re.match(r"res(\d)\.(\d+)\.(conv\d|shortcut)\.(.*)$", key)
    if m:
        stage, block, conv, rest = m.groups()
        base = ("resnet", f"res{stage}_block{block}")
        if conv == "shortcut":
            conv_name, norm_name = "shortcut", "shortcut_norm"
        else:
            conv_name, norm_name = conv, "norm" + conv[-1]
        if rest == "weight":
            _set(out, base + (conv_name, "kernel"), _conv_kernel(value))
        elif rest.startswith("norm."):
            _set(out, base + (norm_name, _NORM_MAP[rest[len("norm."):]]), value)
        return True
    return False


def convert_torch_state_dict(
    state: Dict[str, Any],
    num_dropout_layers: bool = False,
) -> Dict:
    """Convert a reference model state dict (numpy values) to a params tree.

    Handles both the full-model namespace (backbone.bottom_up.*, head.*) and
    a bare backbone namespace (stem.*, res2.* — the ImageNet pickle).
    """
    out: Dict = {}
    subnet_conv_idx: Dict[str, Dict[int, int]] = {"cls": {}, "bbox": {}}

    def head_conv_index(subnet: str, torch_idx: int) -> int:
        # torch Sequential indices count ReLU (+Dropout) modules; convs are
        # every 2nd (or 3rd) entry. Map by order of first appearance.
        table = subnet_conv_idx[subnet]
        if torch_idx not in table:
            table[torch_idx] = len(table)
        return table[torch_idx]

    for key, value in state.items():
        value = np.asarray(value)
        if key.startswith("backbone.bottom_up."):
            assert _convert_backbone_key(
                key[len("backbone.bottom_up."):], value, out
            ), key
            continue
        if _convert_backbone_key(key, value, out):
            continue

        m = re.match(r"backbone\.fpn_(lateral|output)(\d)\.(weight|bias)$", key)
        if m:
            kind, level, rest = m.groups()
            name = f"{kind}_res{level}"
            leaf = "kernel" if rest == "weight" else "bias"
            v = _conv_kernel(value) if rest == "weight" else value
            _set(out, ("fpn", name, leaf), v)
            continue
        m = re.match(r"backbone\.top_block\.(p6|p7)\.(weight|bias)$", key)
        if m:
            name, rest = m.groups()
            leaf = "kernel" if rest == "weight" else "bias"
            v = _conv_kernel(value) if rest == "weight" else value
            _set(out, ("fpn", name, leaf), v)
            continue

        m = re.match(r"head\.(cls|bbox)_subnet\.(\d+)\.(weight|bias)$", key)
        if m:
            subnet, idx, rest = m.groups()
            conv_i = head_conv_index(subnet, int(idx))
            name = f"{subnet}_subnet_conv{conv_i}"
            leaf = "kernel" if rest == "weight" else "bias"
            v = _conv_kernel(value) if rest == "weight" else value
            _set(out, ("head", name, leaf), v)
            continue
        m = re.match(
            r"head\.(cls_score|bbox_pred|cls_var|bbox_cov)\.(weight|bias)$", key
        )
        if m:
            name, rest = m.groups()
            leaf = "kernel" if rest == "weight" else "bias"
            v = _conv_kernel(value) if rest == "weight" else value
            _set(out, ("head", name, leaf), v)
            continue

        if key in ("pixel_mean", "pixel_std") or key.startswith("anchor_generator"):
            continue  # config-level constants in this framework
        raise KeyError(f"Unrecognized reference checkpoint key: {key}")

    return out


def load_reference_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pth (requires torch) or detectron2 .pkl checkpoint into
    a flat numpy state dict."""
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        state = data.get("model", data)
        return {k: np.asarray(v) for k, v in state.items()}
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    state = data.get("model", data)
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in state.items()}


def merge_into_params(params: Dict, converted: Dict) -> Dict:
    """Overlay converted weights onto an initialized params tree (backbone-
    only checkpoints leave head/FPN at init — the reference's ImageNet
    warm start)."""
    import jax

    def merge(dst, src):
        out = dict(dst)
        for k, v in src.items():
            if isinstance(v, dict):
                out[k] = merge(dst[k], v)
            else:
                assert np.shape(dst[k]) == np.shape(v), (
                    k, np.shape(dst[k]), np.shape(v),
                )
                out[k] = v
        return out

    return merge(params, converted)
