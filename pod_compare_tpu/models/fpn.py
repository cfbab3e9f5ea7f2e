"""Feature Pyramid Network with RetinaNet's P6/P7 extra levels.

TPU-native equivalent of detectron2's `build_retinanet_resnet_fpn_backbone`
(reference: src/configs/Base-RetinaNet.yaml:3-4, FPN.IN_FEATURES res3-res5):
laterals + top-down nearest-2x sum on res3..res5 → p3..p5, then
LastLevelP6P7 — two stride-2 3x3 convs computed from res5 (not p5), matching
detectron2's RetinaNet wiring.
"""

from typing import Any, Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from pod_compare_tpu.models.layers import xavier_fill

Dtype = Any

FPN_STRIDES = {"p3": 8, "p4": 16, "p5": 32, "p6": 64, "p7": 128}


def _upsample_nearest_2x(x: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample cropped to `like`'s spatial shape."""
    n, h, w, c = x.shape
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return up[:, : like.shape[1], : like.shape[2], :]


class FPN(nn.Module):
    """FPN over (res3, res4, res5) with P6/P7 from res5."""

    in_features: Sequence[str] = ("res3", "res4", "res5")
    out_channels: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        def conv(n, k, s, name):
            pad = (k - 1) // 2
            return nn.Conv(
                n,
                (k, k),
                strides=(s, s),
                padding=[(pad, pad), (pad, pad)],
                use_bias=True,
                kernel_init=xavier_fill(),
                dtype=self.dtype,
                name=name,
            )

        # Top-down pathway over the backbone levels, highest stride first.
        names = list(self.in_features)  # low->high stride, e.g. res3..res5
        laterals = {
            f: conv(self.out_channels, 1, 1, f"lateral_{f}")(features[f])
            for f in names
        }
        merged = {}
        prev = None
        for f in reversed(names):
            cur = laterals[f]
            if prev is not None:
                cur = cur + _upsample_nearest_2x(prev, cur)
            merged[f] = cur
            prev = cur

        outputs = {}
        for i, f in enumerate(names):
            p = f"p{i + 3}"
            outputs[p] = conv(self.out_channels, 3, 1, f"output_{f}")(merged[f])

        # LastLevelP6P7 on the top backbone feature (res5 for RetinaNet).
        top = features[names[-1]]
        p6 = conv(self.out_channels, 3, 2, "p6")(top)
        p7 = conv(self.out_channels, 3, 2, "p7")(nn.relu(p6))
        outputs["p6"] = p6
        outputs["p7"] = p7
        return outputs
