"""ResNet-50 backbone (Flax/linen, NHWC, FrozenBN) for RetinaNet-FPN.

TPU-native equivalent of detectron2's `build_resnet_backbone` as configured
by the reference (reference: src/configs/Base-RetinaNet.yaml:3-5 +
Base-BDD-RetinaNet.yaml RESNETS.DEPTH=50): caffe-style bottlenecks
(stride in the 1x1), FrozenBN everywhere, stem+res2 frozen
(MODEL.BACKBONE.FREEZE_AT=2 via stop_gradient at the stage boundary, which
also lets XLA skip the frozen backward subgraph entirely).

All convs run in a configurable compute dtype (bfloat16 by default) so the
FLOP-heavy path maps onto the MXU; params stay float32.
"""

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pod_compare_tpu.models.layers import FrozenBatchNorm, conv1x1, conv3x3

Dtype = Any

# depth -> blocks per stage (res2..res5)
RESNET_STAGES = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}

STAGE_STRIDES = {"res2": 4, "res3": 8, "res4": 16, "res5": 32}


class BottleneckBlock(nn.Module):
    """Caffe-style bottleneck: 1x1(stride) → 3x3 → 1x1, FrozenBN + ReLU."""

    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    stride_in_1x1: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s1, s3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        shortcut = x
        if x.shape[-1] != self.out_channels or self.stride != 1:
            shortcut = conv1x1(
                self.out_channels, self.stride, self.dtype, name="shortcut"
            )(x)
            shortcut = FrozenBatchNorm(
                self.out_channels, dtype=self.dtype, name="shortcut_norm"
            )(shortcut)

        y = conv1x1(self.bottleneck_channels, s1, self.dtype, name="conv1")(x)
        y = FrozenBatchNorm(self.bottleneck_channels, dtype=self.dtype, name="norm1")(y)
        y = nn.relu(y)
        y = conv3x3(self.bottleneck_channels, s3, self.dtype, name="conv2")(y)
        y = FrozenBatchNorm(self.bottleneck_channels, dtype=self.dtype, name="norm2")(y)
        y = nn.relu(y)
        y = conv1x1(self.out_channels, 1, self.dtype, name="conv3")(y)
        y = FrozenBatchNorm(self.out_channels, dtype=self.dtype, name="norm3")(y)
        return nn.relu(y + shortcut)


class ResNet(nn.Module):
    """ResNet with FrozenBN returning a dict of stage features (NHWC)."""

    depth: int = 50
    out_features: Sequence[str] = ("res3", "res4", "res5")
    stem_channels: int = 64
    res2_out_channels: int = 256
    stride_in_1x1: bool = True
    freeze_at: int = 2  # 0: none, 1: stem, 2: stem+res2, ...
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        x = x.astype(self.dtype)
        # Stem: 7x7/2 + FrozenBN + ReLU + 3x3/2 maxpool.
        x = nn.Conv(
            self.stem_channels,
            (7, 7),
            strides=(2, 2),
            padding=[(3, 3), (3, 3)],
            use_bias=False,
            dtype=self.dtype,
            name="stem_conv1",
        )(x)
        x = FrozenBatchNorm(self.stem_channels, dtype=self.dtype, name="stem_norm1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        if self.freeze_at >= 1:
            x = jax.lax.stop_gradient(x)

        blocks_per_stage = RESNET_STAGES[self.depth]
        out_channels = self.res2_out_channels
        bottleneck_channels = self.stem_channels
        outputs = {}
        for stage_idx, num_blocks in enumerate(blocks_per_stage):
            name = f"res{stage_idx + 2}"
            first_stride = 1 if stage_idx == 0 else 2
            for block_idx in range(num_blocks):
                x = BottleneckBlock(
                    out_channels=out_channels,
                    bottleneck_channels=bottleneck_channels,
                    stride=first_stride if block_idx == 0 else 1,
                    stride_in_1x1=self.stride_in_1x1,
                    dtype=self.dtype,
                    name=f"{name}_block{block_idx}",
                )(x)
            if self.freeze_at >= stage_idx + 2:
                x = jax.lax.stop_gradient(x)
            outputs[name] = x
            out_channels *= 2
            bottleneck_channels *= 2
        return {k: v for k, v in outputs.items() if k in self.out_features}

    @staticmethod
    def output_channels(depth: int, res2_out: int = 256) -> Dict[str, int]:
        return {f"res{i + 2}": res2_out * 2 ** i for i in range(4)}
