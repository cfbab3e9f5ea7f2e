"""Shared model layers and initializers (Flax/linen, NHWC, MXU-friendly)."""

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def kaiming_normal_fan_out() -> Callable:
    """MSRA fill used by detectron2 backbones (c2_msra_fill)."""
    return nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


def xavier_fill() -> Callable:
    """Caffe2 Xavier fill used by detectron2's FPN convs (uniform, fan_in)."""
    return nn.initializers.variance_scaling(1.0, "fan_in", "uniform")


class FrozenBatchNorm(nn.Module):
    """BatchNorm with frozen statistics and affine parameters.

    Equivalent of detectron2's FrozenBatchNorm2d, the norm used throughout
    the reference's R-50 backbone (cfg MODEL.RESNETS.NORM='FrozenBN'). All
    four tensors live in params for checkpoint porting but receive zero
    gradient via stop_gradient, so any optimizer leaves them untouched.
    """

    features: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        # Fold into a single multiply-add; constants at trace time.
        mul = scale * jax.lax.rsqrt(var + self.eps)
        add = bias - mean * mul
        mul = jax.lax.stop_gradient(mul).astype(self.dtype)
        add = jax.lax.stop_gradient(add).astype(self.dtype)
        return x * mul + add


def conv3x3(features: int, stride: int = 1, dtype: Dtype = jnp.float32, name=None):
    return nn.Conv(
        features,
        (3, 3),
        strides=(stride, stride),
        padding=[(1, 1), (1, 1)],
        use_bias=False,
        kernel_init=kaiming_normal_fan_out(),
        dtype=dtype,
        name=name,
    )


def conv1x1(features: int, stride: int = 1, dtype: Dtype = jnp.float32, name=None):
    return nn.Conv(
        features,
        (1, 1),
        strides=(stride, stride),
        use_bias=False,
        kernel_init=kaiming_normal_fan_out(),
        dtype=dtype,
        name=name,
    )
