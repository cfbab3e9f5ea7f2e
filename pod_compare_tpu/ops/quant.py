"""Int8 post-training quantization for the inference head towers.

The MC-dropout head bank is conv-roofline-bound in bfloat16 (DESIGN.md §5:
10 head passes at batch 16 run at ~89% of the chip's measured 122 TFLOP/s
bf16 conv ceiling), so the only remaining throughput lever is a cheaper
number format. The v5e MXU runs int8 at ~2x the bf16 rate (measured on this
chip: 206 TOP/s vs 121 TFLOP/s for the P3 head-tower conv shape), and the
end-to-end quantized tower — dequantize + ReLU + dropout-mask + requantize
fused between convs — measures ~1.2-1.3x the bf16 tower.

This is a deliberate EXCEED-the-reference serving feature with a knob
(`PROBABILISTIC_INFERENCE.HEAD_QUANT: none|int8`); the reference
(src/probabilistic_inference/probabilistic_inference.py) has no quantized
path and the default here stays full-precision. Scheme:

  * weights: symmetric per-output-channel int8
    (scale_w[oc] = max|K[:, :, :, oc]| / 127), quantized inside the jit —
    loop-invariant, so XLA hoists it out of the MC-sample vmap.
  * activations: dynamic symmetric per-IMAGE scale
    (max over H, W, C — NOT over the batch, so one image's outlier cannot
    degrade another image's quantization; the reference's deployment mode
    is batch-1, apply_net.py:31-35). Post-ReLU tower activations are
    non-negative, so their scale uses max(x) over [0, 127]; only the first
    tower conv sees signed FPN features and uses max|x|.
  * accumulation in int32 on the MXU (`preferred_element_type`), dequantized
    with scale_x * scale_w and the float bias added back.

No clamps are emitted: with dynamic scales |x|/scale <= 127 by
construction, and a fused `clip` on the conv operand measurably breaks
Mosaic codegen (56 vs 200 TOP/s — see DESIGN.md §5c).
"""

from typing import Tuple

import jax.numpy as jnp
from jax import lax

_EPS = 1e-12


def quantize_weight_per_channel(
    kernel: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8 quantization of an HWIO kernel.

    Returns (kernel_int8, scale[out_channels]) with
    kernel ≈ kernel_int8 * scale.
    """
    k = kernel.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(k), axis=(0, 1, 2)) / 127.0, _EPS)
    return jnp.round(k / scale).astype(jnp.int8), scale


def quantize_act_per_image(
    x: jnp.ndarray, signed: bool
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic symmetric int8 quantization of (B, H, W, C) activations.

    One scale per image (reduction over H, W, C). `signed=False` is for
    post-ReLU tensors (x >= 0): same [0, 127] code range, one fewer
    abs-pass. Returns (x_int8, scale[B, 1, 1, 1]).
    """
    xf = x.astype(jnp.float32)
    mag = jnp.abs(xf) if signed else xf
    scale = jnp.maximum(
        jnp.max(mag, axis=(1, 2, 3), keepdims=True) / 127.0, _EPS
    )
    return jnp.round(xf / scale).astype(jnp.int8), scale


def quantized_conv3x3(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    act_signed: bool = True,
) -> jnp.ndarray:
    """3x3 SAME int8 conv: quantize x and kernel, int32 MXU accumulation,
    dequantize and add the float bias. Returns float32 (B, H, W, Co)."""
    k8, sw = quantize_weight_per_channel(kernel)
    x8, sx = quantize_act_per_image(x, signed=act_signed)
    y = lax.conv_general_dilated(
        x8,
        k8,
        (1, 1),
        [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * (sx * sw) + bias.astype(jnp.float32)
