"""Device-side image preprocessing (jittable resize + pad).

The training/eval loaders resize on host (cv2) because source resolutions
vary; this module provides the fully-fused serving path from the BASELINE
north star ("image preprocessing fuses into the XLA graph"): a raw
fixed-resolution camera image goes to the device once and resize →
normalize → pad all run inside the jitted program.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from pod_compare_tpu.data.loader import resize_shortest_edge


@partial(jax.jit, static_argnames=("source_size", "min_size", "max_size",
                                   "canvas", "antialias"))
def resize_and_pad(
    images: jnp.ndarray,
    source_size: Tuple[int, int],
    min_size: int,
    max_size: int,
    canvas: Tuple[int, int],
    antialias: bool = True,
) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """Resize a batch of raw images with the shortest-edge rule and pad
    onto the static canvas — all on device.

    Args:
        images: (B, H0, W0, 3) raw pixels (BGR, unnormalized — the model
            normalizes in-graph).
        source_size: static (H0, W0).
        canvas: static padded output (H, W).
    Returns:
        (B, H, W, 3) padded batch and the static resized (h, w) — the
        `input_sizes` to hand to the predictor.
    """
    nh, nw = resize_shortest_edge(
        source_size[0], source_size[1], min_size, max_size
    )
    assert nh <= canvas[0] and nw <= canvas[1], (
        f"resized {(nh, nw)} exceeds canvas {canvas}"
    )
    resized = jax.image.resize(
        images,
        (images.shape[0], nh, nw, images.shape[3]),
        method="bilinear",
        antialias=antialias,
    )
    padded = jnp.zeros(
        (images.shape[0], canvas[0], canvas[1], images.shape[3]),
        images.dtype,
    )
    padded = jax.lax.dynamic_update_slice(padded, resized, (0, 0, 0, 0))
    return padded, (nh, nw)
