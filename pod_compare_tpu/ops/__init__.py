from pod_compare_tpu.ops import (
    anchors,
    boxes,
    fusion,
    gaussian,
    losses,
    matcher,
    nms,
    quant,
)

__all__ = [
    "anchors",
    "boxes",
    "fusion",
    "gaussian",
    "losses",
    "matcher",
    "nms",
    "quant",
]
