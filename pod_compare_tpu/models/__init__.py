from pod_compare_tpu.models.retinanet import (
    ProbabilisticRetinaNet,
    ProbabilisticRetinaNetHead,
    build_anchor_generator,
    build_model,
    init_model_params,
    num_params,
)
from pod_compare_tpu.models.resnet import ResNet
from pod_compare_tpu.models.fpn import FPN, FPN_STRIDES

__all__ = [
    "ProbabilisticRetinaNet",
    "ProbabilisticRetinaNetHead",
    "build_anchor_generator",
    "build_model",
    "init_model_params",
    "num_params",
    "ResNet",
    "FPN",
    "FPN_STRIDES",
]
