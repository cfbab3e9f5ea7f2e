from pod_compare_tpu.inference.core import (
    Candidates,
    Detections,
    probabilistic_inference_core,
)
from pod_compare_tpu.inference.postprocess import (
    detections_to_json,
    detector_postprocess,
)
from pod_compare_tpu.inference.export import (
    load_artifact,
    save_artifact,
)
from pod_compare_tpu.inference.predictor import (
    ProbabilisticPredictor,
    build_predictor,
)

__all__ = [
    "load_artifact",
    "save_artifact",
    "Candidates",
    "Detections",
    "probabilistic_inference_core",
    "detections_to_json",
    "detector_postprocess",
    "ProbabilisticPredictor",
    "build_predictor",
]
