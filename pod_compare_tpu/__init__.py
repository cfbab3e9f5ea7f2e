"""pod_compare_tpu: TPU-native probabilistic object detection framework.

A from-scratch JAX/XLA/Flax/Pallas rebuild of the capabilities of
asharakeh/pod_compare (arXiv 2011.10671): probabilistic RetinaNet-R50-FPN
training (loss attenuation + NLL box covariance, MC-dropout) and seven
probabilistic inference/fusion strategies, evaluated with mAP, proper scoring
rules, calibration errors and minimum uncertainty error.

Unlike the PyTorch/Detectron2 reference, every compute-path component is
designed TPU-first: static shapes with validity masks, vmapped stochastic
sampling axes, `pjit` data parallelism over a device mesh and XLA-fused
postprocessing that never leaves the device.
"""

__version__ = "0.1.0"

import os


def top_dir() -> str:
    """Repository top directory (reference: src/core/__init__.py:4-13)."""
    return os.path.dirname(os.path.dirname(os.path.realpath(__file__)))


def data_dir() -> str:
    """Experiment/data output directory (reference: src/core/__init__.py:16-21)."""
    return os.environ.get("POD_COMPARE_DATA_DIR", os.path.join(top_dir(), "data"))


def configs_dir() -> str:
    """Bundled configs directory (reference: src/core/__init__.py:24-29)."""
    return os.path.join(top_dir(), "configs")
