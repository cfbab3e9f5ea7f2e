from pod_compare_tpu.config.node import ConfigNode, load_yaml_with_base
from pod_compare_tpu.config.defaults import get_cfg, add_probabilistic_config
from pod_compare_tpu.config.setup import (
    setup_arg_parser,
    setup_config,
    inference_output_dir,
)

__all__ = [
    "ConfigNode",
    "load_yaml_with_base",
    "get_cfg",
    "add_probabilistic_config",
    "setup_arg_parser",
    "setup_config",
    "inference_output_dir",
]
