"""Experiment setup: arg parsing, two-file config merge, output-dir layout.

Mirrors the reference's setup flow (reference: src/core/setup.py:22-212):
  * CLI flags: --dataset-dir, --random-seed, --inference-config,
    --test-dataset, --iou-min, --iou-correct, --min-allowed-score
  * config merge order: defaults <- train config (_BASE_ resolved) <-
    inference config
  * output dir: data/<dataset>/<model>/<config>/random_seed_<seed> —
    the seed-sibling layout is semantic: ensemble inference discovers
    sibling checkpoints from it (reference: probabilistic_inference.py:59-77).
"""

import argparse
import os
import random
from shutil import copyfile

import numpy as np

from pod_compare_tpu import configs_dir, data_dir
from pod_compare_tpu.config.defaults import get_cfg
from pod_compare_tpu.config.node import ConfigNode
from pod_compare_tpu.utils.logging import setup_logger


def setup_arg_parser() -> argparse.ArgumentParser:
    """Argument parser shared by all CLIs (reference: setup.py:22-76)."""
    parser = argparse.ArgumentParser(description="pod_compare_tpu")
    parser.add_argument("--config-file", default="", metavar="FILE")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--eval-only", action="store_true")
    parser.add_argument(
        "--num-devices", type=int, default=-1, help="devices on the data-parallel axis"
    )
    parser.add_argument("--dataset-dir", type=str, default="")
    parser.add_argument("--random-seed", type=int, default=0)
    parser.add_argument("--inference-config", type=str, default="")
    parser.add_argument("--test-dataset", type=str, default="")
    parser.add_argument("--iou-min", type=float, default=0.1)
    parser.add_argument("--iou-correct", type=float, default=0.7)
    parser.add_argument("--min-allowed-score", type=float, default=0.0)
    parser.add_argument(
        "opts",
        default=None,
        nargs=argparse.REMAINDER,
        help="config overrides: KEY VALUE pairs",
    )
    return parser


def setup_config(args, random_seed=None, is_testing=False) -> ConfigNode:
    """Build the frozen experiment config (reference: setup.py:136-212)."""
    cfg = get_cfg()

    config_file = args.config_file
    if not os.path.isabs(config_file) and not os.path.isfile(config_file):
        config_file = os.path.join(configs_dir(), args.config_file)
    cfg.merge_from_file(config_file)

    inference_config = getattr(args, "inference_config", "")
    if inference_config:
        if not os.path.isabs(inference_config) and not os.path.isfile(inference_config):
            inference_config = os.path.join(configs_dir(), inference_config)
        cfg.merge_from_file(inference_config)

    if getattr(args, "opts", None):
        cfg.merge_from_list(args.opts)

    # Output dir layout: data/<dataset>/<model>/<config>/random_seed_<seed>
    model_name = os.path.basename(os.path.dirname(config_file))
    dataset_name = os.path.basename(os.path.dirname(os.path.dirname(config_file)))
    cfg.OUTPUT_DIR = os.path.join(
        data_dir(),
        dataset_name,
        model_name,
        os.path.splitext(os.path.basename(config_file))[0],
        "random_seed_" + str(random_seed),
    )
    if is_testing and not os.path.isdir(cfg.OUTPUT_DIR):
        raise NotADirectoryError(
            f"Checkpoint directory {cfg.OUTPUT_DIR} does not exist."
        )
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    copyfile(
        config_file, os.path.join(cfg.OUTPUT_DIR, os.path.basename(config_file))
    )

    cfg.SEED = random_seed if random_seed is not None else -1
    if getattr(args, "num_devices", -1) != -1:
        cfg.PARALLEL.NUM_DEVICES = args.num_devices
    cfg.freeze()

    setup_logger(output=cfg.OUTPUT_DIR)

    # Seed host-side RNGs; device-side randomness is explicit jax PRNG keys
    # threaded from cfg.SEED (reference seeds torch/numpy/random,
    # setup.py:204-207).
    if random_seed is not None:
        np.random.seed(random_seed)
        random.seed(random_seed)

    # Register datasets (reference: setup.py:209-211).
    from pod_compare_tpu.data.datasets import setup_all_datasets

    dataset_dir = os.path.expanduser(getattr(args, "dataset_dir", "") or "")
    if dataset_dir:
        setup_all_datasets(dataset_dir)
    return cfg


def inference_output_dir(cfg, test_dataset: str, inference_config: str) -> str:
    """Inference artifact directory (reference: apply_net.py:42-47)."""
    name = os.path.splitext(os.path.basename(inference_config))[0]
    return os.path.join(cfg.OUTPUT_DIR, "inference", test_dataset, name)
