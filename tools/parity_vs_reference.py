"""One-shot metric-parity harness against the reference implementation
(VERDICT round-1 item #9).

Given a converted COCO-format dataset and a reference `.pth`/`.pkl`
checkpoint, runs convert → inference → ALL offline metrics for every
inference mode and emits a side-by-side report. When a JSON of the
reference stack's numbers is provided (produced by running the reference's
apply_net + offline_evaluation on the same data,
reference: README.md:99-106, apply_net.py:25-106), the report diffs each
metric against the BASELINE.md bar (mAP and NLL within 0.5%).

Usage:
    python tools/parity_vs_reference.py \
        --dataset-dir /data/bdd --test-dataset bdd_val \
        --config-file BDD-Detection/retinanet/retinanet_R_50_FPN_1x_reg_cls_var_dropout.yaml \
        --weights /ckpts/retinanet_reg_cls_var_dropout.pth \
        [--modes standard_nms bayes_od ...] \
        [--reference-report ref_numbers.json] [--batch-size 8]

reference_report format: {"<inference_config_stem>": {"mAP": float,
"tp_cls_ignorance": float, "tp_reg_ignorance": float, ...}, ...}
"""

import argparse
import json
import os
import sys

import numpy as np

from pod_compare_tpu import configs_dir
from pod_compare_tpu.config import setup_arg_parser, setup_config
from pod_compare_tpu.models import build_model, init_model_params
from pod_compare_tpu.train.torch_convert import (
    convert_torch_state_dict,
    load_reference_checkpoint,
    merge_into_params,
)
from pod_compare_tpu.utils import Table, enable_persistent_cache

ALL_MODES = (
    "standard_nms",
    "anchor_statistics",
    "bayes_od",
    "bayes_od_mc_dropout",
    "mc_dropout_ensembles_pre_nms",
    "mc_dropout_ensembles_post_nms",
    "ensembles_pre_nms",
    "ensembles_post_nms",
)
PARITY_BAR = 0.005  # BASELINE.md: mAP and NLL within 0.5%


def convert_weights(cfg, weights_path, image_size):
    model = build_model(cfg)
    params = init_model_params(model, image_size, seed=0)
    state = load_reference_checkpoint(weights_path)
    return merge_into_params(params, convert_torch_state_dict(state))


def flatten_summary(summary):
    """Pick the comparable scalars out of a run_inference summary."""
    out = {}
    if "mAP" in summary:
        out["mAP"] = float(summary["mAP"])
    for k, v in summary.get("probabilistic_metrics", {}).items():
        if isinstance(v, (int, float)):
            out[k] = float(v)
    for k, v in summary.get("calibration_errors", {}).items():
        if isinstance(v, (int, float)):
            out[k] = float(v)
    return out


def main(argv=None):
    parser = setup_arg_parser()
    parser.add_argument("--weights", required=True,
                        help="reference .pth/.pkl checkpoint to convert")
    parser.add_argument("--modes", nargs="*", default=list(ALL_MODES),
                        help="inference-config stems under configs/Inference")
    parser.add_argument("--reference-report", default=None,
                        help="JSON of reference-stack numbers to diff against")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--output", default=None,
                        help="where to write the parity JSON "
                             "(default <OUTPUT_DIR>/parity_report.json)")
    args = parser.parse_args(argv)

    enable_persistent_cache()
    from pod_compare_tpu.cli.apply_net import run_inference
    from pod_compare_tpu.data.loader import TestLoader

    reference = {}
    if args.reference_report:
        with open(args.reference_report) as f:
            reference = json.load(f)

    report = {}
    params = None
    last_output_dir = "."
    for mode in args.modes:
        inference_config = os.path.join("Inference", f"{mode}.yaml")
        if not os.path.isfile(os.path.join(configs_dir(), inference_config)):
            print(f"[parity] skipping unknown inference config: {mode}")
            continue
        args.inference_config = inference_config
        cfg = setup_config(args, random_seed=args.random_seed, is_testing=True)
        test_dataset = args.test_dataset or cfg.DATASETS.TEST[0]
        last_output_dir = cfg.OUTPUT_DIR

        if cfg.PROBABILISTIC_INFERENCE.INFERENCE_MODE == "ensembles":
            # independently-trained members come from seed-sibling dirs
            # (probabilistic_inference.py:59-77) — needs trained local
            # checkpoints rather than the single reference .pth
            print(f"[parity] {mode}: ensembles need seed-sibling "
                  f"checkpoints under {cfg.OUTPUT_DIR}; skipping unless "
                  f"they exist")
            params_kw = {}
        else:
            if params is None:
                from pod_compare_tpu.data.datasets import get_dataset

                loader = TestLoader(
                    get_dataset(test_dataset),
                    batch_size=args.batch_size,
                    min_size=cfg.INPUT.MIN_SIZE_TEST,
                    max_size=cfg.INPUT.MAX_SIZE_TEST,
                    divisibility=cfg.INPUT.SIZE_DIVISIBILITY,
                )
                params = convert_weights(cfg, args.weights, loader.canvas)
            params_kw = {"params": params}

        try:
            summary = run_inference(
                cfg, test_dataset, mode, batch_size=args.batch_size,
                verbose=False, **params_kw,
            )
        except Exception as exc:  # keep going; report the failure
            report[mode] = {"error": str(exc)}
            print(f"[parity] {mode} FAILED: {exc}")
            continue
        report[mode] = flatten_summary(summary)
        print(f"[parity] {mode}: " + json.dumps(report[mode]))

    # ---------------------------------------------------------- side-by-side
    rows, worst = [], 0.0
    for mode, ours in report.items():
        ref = reference.get(mode, {})
        for key, val in ours.items():
            if key == "error":
                continue
            ref_val = ref.get(key)
            if ref_val is None:
                rows.append([mode, key, f"{val:.4f}", "-", "-", ""])
                continue
            rel = abs(val - ref_val) / max(abs(ref_val), 1e-9)
            ok = rel <= PARITY_BAR
            flag = "OK" if ok else "DIVERGED"
            if key in ("mAP", "tp_cls_ignorance", "tp_reg_ignorance"):
                worst = max(worst, rel)
            rows.append(
                [mode, key, f"{val:.4f}", f"{ref_val:.4f}", f"{rel:.2%}", flag]
            )
    table = Table(["Mode", "Metric", "Ours", "Reference", "Δrel", ""])
    for row in rows:
        table.add_row(row)
    print(table)
    if reference:
        verdict = "PASS" if worst <= PARITY_BAR else "FAIL"
        print(f"[parity] headline (mAP/NLL) worst rel delta: {worst:.2%} "
              f"-> {verdict} (bar {PARITY_BAR:.1%})")

    out_path = args.output or os.path.join(last_output_dir, "parity_report.json")
    with open(out_path, "w") as f:
        json.dump({"ours": report, "reference": reference}, f, indent=2)
    print(f"[parity] report written to {out_path}")
    return report


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
