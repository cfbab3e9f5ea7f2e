"""One-command reference-parity report (VERDICT r4 #6).

The project's north star is mAP/NLL/calibration within 0.5% of the
PyTorch reference on real BDD val with the reference's own trained
weights (BASELINE.json). The real dataset and checkpoints don't exist in
this environment, so this runbook packages everything needed to produce
the side-by-side table THE DAY they do:

    python tools/parity_report.py \
        --config-file BDD-Detection/retinanet/retinanet_R_50_FPN_1x_reg_cls_var.yaml \
        --inference-config Inference/bayes_od.yaml \
        --test-dataset bdd_val --dataset-dir ~/bdd100k --random-seed 0 \
        --reference-checkpoint /path/to/model_final.pth \
        --reference-predictions /path/to/ref/inference/.../coco_instances_results.json \
        --output parity_report.md

Flow (reference counterpart: apply_net.py:104-106 +
compute_average_precision.py:16-68 + the two offline metric modules):
  1. convert the reference torch/detectron2 checkpoint to our params
     (train/torch_convert.py — block-level parity-tested);
  2. run THIS framework's inference + full metric suite on the test set;
  3. score the REFERENCE's dumped predictions (its
     coco_instances_results.json has the same schema, inference_utils.py
     instances_to_json) with the SAME first-party metric suite — both
     columns go through identical scoring code, so the comparison
     isolates the inference stacks;
  4. emit a markdown table with absolute/relative deltas and a pass/fail
     against the 0.5% relative band (mAP + NLL rows).

Alternatively pass --reference-metrics ref.json (flat {metric: value},
e.g. transcribed from the reference paper/logs) to fill the reference
column without its prediction dump.

A CI dry run of this whole path (synthetic dataset + a
converter-roundtripped checkpoint, where both columns must agree to
float tolerance) lives in tests/test_parity_report.py.
"""

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.append(".")


# Rows: (key, source, pretty name, in the 0.5% pass/fail band?)
METRICS = [
    ("mAP", "map", "mAP", True),
    ("AP50", "map", "AP50", True),
    ("tp_cls_ignorance", "prob", "TP cls NLL (ignorance)", True),
    ("tp_reg_ignorance", "prob", "TP reg NLL (ignorance)", True),
    ("fp_cls_ignorance", "prob", "FP cls NLL (ignorance)", False),
    ("fp_reg_entropy", "prob", "FP reg entropy", False),
    ("cls_marginal_calibration_error", "cal", "Cls marginal calibration", False),
    ("reg_expected_calibration_error", "cal", "Reg expected calibration", False),
    ("cls_min_uncertainty_error", "cal", "Cls MUE", False),
    ("reg_min_uncertainty_error", "cal", "Reg MUE", False),
]
PASS_BAND = 0.005  # 0.5% relative (BASELINE.md north star)


def evaluate_prediction_dir(inf_dir, test_dataset, train_dataset,
                            verbose=False):
    """Run the full first-party metric suite over a directory containing
    coco_instances_results.json; returns a flat {metric: value} dict."""
    from pod_compare_tpu.evaluation.average_precision import (
        evaluate_average_precision,
    )
    from pod_compare_tpu.evaluation.calibration_errors import (
        evaluate_calibration_errors,
    )
    from pod_compare_tpu.evaluation.probabilistic_metrics import (
        evaluate_probabilistic_metrics,
    )

    stats, _ = evaluate_average_precision(inf_dir, test_dataset, verbose=verbose)
    out = {"mAP": float(stats[0]), "AP50": float(stats[1])}
    out.update(
        evaluate_probabilistic_metrics(
            inf_dir, test_dataset, train_dataset, verbose=verbose
        )
    )
    out.update(
        evaluate_calibration_errors(
            inf_dir, test_dataset, train_dataset, verbose=verbose
        )
    )
    return out


def convert_reference_params(cfg, checkpoint_path):
    """Reference torch/detectron2 checkpoint -> our parameter pytree."""
    import jax

    from pod_compare_tpu.models import build_model, init_model_params
    from pod_compare_tpu.train.torch_convert import (
        convert_torch_state_dict,
        load_reference_checkpoint,
        merge_into_params,
    )

    model = build_model(cfg)
    # Structure-only init: conv/bias shapes are input-size independent.
    params = init_model_params(model, (64, 64), seed=max(cfg.SEED, 0))
    converted = convert_torch_state_dict(
        load_reference_checkpoint(checkpoint_path)
    )
    return merge_into_params(jax.device_get(params), converted)


def render_report(ours, reference, ref_source):
    lines = [
        "# Reference parity report",
        "",
        f"Reference column: {ref_source}. Both columns scored by the",
        "same first-party metric suite (evaluation/).",
        "",
        "| metric | reference | this framework | Δ | Δ% | band |",
        "|---|---|---|---|---|---|",
    ]
    worst = 0.0
    failed = []
    for key, _, pretty, banded in METRICS:
        a = reference.get(key) if reference else None
        b = ours.get(key)
        if b is None and a is None:
            continue
        if a is None or b is None or not all(
            isinstance(v, (int, float)) for v in (a, b)
        ):
            lines.append(
                f"| {pretty} | {a if a is not None else '—'} | "
                f"{b if b is not None else '—'} | — | — | — |"
            )
            continue
        import math

        if not (math.isfinite(a) and math.isfinite(b)):
            # A NaN on one side only is a real disagreement; NaN on both
            # (e.g. no matched TPs in either stack) is agreement.
            same = (math.isnan(a) and math.isnan(b)) or a == b
            status = (
                ("PASS" if same else "FAIL") if banded else "report-only"
            )
            if banded and not same:
                failed.append(pretty)
            lines.append(
                f"| {pretty} | {a} | {b} | — | — | {status} |"
            )
            continue
        delta = b - a
        rel = abs(delta) / max(abs(a), 1e-12)
        if banded:
            worst = max(worst, rel)
            status = "PASS" if rel <= PASS_BAND else "FAIL"
            if status == "FAIL":
                failed.append(pretty)
        else:
            status = "report-only"
        lines.append(
            f"| {pretty} | {a:.4f} | {b:.4f} | {delta:+.4f} | "
            f"{100 * rel:.2f}% | {status} |"
        )
    lines.append("")
    if reference:
        lines.append(
            f"**Verdict:** {'PASS' if not failed else 'FAIL'} — worst banded "
            f"relative delta {100 * worst:.2f}% vs the {100 * PASS_BAND:.1f}% "
            f"band{'' if not failed else ' (failing: ' + ', '.join(failed) + ')'}."
        )
    else:
        lines.append(
            "**Verdict:** no reference column provided — table reports this "
            "framework's metrics only; pass --reference-predictions or "
            "--reference-metrics for the side-by-side."
        )
    return "\n".join(lines) + "\n"


def main(argv=None):
    from pod_compare_tpu.config import setup_arg_parser, setup_config

    parser = setup_arg_parser()
    parser.add_argument("--reference-checkpoint", default=None,
                        help="reference .pth/.pkl to convert and evaluate; "
                        "omit to use the checkpoint in OUTPUT_DIR")
    parser.add_argument("--reference-predictions", default=None,
                        help="reference coco_instances_results.json to score "
                        "with the same metric suite")
    parser.add_argument("--reference-metrics", default=None,
                        help="flat {metric: value} json for the reference "
                        "column (alternative to --reference-predictions)")
    parser.add_argument("--output", default="parity_report.md")
    parser.add_argument("--batch-size", default=8)
    args = parser.parse_args(argv)
    cfg = setup_config(args, is_testing=True)

    from pod_compare_tpu.cli.apply_net import run_inference

    params = None
    if args.reference_checkpoint:
        params = convert_reference_params(cfg, args.reference_checkpoint)

    test_dataset = args.test_dataset or cfg.DATASETS.TEST[0]
    train_dataset = cfg.DATASETS.TRAIN[0]
    try:
        batch_size = int(args.batch_size)
    except (TypeError, ValueError):
        batch_size = args.batch_size  # 'auto'
    summary = run_inference(
        cfg, test_dataset, "parity_report", batch_size=batch_size,
        run_metrics=True, run_map=True, params=params, verbose=False,
    )
    ours = {"mAP": summary.get("mAP"), "AP50": summary.get("AP50")}
    ours.update(summary.get("probabilistic_metrics", {}))
    ours.update(summary.get("calibration_errors", {}))

    reference, ref_source = None, "none"
    if args.reference_predictions:
        ref_dir = tempfile.mkdtemp(prefix="parity_ref_")
        try:
            shutil.copyfile(
                args.reference_predictions,
                os.path.join(ref_dir, "coco_instances_results.json"),
            )
            reference = evaluate_prediction_dir(
                ref_dir, test_dataset, train_dataset
            )
        finally:
            shutil.rmtree(ref_dir, ignore_errors=True)
        ref_source = (
            f"predictions at {args.reference_predictions}, re-scored here"
        )
    elif args.reference_metrics:
        with open(args.reference_metrics) as f:
            reference = json.load(f)
        ref_source = f"metric values from {args.reference_metrics}"

    report = render_report(ours, reference, ref_source)
    with open(args.output, "w") as f:
        f.write(report)
    print(report)
    print(f"[parity_report] written to {args.output}", file=sys.stderr)
    return 0 if ("FAIL" not in report.split("**Verdict:**")[-1]) else 1


if __name__ == "__main__":
    sys.exit(main())
