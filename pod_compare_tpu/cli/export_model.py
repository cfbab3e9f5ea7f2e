"""Export a trained model + inference config to an AOT serving artifact.

Usage:
    python -m pod_compare_tpu.cli.export_model \
        --config-file BDD-Detection/retinanet/retinanet_R_50_FPN_1x_reg_cls_var.yaml \
        --inference-config Inference/bayes_od.yaml \
        --random-seed 0 --batch-size 8 --platforms tpu,cpu \
        --output-dir /path/to/artifact

The artifact directory is self-contained (StableHLO pipeline + params +
manifest) and served with `pod_compare_tpu.inference.export.load_artifact`
— no configs or model code needed on the serving host. The reference has
no export path at all (its deployment mode re-runs the research stack,
apply_net.py:25-124).
"""

import argparse
import os

from pod_compare_tpu.config import setup_arg_parser, setup_config
from pod_compare_tpu.inference.export import save_artifact
from pod_compare_tpu.inference.predictor import build_predictor
from pod_compare_tpu.utils.logging import setup_logger


def main(args):
    logger = setup_logger(name="pod_compare_tpu.export_model")
    # --random-init exports fresh weights (smoke/CI), so no checkpoint
    # directory needs to exist in that case.
    cfg = setup_config(
        args, random_seed=args.random_seed, is_testing=not args.random_init
    )
    canvas = (
        int(args.canvas_height) if args.canvas_height else None,
        int(args.canvas_width) if args.canvas_width else None,
    )
    if canvas[0] is None or canvas[1] is None:
        # Default: shortest-edge test size on a BDD-ratio (720x1280) frame,
        # padded to SIZE_DIVISIBILITY — the same static canvas TestLoader
        # derives for BDD-geometry datasets.
        short = int(cfg.INPUT.MIN_SIZE_TEST)
        div = int(cfg.INPUT.SIZE_DIVISIBILITY)
        h = -(-short // div) * div
        w = -(-(short * 16 // 9) // div) * div
        canvas = (h, w)
    if args.random_init:
        from pod_compare_tpu.models import build_model, init_model_params

        model = build_model(cfg)
        params = init_model_params(model, canvas, seed=max(cfg.SEED, 0))
        params_list = None
    else:
        from pod_compare_tpu.cli.apply_net import load_predictor_params

        params, params_list = load_predictor_params(cfg)
    predictor = build_predictor(cfg, canvas, params, params_list)

    out_dir = args.output_dir or os.path.join(
        cfg.OUTPUT_DIR, "serving",
        os.path.splitext(os.path.basename(args.inference_config))[0],
    )
    platforms = [p for p in args.platforms.split(",") if p]
    save_artifact(
        predictor, out_dir, batch_size=args.batch_size,
        platforms=platforms or None,
        extra_manifest={"train_config": args.config_file,
                        "inference_config": args.inference_config},
    )
    logger.info(f"serving artifact written to {out_dir}")
    return out_dir


if __name__ == "__main__":
    parser = setup_arg_parser()
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument(
        "--platforms", type=str, default="tpu,cpu",
        help="comma-separated lowering platforms baked into the artifact",
    )
    parser.add_argument("--output-dir", type=str, default="")
    parser.add_argument("--canvas-height", type=int, default=0)
    parser.add_argument("--canvas-width", type=int, default=0)
    parser.add_argument(
        "--random-init", action="store_true",
        help="export randomly initialized weights (smoke tests)",
    )
    main(parser.parse_args())
