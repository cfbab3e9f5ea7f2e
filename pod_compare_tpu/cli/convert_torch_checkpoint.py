"""CLI: convert a reference torch/detectron2 checkpoint into an orbax
checkpoint loadable by this framework.

Usage:
    python -m pod_compare_tpu.cli.convert_torch_checkpoint \
        --checkpoint /path/to/model_final.pth \
        --config-file BDD-Detection/retinanet/retinanet_R_50_FPN_1x_reg_cls_var.yaml \
        --random-seed 0 [--image-size 736 1280]

Writes step-0 params into the config's OUTPUT_DIR checkpoint directory so
`apply_net`/`train_net --resume` pick them up (the reference's
`MODEL.WEIGHTS` warm-start path, Base-BDD-RetinaNet.yaml:6).
"""

from pod_compare_tpu.config import setup_arg_parser, setup_config
from pod_compare_tpu.models import build_model, init_model_params
from pod_compare_tpu.train.checkpoint import Checkpointer
from pod_compare_tpu.train.torch_convert import (
    convert_torch_state_dict,
    load_reference_checkpoint,
    merge_into_params,
)


def main(args):
    cfg = setup_config(args, random_seed=args.random_seed)
    model = build_model(cfg)
    params = init_model_params(model, tuple(args.image_size), seed=max(cfg.SEED, 0))

    state = load_reference_checkpoint(args.checkpoint)
    converted = convert_torch_state_dict(state)
    params = merge_into_params(params, converted)

    ckpt = Checkpointer(cfg.OUTPUT_DIR)
    ckpt.save(0, {"params": params}, force=True)
    ckpt.wait()
    ckpt.close()
    print(f"Converted {args.checkpoint} -> {cfg.OUTPUT_DIR}/checkpoints/0")


if __name__ == "__main__":
    parser = setup_arg_parser()
    parser.add_argument("--checkpoint", required=True, type=str)
    parser.add_argument("--image-size", nargs=2, type=int, default=[736, 1280])
    main(parser.parse_args())
