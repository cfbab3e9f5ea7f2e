"""Training CLI (reference: src/train_net.py).

Usage:
    python -m pod_compare_tpu.cli.train_net \
        --config-file BDD-Detection/retinanet/retinanet_R_50_FPN_1x_reg_cls_var.yaml \
        --dataset-dir /path/to/bdd --random-seed 0 --resume

The reference's `--num-gpus N` process-spawn becomes `--num-devices N`
selecting the data-parallel mesh size — no launcher, single controller
(SURVEY.md §2.4).
"""

import json
import os

from pod_compare_tpu.config import setup_arg_parser, setup_config
from pod_compare_tpu.train.trainer import Trainer
from pod_compare_tpu.utils.logging import setup_logger


def main(args):
    cfg = setup_config(args, random_seed=args.random_seed)
    logger = setup_logger(name="pod_compare_tpu.train_net")

    if args.eval_only:
        # Eval-only path: run standard-NMS inference + COCO mAP on the test
        # dataset (reference: train_net.py:67-76).
        from pod_compare_tpu.cli.apply_net import run_inference

        test_dataset = args.test_dataset or cfg.DATASETS.TEST[0]
        results = run_inference(
            cfg, test_dataset, "standard_nms_eval", resume=True,
            run_metrics=False, run_map=True,
        )
        logger.info(f"Eval-only results: {json.dumps(results)}")
        return results

    trainer = Trainer(cfg)
    trainer.resume_or_load(resume=args.resume)
    return trainer.train()


if __name__ == "__main__":
    parser = setup_arg_parser()
    args = parser.parse_args()
    print("Command Line Args:", args)
    main(args)
