"""Training CLI (reference: src/train_net.py).

Usage:
    python -m pod_compare_tpu.cli.train_net \
        --config-file BDD-Detection/retinanet/retinanet_R_50_FPN_1x_reg_cls_var.yaml \
        --dataset-dir /path/to/bdd --random-seed 0 --resume

The reference's `--num-gpus N` process-spawn becomes `--num-devices N`
selecting the data-parallel mesh size — no launcher, single controller
(SURVEY.md §2.4). Multi-host runs initialize via
`parallel.mesh.maybe_initialize_distributed()` (env-driven).
"""

import json

from pod_compare_tpu.config import setup_arg_parser, setup_config
from pod_compare_tpu.parallel.mesh import maybe_initialize_distributed
from pod_compare_tpu.train.trainer import Trainer
from pod_compare_tpu.utils.logging import setup_logger


def verify_results(cfg, results, logger) -> bool:
    """Compare results to TEST.EXPECTED_RESULTS entries
    ([metric_key, expected, tolerance]); detectron2 verify_results
    semantics — a no-op when unset, as in the reference's configs
    (reference: train_net.py:73-75)."""
    ok = True
    for key, expected, tolerance in cfg.TEST.EXPECTED_RESULTS:
        actual = results.get(key)
        if actual is None or abs(actual - expected) > tolerance:
            logger.error(
                f"Result verification FAILED: {key}={actual} "
                f"(expected {expected} ± {tolerance})"
            )
            ok = False
        else:
            logger.info(f"Result verification passed: {key}={actual}")
    return ok


def main(args):
    from pod_compare_tpu.utils import enable_persistent_cache

    enable_persistent_cache()
    maybe_initialize_distributed()
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
        verify_results(cfg, results, logger)
        return results

    trainer = Trainer(cfg)
    trainer.resume_or_load(resume=args.resume)
    return trainer.train()


if __name__ == "__main__":
    parser = setup_arg_parser()
    args = parser.parse_args()
    print("Command Line Args:", args)
    main(args)
