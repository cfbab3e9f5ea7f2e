"""Probabilistic inference CLI (reference: src/apply_net.py).

Usage:
    python -m pod_compare_tpu.cli.apply_net \
        --config-file BDD-Detection/retinanet/retinanet_R_50_FPN_1x_reg_cls_var.yaml \
        --inference-config Inference/bayes_od.yaml \
        --test-dataset bdd_val --dataset-dir /path/to/bdd --random-seed 0

Differences from the reference (all TPU-motivated, SURVEY.md §2.3): the
reference pins inference to batch=1 on one GPU to "simulate deployment"
(apply_net.py:31-35); here inference is batched and fully device-resident,
with `--batch-size` (images/sec/chip is the bench metric either way).
"""

import json
import os
import time

import jax
import numpy as np

from pod_compare_tpu.config import setup_arg_parser, setup_config
from pod_compare_tpu.data.datasets import get_dataset
from pod_compare_tpu.data.loader import TestLoader
from pod_compare_tpu.evaluation.average_precision import (
    evaluate_average_precision,
    read_optimal_score_threshold,
)
from pod_compare_tpu.evaluation.calibration_errors import evaluate_calibration_errors
from pod_compare_tpu.evaluation.category_mapping import model_to_dataset_id_map
from pod_compare_tpu.evaluation.probabilistic_metrics import (
    evaluate_probabilistic_metrics,
)
from pod_compare_tpu.inference.core import Detections
from pod_compare_tpu.inference.postprocess import detections_to_json
from pod_compare_tpu.inference.predictor import build_predictor
from pod_compare_tpu.train.checkpoint import load_ensemble_params, load_params
from pod_compare_tpu.utils.logging import setup_logger


def load_predictor_params(cfg):
    """Load single-model or seed-sibling ensemble parameters
    (reference: probabilistic_inference.py:44-84)."""
    if cfg.PROBABILISTIC_INFERENCE.INFERENCE_MODE == "ensembles":
        seeds = cfg.PROBABILISTIC_INFERENCE.ENSEMBLES.RANDOM_SEED_NUMS
        return None, load_ensemble_params(cfg.OUTPUT_DIR, seeds, None)
    return load_params(cfg.OUTPUT_DIR), None


def run_inference(
    cfg,
    test_dataset: str,
    inference_name: str,
    batch_size: int = 8,
    resume: bool = True,
    run_metrics: bool = True,
    run_map: bool = True,
    params=None,
    params_list=None,
    verbose: bool = True,
    mesh=None,
    profile: bool = False,
    min_allowed_score=None,
    loader=None,
    predictor=None,
    run_pdq: bool = False,
):
    """Run the full inference + evaluation pipeline; returns a summary dict.

    `loader`/`predictor` may be passed in to reuse an already-built (and
    already-jitted) pipeline across calls — Trainer.test() does this every
    EVAL_PERIOD so periodic eval doesn't re-trace (VERDICT r2 weak #7)."""
    logger = setup_logger(name="pod_compare_tpu.apply_net")
    inference_output_dir = os.path.join(
        cfg.OUTPUT_DIR, "inference", test_dataset, inference_name
    )
    os.makedirs(inference_output_dir, exist_ok=True)

    # Multi-host evaluation (reference: COCOEvaluator rank gather,
    # SURVEY.md §2.4): each process runs its strided shard of the test set
    # on its local devices; JSON results are gathered afterwards and the
    # main process runs the metric suite.
    # batch_size='auto' (or 0): compile-probe descending batch sizes with
    # the peak-HBM guard and run at the largest that fits the chip — the
    # guard compiles only, so an oversized candidate costs one compile,
    # never a worker-crashing runtime OOM.
    auto_batch = batch_size in ("auto", 0, None)
    process_count = jax.process_count()
    if loader is None:
        dataset = get_dataset(test_dataset)
        loader = TestLoader(
            dataset,
            batch_size=1 if auto_batch else batch_size,
            min_size=cfg.INPUT.MIN_SIZE_TEST,
            max_size=cfg.INPUT.MAX_SIZE_TEST,
            divisibility=cfg.INPUT.SIZE_DIVISIBILITY,
            num_workers=cfg.DATALOADER.NUM_WORKERS,
            process_index=jax.process_index(),
            process_count=process_count,
            worker_backend=cfg.DATALOADER.WORKER_BACKEND,
        )
    canvas = loader.canvas

    if predictor is None:
        if params is None and params_list is None:
            params, params_list = load_predictor_params(cfg)
        if mesh is None and cfg.PARALLEL.NUM_DEVICES not in (-1, 1):
            from pod_compare_tpu.parallel.mesh import create_mesh

            mesh = create_mesh(cfg.PARALLEL.NUM_DEVICES)
        predictor = build_predictor(cfg, canvas, params, params_list, mesh=mesh)

    if auto_batch:
        from pod_compare_tpu.utils.hbm_guard import (
            pick_max_batch_programs,
            predictor_programs,
            runtime_safe_batch_cap,
        )

        # mc_iid pipelines fault the v5e worker at batches whose
        # compile-time peak is WELL under budget (hbm_guard.py:
        # MC_IID_PROVEN_SAFE_BATCH) — cap the candidates at the largest
        # empirically validated batch for that family (higher with
        # SPLIT_HEAD_PROGRAM, the validated fault workaround).
        cap = runtime_safe_batch_cap(cfg)
        batch_candidates = (32, 24, 16, 8, 4, 2, 1)
        if cap is not None:
            batch_candidates = tuple(
                b for b in batch_candidates if b <= cap
            )
            logger.info(
                f"auto batch: mc_iid sampling caps candidates at {cap} "
                "(runtime-fault boundary, utils/hbm_guard.py)"
            )

        chosen, _ = pick_max_batch_programs(
            lambda b: predictor_programs(predictor, b, canvas),
            batch_candidates,
            name=f"{inference_name}_auto",
            log=lambda m: logger.info(m),
        )
        if chosen is None:
            raise RuntimeError(
                "no candidate batch size fits the HBM budget "
                "(utils/hbm_guard.py) — reduce the canvas or model"
            )
        loader.batch_size = chosen
        logger.info(f"auto batch size: {chosen}")

    train_dataset = cfg.DATASETS.TRAIN[0]
    cat_mapping = model_to_dataset_id_map(train_dataset, test_dataset)

    from pod_compare_tpu.utils.profiling import trace

    rng = jax.random.PRNGKey(max(cfg.SEED, 0))
    results = []
    num_images = 0
    start = time.time()
    profile_ctx = trace(inference_output_dir, enabled=profile)
    profile_ctx.__enter__()
    def drain(pending):
        """Host-side fetch + COCO-json conversion for one finished batch."""
        nonlocal num_images
        dets, batch = pending
        dets_np = jax.tree_util.tree_map(np.asarray, dets)
        for b in range(batch["images"].shape[0]):
            if not batch["batch_valid"][b]:
                continue
            per_image = Detections(
                *[None if f is None else f[b] for f in dets_np]
            )
            results.extend(
                detections_to_json(
                    per_image, int(batch["image_ids"][b]), cat_mapping
                )
            )
            num_images += 1

    # Two overlaps keep the device busy (VERDICT r4 #5):
    #   * DevicePrefetcher moves batch i+1's arrays host→device on a
    #     background thread while batch i computes (double-buffered H2D —
    #     the tunnel/PCIe copy no longer serializes with compute);
    #   * one batch in flight: dispatch batch i+1 (async under jit), then
    #     do batch i's host fetch + JSON conversion while the device
    #     computes.
    from pod_compare_tpu.data.loader import DevicePrefetcher

    batch_sharding = None
    if getattr(predictor, "mesh", None) is not None:
        from pod_compare_tpu.parallel.mesh import data_sharding

        batch_sharding = data_sharding(predictor.mesh)
    prefetcher = (
        DevicePrefetcher(loader, sharding=batch_sharding)
        if cfg.DATALOADER.H2D_OVERLAP
        else None
    )
    feed = prefetcher if prefetcher is not None else iter(loader)
    try:
        pending = None
        for batch in feed:
            rng, key = jax.random.split(rng)
            dets = predictor(
                batch["images"], batch["input_sizes"], batch["output_sizes"],
                key,
            )
            if pending is not None:
                drain(pending)
            pending = (dets, batch)
        if pending is not None:
            drain(pending)
    finally:
        # Abandoned mid-loop (e.g. a transient backend error): unpark the
        # prefetch thread so it stops holding device batches + the
        # loader's worker pool (loader.py::DevicePrefetcher.close).
        if prefetcher is not None:
            prefetcher.close()
    profile_ctx.__exit__(None, None, None)
    elapsed = time.time() - start
    logger.info(
        f"Inference on {num_images} images in {elapsed:.1f}s "
        f"({num_images / max(elapsed, 1e-9):.2f} img/s)"
    )

    # Per-process rate: local image count over local wall time (after a
    # gather, global count / local time would overstate by ~process_count).
    images_per_second = num_images / max(elapsed, 1e-9)
    if process_count > 1:
        from pod_compare_tpu.parallel.mesh import (
            gather_process_results,
            is_main_process,
        )

        results = gather_process_results(results)
        num_images = sum(gather_process_results([num_images]))
        if not is_main_process():
            # Writers and the metric suite run on the main process only
            # (reference: comm.is_main_process(), train_net.py:74). The
            # gathers above are collective, so every process participates
            # before the non-main ones return.
            return {
                "num_images": num_images,
                "images_per_second": images_per_second,
                "inference_output_dir": inference_output_dir,
                "is_main_process": False,
            }

    with open(
        os.path.join(inference_output_dir, "coco_instances_results.json"), "w"
    ) as f:
        json.dump(results, f)

    summary = {
        "num_images": num_images,
        "num_detections": len(results),
        "images_per_second": images_per_second,
        "inference_output_dir": inference_output_dir,
    }
    if run_map:
        stats, threshold = evaluate_average_precision(
            inference_output_dir, test_dataset, verbose=verbose
        )
        summary["mAP"] = float(stats[0])
        summary["AP50"] = float(stats[1])
        summary["optimal_score_threshold"] = threshold
    if run_metrics:
        # --min-allowed-score overrides the optimal-F1 threshold read from
        # mAP_res.txt, as in the reference (setup.py:58-74 /
        # compute_probabilistic_metrics.py:54-66).
        summary["probabilistic_metrics"] = evaluate_probabilistic_metrics(
            inference_output_dir, test_dataset, train_dataset,
            min_allowed_score=min_allowed_score, verbose=verbose,
        )
        summary["calibration_errors"] = evaluate_calibration_errors(
            inference_output_dir, test_dataset, train_dataset,
            min_allowed_score=min_allowed_score, verbose=verbose,
        )
    if run_pdq:
        # First-party PDQ (Hall et al. WACV 2020) — the reference defers
        # this metric to external code (README.md:125).
        from pod_compare_tpu.evaluation.category_mapping import (
            dataset_id_to_model_contiguous_map,
        )
        from pod_compare_tpu.evaluation.pdq import evaluate_pdq

        # Resolve the optimal-F1 threshold from mAP_res.txt like the
        # sibling metric suites do, so every metric in this summary scores
        # the SAME detection set.
        pdq_score = min_allowed_score
        if pdq_score is None:
            try:
                pdq_score = read_optimal_score_threshold(inference_output_dir)
            except FileNotFoundError:
                pdq_score = 0.0
        summary["pdq"] = evaluate_pdq(
            inference_output_dir,
            get_dataset(test_dataset).json_file,
            dataset_id_to_model_contiguous_map(train_dataset, test_dataset),
            min_allowed_score=pdq_score,
            verbose=verbose,
        )
    return summary


def main(args, batch_size: int = 8, profile: bool = False):
    from pod_compare_tpu.utils import enable_persistent_cache

    enable_persistent_cache()
    cfg = setup_config(args, random_seed=args.random_seed, is_testing=True)
    inference_name = os.path.splitext(os.path.basename(args.inference_config))[0]
    test_dataset = args.test_dataset or cfg.DATASETS.TEST[0]
    summary = run_inference(
        cfg, test_dataset, inference_name, batch_size=batch_size,
        profile=profile,
        min_allowed_score=args.min_allowed_score or None,
        run_pdq=getattr(args, "run_pdq", False),
    )
    # Copy the inference config next to its artifacts for provenance
    # (reference: apply_net.py:48-51).
    from shutil import copyfile
    from pod_compare_tpu import configs_dir

    src_cfg = args.inference_config
    if not os.path.isfile(src_cfg):
        src_cfg = os.path.join(configs_dir(), args.inference_config)
    if os.path.isfile(src_cfg):
        copyfile(
            src_cfg,
            os.path.join(
                summary["inference_output_dir"], os.path.basename(src_cfg)
            ),
        )
    return summary


if __name__ == "__main__":
    parser = setup_arg_parser()
    parser.add_argument(
        "--batch-size", default="8",
        help="images per device batch, or 'auto' to compile-probe the "
             "largest batch that fits HBM",
    )
    parser.add_argument("--profile", action="store_true")
    parser.add_argument(
        "--run-pdq", action="store_true", dest="run_pdq",
        help="also score with first-party PDQ (evaluation/pdq.py)",
    )
    args = parser.parse_args()
    print("Command Line Args:", args)
    batch = args.batch_size if args.batch_size == "auto" else int(args.batch_size)
    main(args, batch_size=batch, profile=args.profile)
