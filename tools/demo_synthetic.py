"""Self-contained demo: the full framework on synthetic data, no dataset
downloads. Trains the flagship probabilistic model briefly, then runs every
bundled inference config, evaluates (mAP + NLL + calibration/MUE) and writes
covariance-ellipse visualizations.

    python tools/demo_synthetic.py [--iters 600] [--out /tmp/pod_demo]
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, ".")


def main(iters: int, out_dir: str):
    from pod_compare_tpu.cli.apply_net import run_inference
    from pod_compare_tpu.cli.visualize_predictions import visualize_dataset
    from pod_compare_tpu.config import get_cfg
    from pod_compare_tpu.data.synthetic import register_synthetic
    from pod_compare_tpu.parallel.mesh import create_mesh
    from pod_compare_tpu.train.trainer import Trainer

    os.makedirs(out_dir, exist_ok=True)
    data_root = os.path.join(out_dir, "data")
    name = register_synthetic(
        data_root, "demo", num_images=32, image_size=(96, 128), num_classes=3,
        max_objects=2, seed=3,
    )

    cfg = get_cfg()
    cfg.MODEL.RETINANET.NUM_CLASSES = 3
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NAME = "loss_attenuation"
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NUM_SAMPLES = 10
    cfg.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NAME = "negative_log_likelihood"
    cfg.MODEL.PROBABILISTIC_MODELING.DROPOUT_RATE = 0.1
    cfg.MODEL.PROBABILISTIC_MODELING.ANNEALING_STEP = int(iters * 0.9)
    cfg.DATASETS.TRAIN = (name,)
    cfg.DATASETS.TEST = (name,)
    cfg.SOLVER.IMS_PER_BATCH = 8
    cfg.SOLVER.BASE_LR = 4e-5      # from-scratch (no ImageNet warm start)
    cfg.SOLVER.WARMUP_ITERS = 100
    cfg.SOLVER.WARMUP_FACTOR = 0.01
    cfg.SOLVER.CLIP_GRADIENTS.ENABLED = True
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE = 1.0
    cfg.SOLVER.STEPS = (int(iters * 0.7), int(iters * 0.9))
    cfg.SOLVER.MAX_ITER = iters
    cfg.SOLVER.CHECKPOINT_PERIOD = iters
    cfg.INPUT.MIN_SIZE_TRAIN = (96,)
    cfg.INPUT.MIN_SIZE_TEST = 96
    cfg.OUTPUT_DIR = os.path.join(out_dir, "random_seed_0")
    cfg.SEED = 0

    print(f"=== training {iters} iters on synthetic data ===")
    trainer = Trainer(cfg, mesh=create_mesh(1))
    trainer.train(max_iter=iters, log_period=max(iters // 10, 1))
    trainer.checkpointer.wait()

    import jax

    params = jax.device_get(trainer.state.params)

    modes = {
        "standard_nms": {"INFERENCE_MODE": "standard_nms"},
        "anchor_statistics": {"INFERENCE_MODE": "anchor_statistics",
                              "AFFINITY_THRESHOLD": 0.9},
        "bayes_od": {"INFERENCE_MODE": "bayes_od", "AFFINITY_THRESHOLD": 0.9,
                     "BAYES_OD.CLS_MERGE_MODE": "max_score"},
        "bayes_od_mc_dropout": {
            "INFERENCE_MODE": "bayes_od", "AFFINITY_THRESHOLD": 0.9,
            "MC_DROPOUT.ENABLE": True, "MC_DROPOUT.NUM_RUNS": 10,
            "BAYES_OD.CLS_MERGE_MODE": "max_score"},
        "mc_dropout_post_nms": {
            "INFERENCE_MODE": "mc_dropout_ensembles",
            "AFFINITY_THRESHOLD": 0.9,
            "MC_DROPOUT.ENABLE": True, "MC_DROPOUT.NUM_RUNS": 10,
            "ENSEMBLES_DROPOUT.BOX_MERGE_MODE": "post_nms"},
    }
    for mode_name, overrides in modes.items():
        print(f"=== inference: {mode_name} ===")
        mcfg = cfg.clone().defrost()
        for key, value in overrides.items():
            node = mcfg.PROBABILISTIC_INFERENCE
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            node[parts[-1]] = value
        summary = run_inference(
            mcfg, name, mode_name, batch_size=8, params=params, verbose=True,
            # Exercise the first-party PDQ path (threshold resolved from
            # mAP_res.txt) on one mode so the demo covers the full metric
            # surface.
            run_pdq=(mode_name == "bayes_od"),
        )
        viz_dir = visualize_dataset(
            name,
            os.path.join(summary["inference_output_dir"], "viz"),
            os.path.join(summary["inference_output_dir"],
                         "coco_instances_results.json"),
            min_allowed_score=summary.get("optimal_score_threshold", 0.3),
            max_images=4,
        )
        print(f"  mAP={summary.get('mAP', float('nan')):.4f} "
              f"AP50={summary.get('AP50', float('nan')):.4f} "
              f"viz={viz_dir}")
    print("DEMO COMPLETE")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=600)
    parser.add_argument("--out", type=str, default=None)
    args = parser.parse_args()
    main(args.iters, args.out or tempfile.mkdtemp(prefix="pod_demo_"))
