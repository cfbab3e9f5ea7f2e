"""End-to-end integration: train briefly on synthetic data, checkpoint,
run the apply_net pipeline (inference → COCO json → mAP → probabilistic +
calibration metrics) — the reference's full L2→L7 chain (SURVEY.md §3.2)."""

import json
import os

import numpy as np
import pytest

from pod_compare_tpu.config import get_cfg
from pod_compare_tpu.data.synthetic import register_synthetic


@pytest.fixture(scope="module")
def trained_setup(tmp_path_factory):
    from pod_compare_tpu.parallel.mesh import create_mesh
    from pod_compare_tpu.train.trainer import Trainer

    root = str(tmp_path_factory.mktemp("synth"))
    name = register_synthetic(root, "synth_e2e", num_images=8, image_size=(64, 80))

    cfg = get_cfg()
    cfg.MODEL.RETINANET.NUM_CLASSES = 3
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NAME = "loss_attenuation"
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NUM_SAMPLES = 2
    cfg.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NAME = "negative_log_likelihood"
    cfg.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NUM_SAMPLES = 30
    cfg.MODEL.RETINANET.TOPK_CANDIDATES_TEST = 64
    cfg.TEST.DETECTIONS_PER_IMAGE = 10
    cfg.PARALLEL.COMPUTE_DTYPE = "float32"
    cfg.DATASETS.TRAIN = (name,)
    cfg.DATASETS.TEST = (name,)
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.BASE_LR = 1e-5
    cfg.SOLVER.WARMUP_ITERS = 2
    cfg.SOLVER.STEPS = (100, 200)
    cfg.SOLVER.CHECKPOINT_PERIOD = 4
    cfg.INPUT.MIN_SIZE_TRAIN = (64,)
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.OUTPUT_DIR = str(tmp_path_factory.mktemp("out"))
    cfg.SEED = 0

    trainer = Trainer(cfg, mesh=create_mesh(2))
    trainer.train(max_iter=4, log_period=2)
    trainer.checkpointer.wait()
    return cfg, name


def test_apply_net_pipeline(trained_setup):
    from pod_compare_tpu.cli.apply_net import run_inference

    cfg, name = trained_setup
    summary = run_inference(
        cfg, name, "standard_nms", batch_size=2, verbose=False
    )
    out_dir = summary["inference_output_dir"]
    assert os.path.isfile(os.path.join(out_dir, "coco_instances_results.json"))
    assert os.path.isfile(os.path.join(out_dir, "mAP_res.txt"))
    assert summary["num_images"] == 8
    assert "mAP" in summary
    pm = summary["probabilistic_metrics"]
    assert pm["num_true_positives"] + pm["num_false_positives"] >= 0
    ce = summary["calibration_errors"]
    assert set(ce) >= {
        "cls_marginal_calibration_error", "reg_expected_calibration_error",
        "cls_min_uncertainty_error", "reg_min_uncertainty_error",
    }
    # matched-results cache written
    assert any(
        f.startswith("matched_results") for f in os.listdir(out_dir)
    )


def test_apply_net_no_h2d_overlap_identical(trained_setup):
    """DATALOADER.H2D_OVERLAP=False must feed the identical plain-loader
    batches (same order, same arrays) — detections byte-identical to the
    default DevicePrefetcher path."""
    from pod_compare_tpu.cli.apply_net import run_inference

    cfg, name = trained_setup
    base = run_inference(
        cfg, name, "standard_nms", batch_size=2, run_metrics=False,
        verbose=False,
    )
    # Same output dir both runs (checkpoint discovery needs OUTPUT_DIR):
    # capture the first run's dump before the second overwrites it.
    with open(os.path.join(
        base["inference_output_dir"], "coco_instances_results.json"
    )) as f:
        a = f.read()
    cfg2 = cfg.clone()
    cfg2.DATALOADER.H2D_OVERLAP = False
    no_overlap = run_inference(
        cfg2, name, "standard_nms", batch_size=2, run_metrics=False,
        verbose=False,
    )
    with open(os.path.join(
        no_overlap["inference_output_dir"], "coco_instances_results.json"
    )) as f:
        b = f.read()
    assert a == b


def test_apply_net_bayes_od(trained_setup):
    from pod_compare_tpu.cli.apply_net import run_inference
    from pod_compare_tpu.config import get_cfg as _unused  # noqa

    cfg, name = trained_setup
    cfg2 = cfg.clone()
    cfg2.PROBABILISTIC_INFERENCE.INFERENCE_MODE = "bayes_od"
    cfg2.PROBABILISTIC_INFERENCE.AFFINITY_THRESHOLD = 0.9
    cfg2.PROBABILISTIC_INFERENCE.BAYES_OD.CLS_MERGE_MODE = "max_score"
    summary = run_inference(
        cfg2, name, "bayes_od", batch_size=2, run_metrics=False, verbose=False
    )
    with open(
        os.path.join(summary["inference_output_dir"], "coco_instances_results.json")
    ) as f:
        results = json.load(f)
    for r in results[:5]:
        assert len(r["cls_prob"]) == 3
        cov = np.asarray(r["bbox_covar"])
        assert cov.shape == (4, 4)
        assert np.isfinite(cov).all()


def test_trainer_test_hook(trained_setup):
    """Trainer.test evaluates current params with standard NMS + COCO mAP
    (reference DefaultTrainer eval path)."""
    from pod_compare_tpu.parallel.mesh import create_mesh
    from pod_compare_tpu.train.trainer import Trainer

    cfg, name = trained_setup
    trainer = Trainer(cfg, mesh=create_mesh(2))
    trainer.resume_or_load(resume=True)
    assert int(trainer.state.step) == 4
    summary = trainer.test(batch_size=2)
    assert "mAP" in summary
    assert summary["num_images"] == 8


def test_ensemble_checkpoint_discovery(tmp_path_factory):
    """Ensemble inference discovers sibling random_seed_<s> checkpoints
    (reference: probabilistic_inference.py:59-77) and runs end-to-end."""
    import jax
    from pod_compare_tpu.cli.apply_net import load_predictor_params, run_inference
    from pod_compare_tpu.data.synthetic import register_synthetic
    from pod_compare_tpu.models import build_model, init_model_params
    from pod_compare_tpu.parallel.mesh import create_mesh
    from pod_compare_tpu.train.checkpoint import Checkpointer, sibling_seed_dir
    from pod_compare_tpu.config import get_cfg

    root = str(tmp_path_factory.mktemp("ens"))
    name = register_synthetic(root, "synth_ens", num_images=4, image_size=(48, 64))
    base = str(tmp_path_factory.mktemp("ens_out"))

    cfg = get_cfg()
    cfg.MODEL.RETINANET.NUM_CLASSES = 3
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NAME = "loss_attenuation"
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NUM_SAMPLES = 2
    cfg.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NAME = "negative_log_likelihood"
    cfg.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NUM_SAMPLES = 10
    cfg.MODEL.RETINANET.TOPK_CANDIDATES_TEST = 32
    cfg.TEST.DETECTIONS_PER_IMAGE = 10
    cfg.PARALLEL.COMPUTE_DTYPE = "float32"
    cfg.DATASETS.TRAIN = (name,)
    cfg.DATASETS.TEST = (name,)
    cfg.INPUT.MIN_SIZE_TEST = 48
    cfg.PROBABILISTIC_INFERENCE.INFERENCE_MODE = "ensembles"
    cfg.PROBABILISTIC_INFERENCE.ENSEMBLES.RANDOM_SEED_NUMS = [0, 1000]
    cfg.PROBABILISTIC_INFERENCE.ENSEMBLES.BOX_MERGE_MODE = "pre_nms"
    cfg.OUTPUT_DIR = os.path.join(base, "random_seed_0")

    # Write two member checkpoints into sibling seed dirs.
    model = build_model(cfg)
    for seed in [0, 1000]:
        params = init_model_params(model, (48, 64), seed=seed)
        ckpt = Checkpointer(sibling_seed_dir(cfg.OUTPUT_DIR, seed))
        ckpt.save(0, {"params": params}, force=True)
        ckpt.wait()
        ckpt.close()

    params, params_list = load_predictor_params(cfg)
    assert params is None and len(params_list) == 2

    summary = run_inference(
        cfg, name, "ensembles_pre_nms", batch_size=2,
        params_list=params_list, run_metrics=False, run_map=True,
        verbose=False,
    )
    assert summary["num_images"] == 4
    assert "mAP" in summary


def test_cross_dataset_bdd_model_on_kitti_val(tmp_path_factory):
    """A BDD-trained (7-class) model evaluated on a KITTI-format val set:
    detections remap to KITTI ids {1,2} (others dropped) and gt remaps back
    into model space for the metrics (reference: apply_net.py:53-79 +
    evaluation_utils.py:370-397)."""
    import jax
    from pod_compare_tpu.cli.apply_net import run_inference
    from pod_compare_tpu.config import get_cfg
    from pod_compare_tpu.data import metadata
    from pod_compare_tpu.data.datasets import register_coco_instances
    from pod_compare_tpu.data.synthetic import generate_synthetic_dataset
    from pod_compare_tpu.models import build_model, init_model_params

    root = str(tmp_path_factory.mktemp("cross"))
    # KITTI-like val set: 2 categories (ids 1=car, 2=person).
    json_file, image_dir = generate_synthetic_dataset(
        root, "kitti_x", num_images=4, image_size=(48, 64), num_classes=2
    )
    register_coco_instances(
        "kitti_x_val", json_file, image_dir,
        metadata.KITTI_THING_CLASSES,
        metadata.KITTI_THING_DATASET_ID_TO_CONTIGUOUS_ID,
    )
    # Train-side registration only supplies metadata (never loaded here).
    register_coco_instances(
        "bdd_x_train", json_file, image_dir,
        metadata.BDD_THING_CLASSES,
        metadata.BDD_THING_DATASET_ID_TO_CONTIGUOUS_ID,
    )

    cfg = get_cfg()
    cfg.MODEL.RETINANET.NUM_CLASSES = 7   # BDD-trained model
    cfg.MODEL.RETINANET.TOPK_CANDIDATES_TEST = 32
    cfg.TEST.DETECTIONS_PER_IMAGE = 10
    cfg.PARALLEL.COMPUTE_DTYPE = "float32"
    cfg.DATASETS.TRAIN = ("bdd_x_train",)
    cfg.DATASETS.TEST = ("kitti_x_val",)
    cfg.INPUT.MIN_SIZE_TEST = 48
    cfg.OUTPUT_DIR = str(tmp_path_factory.mktemp("cross_out"))

    model = build_model(cfg)
    params = init_model_params(model, (48, 64), seed=0)
    # Bias the cls head toward the two KITTI-mapped classes (car=0,
    # person=3) so the random-init model emits mappable detections.
    bias = np.asarray(params["head"]["cls_score"]["bias"]).copy()
    bias = bias.reshape(9, 7)
    bias[:, [0, 3]] += 4.0
    params["head"]["cls_score"]["bias"] = bias.reshape(-1)
    summary = run_inference(
        cfg, "kitti_x_val", "standard_nms", batch_size=2,
        params=params, run_map=False, run_metrics=True, verbose=False,
    )
    with open(
        os.path.join(summary["inference_output_dir"],
                     "coco_instances_results.json")
    ) as f:
        results = json.load(f)
    # only the two mapped classes survive, in KITTI dataset ids
    assert results, "no detections dumped"
    assert {r["category_id"] for r in results} <= {1, 2}
    # probability vectors stay in the 7-class model space
    assert all(len(r["cls_prob"]) == 7 for r in results)
    pm = summary["probabilistic_metrics"]
    assert pm["num_true_positives"] >= 0
