"""End-to-end reference-pipeline metric parity (VERDICT round-1 item #2).

Same weights, same images: run the full JAX stack (model forward →
inference mode → rescale → COCO json → matching → scoring/mAP) against the
torch/numpy reference-semantics oracle (tests/reference_pipeline_oracle.py)
and diff the FINAL numbers.

Parity contract (SURVEY.md §7 'stochastic parity' + BASELINE.md bar):
  * deterministic variants (no variance heads): detections match exactly,
    metrics within 0.5%, mAP identical through the same evaluator;
  * stochastic variants (cls-var MC sampling, 1000-sample box decode):
    both stacks run enough samples that MC noise is below the 0.5%
    tolerance, then final metrics must still agree within it.
"""

import json
import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from pod_compare_tpu.config import get_cfg
from pod_compare_tpu.data.datasets import get_dataset
from pod_compare_tpu.data.synthetic import register_synthetic
from pod_compare_tpu.evaluation.average_precision import evaluate_average_precision
from pod_compare_tpu.evaluation.category_mapping import (
    dataset_id_to_model_contiguous_map,
    model_to_dataset_id_map,
)
from pod_compare_tpu.evaluation.probabilistic_metrics import (
    evaluate_probabilistic_metrics,
)
from pod_compare_tpu.inference.postprocess import detections_to_json
from pod_compare_tpu.inference.predictor import build_predictor
from pod_compare_tpu.models import build_anchor_generator, build_model, init_model_params
from pod_compare_tpu.train.torch_convert import (
    convert_torch_state_dict,
    merge_into_params,
)

import reference_pipeline_oracle as oracle
from test_full_model_parity import make_reference_state, torch_reference_forward

IMAGE_SIZE = (64, 64)
NUM_CLASSES = 3
NUM_IMAGES = 4
TOPK = 100
MAX_DETS = 12
NMS_THRESH = 0.5
SCORE_THRESH = 0.05


def base_cfg():
    cfg = get_cfg()
    cfg.MODEL.RETINANET.NUM_CLASSES = NUM_CLASSES
    cfg.MODEL.RETINANET.TOPK_CANDIDATES_TEST = TOPK
    cfg.MODEL.RETINANET.SCORE_THRESH_TEST = SCORE_THRESH
    cfg.MODEL.RETINANET.NMS_THRESH_TEST = NMS_THRESH
    cfg.TEST.DETECTIONS_PER_IMAGE = MAX_DETS
    cfg.PARALLEL.COMPUTE_DTYPE = "float32"
    return cfg


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("parity_ds"))
    name = register_synthetic(
        root, "parity_synth", num_images=NUM_IMAGES, image_size=IMAGE_SIZE,
        num_classes=NUM_CLASSES, seed=7,
    )
    ds = get_dataset(name)
    with open(ds.json_file) as f:
        gt = json.load(f)
    import cv2

    images = []
    for rec in sorted(gt["images"], key=lambda r: r["id"]):
        img = cv2.imread(os.path.join(ds.image_root, rec["file_name"]))
        images.append(img.astype(np.float32))
    return name, gt, np.stack(images)


@pytest.fixture(scope="module")
def torch_state(rng_module):
    return make_reference_state(rng_module, num_classes=NUM_CLASSES)


@pytest.fixture(scope="module")
def rng_module():
    return np.random.RandomState(3)


def strip_prob_heads(sd):
    return {
        k: v for k, v in sd.items() if "cls_var" not in k and "bbox_cov" not in k
    }


def temper_prob_heads(sd, images, cfg):
    """Rescale the random output-conv weights so head outputs land in
    trained-model ranges (the raw random network emits ~1e6-magnitude
    logits/deltas, saturating sigmoids and overflowing exp() in BOTH
    stacks). Output convs are linear in (W, b), so scaling both scales the
    output exactly; one probe forward measures the current magnitude."""
    probe = torch_reference_forward(
        sd, torch.tensor(np.transpose(images[:1], (0, 3, 1, 2))),
        num_classes=NUM_CLASSES, num_anchors=9, cov_dims=4,
        pixel_mean=list(cfg.MODEL.PIXEL_MEAN),
        pixel_std=list(cfg.MODEL.PIXEL_STD),
    )
    targets = {
        "cls_score": ("box_cls", 3.0),       # logits in ±3: spread scores
        "bbox_pred": ("box_delta", 0.4),     # sane box deltas
        "cls_var": ("box_cls_var", 1.0),     # log-var ±1 around the bias
        "bbox_cov": ("box_reg_var", 0.5),
    }
    sd = dict(sd)
    for conv, (out_key, target) in targets.items():
        scale = target / max(float(np.abs(probe[out_key]).max()), 1e-9)
        sd[f"head.{conv}.weight"] = sd[f"head.{conv}.weight"] * scale
        sd[f"head.{conv}.bias"] = sd[f"head.{conv}.bias"] * scale
    # center the variance heads on trained-model-like magnitudes
    sd["head.cls_var.bias"] = sd["head.cls_var.bias"] - 6.0
    sd["head.bbox_cov.bias"] = sd["head.bbox_cov.bias"] - 4.0
    return sd


def jax_params_from_sd(cfg, sd):
    model = build_model(cfg)
    params = init_model_params(model, IMAGE_SIZE, seed=0)
    return merge_into_params(params, convert_torch_state_dict(sd))


def run_our_stack(cfg, params, images, rng=None):
    predictor = build_predictor(cfg, IMAGE_SIZE, params=params)
    sizes = np.tile(
        np.array(IMAGE_SIZE, np.float32)[None], (images.shape[0], 1)
    )
    dets = predictor(jnp.asarray(images), sizes, sizes, rng)
    return jax.device_get(dets)


def our_json(dets, name):
    cat_map = model_to_dataset_id_map(name, name)
    records = []
    for i in range(len(np.asarray(dets.boxes))):
        one = jax.tree_util.tree_map(lambda x: np.asarray(x)[i], dets)
        records.extend(detections_to_json(one, i, cat_map))
    return records


def torch_level_outputs(cfg, sd, images, with_var):
    """Torch-functional forward → per-level numpy outputs for the oracle."""
    ref = torch_reference_forward(
        sd if with_var else make_full_sd_for_forward(sd),
        torch.tensor(np.transpose(images, (0, 3, 1, 2))),
        num_classes=NUM_CLASSES, num_anchors=9,
        cov_dims=4,
        pixel_mean=list(cfg.MODEL.PIXEL_MEAN),
        pixel_std=list(cfg.MODEL.PIXEL_STD),
    )
    gen = build_anchor_generator(cfg)
    anchors_per_level = gen.per_level(IMAGE_SIZE)
    sizes = [a.shape[0] for a in anchors_per_level]
    edges = np.cumsum([0] + sizes)

    def split(x):
        return [x[:, edges[i]:edges[i + 1]] for i in range(len(sizes))]

    out = {
        "box_cls": split(ref["box_cls"]),
        "box_delta": split(ref["box_delta"]),
        "box_cls_var": split(ref["box_cls_var"]) if with_var else None,
        "box_reg_var": split(ref["box_reg_var"]) if with_var else None,
    }
    return anchors_per_level, out


def make_full_sd_for_forward(sd):
    """torch_reference_forward expects the var-head keys; give zero-weight
    stand-ins whose outputs are ignored for the vanilla variant."""
    full = dict(sd)
    if "head.cls_var.weight" not in full:
        full["head.cls_var.weight"] = np.zeros(
            (9 * NUM_CLASSES, 256, 3, 3), np.float32
        )
        full["head.cls_var.bias"] = np.zeros((9 * NUM_CLASSES,), np.float32)
        full["head.bbox_cov.weight"] = np.zeros((9 * 4, 256, 3, 3), np.float32)
        full["head.bbox_cov.bias"] = np.zeros((9 * 4,), np.float32)
    return full


def oracle_per_image(
    anchors_per_level, outs, image_idx, mode_fn, seed, postprocess=True,
    **core_kw,
):
    rng = np.random.RandomState(seed)
    per_image_outs = {
        k: ([lvl[image_idx] for lvl in v] if v is not None else None)
        for k, v in outs.items()
    }
    candidates = oracle.anchorwise_inference_np(
        rng, anchors_per_level, per_image_outs, **core_kw
    )
    result = mode_fn(candidates)
    if postprocess:
        result = oracle.detector_postprocess_np(result, IMAGE_SIZE, IMAGE_SIZE)
    return result


def assert_detections_match(our_records, oracle_records, atol_box=0.05):
    assert len(our_records) == len(oracle_records), (
        len(our_records), len(oracle_records)
    )
    key = lambda r: (r["image_id"], -r["score"], r["category_id"])
    ours = sorted(our_records, key=key)
    theirs = sorted(oracle_records, key=key)
    for a, b in zip(ours, theirs):
        assert a["image_id"] == b["image_id"]
        assert a["category_id"] == b["category_id"]
        np.testing.assert_allclose(a["score"], b["score"], rtol=2e-4)
        np.testing.assert_allclose(a["bbox"], b["bbox"], atol=atol_box)
        np.testing.assert_allclose(a["cls_prob"], b["cls_prob"], atol=2e-4)


def final_metrics_both_stacks(tmp_path, name, gt, our_records, oracle_records):
    """Run OUR file-based metric chain on our json; run the ORACLE metric
    formulas on the oracle json; also cross-evaluate mAP of both jsons
    through our (golden-fixture-validated) COCO evaluator."""
    out_dir = os.path.join(str(tmp_path), "inference_out")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "coco_instances_results.json"), "w") as f:
        json.dump(our_records, f)

    eval_classes = tuple(range(NUM_CLASSES))
    our_stats, _ = evaluate_average_precision(
        out_dir, name, cat_ids=tuple(range(1, NUM_CLASSES + 1)), verbose=False
    )
    our_metrics = evaluate_probabilistic_metrics(
        out_dir, name, name, min_allowed_score=0.0,
        eval_classes=eval_classes, verbose=False,
    )

    oracle_dir = os.path.join(str(tmp_path), "oracle_out")
    os.makedirs(oracle_dir, exist_ok=True)
    with open(
        os.path.join(oracle_dir, "coco_instances_results.json"), "w"
    ) as f:
        json.dump(oracle_records, f)
    oracle_stats, _ = evaluate_average_precision(
        oracle_dir, name, cat_ids=tuple(range(1, NUM_CLASSES + 1)), verbose=False
    )

    cat_mapping = dataset_id_to_model_contiguous_map(name, name)
    matched = oracle.match_predictions_np(
        oracle.preprocess_predictions_np(oracle_records),
        oracle.preprocess_gt_np(gt["annotations"]),
    )
    oracle_metrics = oracle.probabilistic_metrics_np(
        matched, cat_mapping, eval_classes
    )
    return our_stats, our_metrics, oracle_stats, oracle_metrics


def assert_metrics_close(our_metrics, oracle_metrics, rel=0.005):
    for key in ("num_true_positives", "num_false_positives",
                "num_false_negatives"):
        assert our_metrics[key] == oracle_metrics[key], (
            key, our_metrics[key], oracle_metrics[key]
        )
    for key in ("tp_cls_ignorance", "tp_reg_ignorance", "tp_reg_mse",
                "fp_cls_ignorance", "fp_reg_entropy"):
        a, b = our_metrics[key], oracle_metrics[key]
        if np.isnan(a) and np.isnan(b):
            continue
        assert abs(a - b) <= rel * max(abs(a), abs(b), 1.0), (key, a, b)


def test_standard_nms_pipeline_parity_exact(dataset, torch_state, tmp_path):
    """Vanilla model (no variance heads): fully deterministic chain —
    detections exact, final mAP/NLL within 0.5%
    (reference chain: apply_net.py:88-106 →
    compute_probabilistic_metrics.py:21-205)."""
    name, gt, images = dataset
    sd = strip_prob_heads(torch_state)
    cfg = base_cfg()

    params = jax_params_from_sd(cfg, sd)
    dets = run_our_stack(cfg, params, images)
    our_records = our_json(dets, name)

    anchors_per_level, outs = torch_level_outputs(cfg, sd, images, with_var=False)
    cat_map = model_to_dataset_id_map(name, name)
    oracle_records = []
    for i in range(NUM_IMAGES):
        res = oracle_per_image(
            anchors_per_level, outs, i,
            lambda c: oracle.standard_nms_np(c, NMS_THRESH, MAX_DETS),
            seed=100 + i, topk=TOPK, score_thresh=SCORE_THRESH,
        )
        oracle_records.extend(oracle.instances_to_json_np(res, i, cat_map))

    assert_detections_match(our_records, oracle_records)
    our_stats, our_metrics, oracle_stats, oracle_metrics = (
        final_metrics_both_stacks(tmp_path, name, gt, our_records, oracle_records)
    )
    # identical detections → identical mAP through the same evaluator
    np.testing.assert_allclose(our_stats[:3], oracle_stats[:3], atol=1e-3)
    assert_metrics_close(our_metrics, oracle_metrics, rel=0.005)


def test_anchor_statistics_pipeline_parity_exact(dataset, torch_state, tmp_path):
    """Anchor-statistics fusion on the vanilla model is still fully
    deterministic (cluster spread only,
    inference_utils.py:57-162) — exact parity end to end."""
    name, gt, images = dataset
    sd = strip_prob_heads(torch_state)
    cfg = base_cfg()
    cfg.PROBABILISTIC_INFERENCE.INFERENCE_MODE = "anchor_statistics"
    cfg.PROBABILISTIC_INFERENCE.AFFINITY_THRESHOLD = 0.7

    params = jax_params_from_sd(cfg, sd)
    dets = run_our_stack(cfg, params, images)
    our_records = our_json(dets, name)

    anchors_per_level, outs = torch_level_outputs(cfg, sd, images, with_var=False)
    cat_map = model_to_dataset_id_map(name, name)
    oracle_records = []
    for i in range(NUM_IMAGES):
        res = oracle_per_image(
            anchors_per_level, outs, i,
            lambda c: oracle.anchor_statistics_np(c, NMS_THRESH, MAX_DETS, 0.7),
            seed=100 + i, topk=TOPK, score_thresh=SCORE_THRESH,
        )
        oracle_records.extend(oracle.instances_to_json_np(res, i, cat_map))

    assert_detections_match(our_records, oracle_records)
    _, our_metrics, _, oracle_metrics = final_metrics_both_stacks(
        tmp_path, name, gt, our_records, oracle_records
    )
    assert_metrics_close(our_metrics, oracle_metrics, rel=0.005)


@pytest.mark.parametrize(
    "cls_sampling,box_sampling",
    [
        ("mc_iid", "mc_iid"),
        ("mc_shared", "mc_shared"),
        ("analytic", "analytic"),
    ],
)
def test_bayes_od_pipeline_parity_statistical(
    dataset, torch_state, tmp_path, cls_sampling, box_sampling
):
    """Full probabilistic model (cls-var + box-cov heads) through BayesOD
    (probabilistic_inference.py:536-636): stochastic sampling with enough
    samples that both stacks land within the 0.5% parity bar.

    Parametrized over the TPU-native sampling implementations
    (PROBABILISTIC_INFERENCE.{CLS,BOX}_SAMPLING): the shared-bank and
    closed-form variants must land inside the SAME statistical band
    against the reference-semantics sampled oracle, since all three
    converge to the same S→∞ limit."""
    name, gt, images = dataset
    cfg = base_cfg()
    sd = temper_prob_heads(torch_state, images, cfg)
    cfg.PROBABILISTIC_INFERENCE.CLS_SAMPLING = cls_sampling
    cfg.PROBABILISTIC_INFERENCE.BOX_SAMPLING = box_sampling
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NAME = "loss_attenuation"
    cfg.MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NUM_SAMPLES = 512
    cfg.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NAME = (
        "negative_log_likelihood"
    )
    cfg.MODEL.PROBABILISTIC_MODELING.BBOX_COV_LOSS.NUM_SAMPLES = 2000
    cfg.PROBABILISTIC_INFERENCE.INFERENCE_MODE = "bayes_od"
    cfg.PROBABILISTIC_INFERENCE.AFFINITY_THRESHOLD = 0.9
    cfg.PROBABILISTIC_INFERENCE.BAYES_OD.BOX_MERGE_MODE = "bayesian_inference"
    cfg.PROBABILISTIC_INFERENCE.BAYES_OD.CLS_MERGE_MODE = "bayesian_inference"

    params = jax_params_from_sd(cfg, sd)
    dets = run_our_stack(cfg, params, images, rng=jax.random.PRNGKey(11))
    our_records = our_json(dets, name)

    anchors_per_level, outs = torch_level_outputs(cfg, sd, images, with_var=True)
    cat_map = model_to_dataset_id_map(name, name)
    oracle_records = []
    for i in range(NUM_IMAGES):
        res = oracle_per_image(
            anchors_per_level, outs, i,
            lambda c: oracle.bayes_od_np(
                c, NMS_THRESH, MAX_DETS, 0.9,
                "bayesian_inference", "bayesian_inference",
            ),
            seed=100 + i, topk=TOPK, score_thresh=SCORE_THRESH,
            cls_num_samples=512, box_num_samples=2000,
        )
        oracle_records.extend(oracle.instances_to_json_np(res, i, cat_map))

    our_stats, our_metrics, oracle_stats, oracle_metrics = (
        final_metrics_both_stacks(tmp_path, name, gt, our_records, oracle_records)
    )
    np.testing.assert_allclose(our_stats[:3], oracle_stats[:3], atol=0.01)
    assert our_metrics["num_true_positives"] == oracle_metrics["num_true_positives"]
    for key in ("tp_cls_ignorance", "tp_reg_ignorance", "fp_reg_entropy"):
        a, b = our_metrics[key], oracle_metrics[key]
        if np.isnan(a) and np.isnan(b):
            continue
        assert abs(a - b) <= 0.02 * max(abs(a), abs(b), 1.0), (key, a, b)


def test_ensembles_post_nms_pipeline_parity_exact(dataset, rng_module, tmp_path):
    """3-member vanilla ensemble, post-NMS black-box fusion
    (inference_utils.py:165-289): deterministic — exact parity."""
    name, gt, images = dataset
    sds = [
        strip_prob_heads(make_reference_state(rng_module, num_classes=NUM_CLASSES))
        for _ in range(3)
    ]
    cfg = base_cfg()
    cfg.PROBABILISTIC_INFERENCE.INFERENCE_MODE = "ensembles"
    cfg.PROBABILISTIC_INFERENCE.ENSEMBLES.BOX_MERGE_MODE = "post_nms"
    cfg.PROBABILISTIC_INFERENCE.AFFINITY_THRESHOLD = 0.7

    params_list = [jax_params_from_sd(cfg, sd) for sd in sds]
    predictor = build_predictor(cfg, IMAGE_SIZE, params_list=params_list)
    sizes = np.tile(np.array(IMAGE_SIZE, np.float32)[None], (NUM_IMAGES, 1))
    dets = jax.device_get(predictor(jnp.asarray(images), sizes, sizes))
    our_records = our_json(dets, name)

    cat_map = model_to_dataset_id_map(name, name)
    member_outs = [
        torch_level_outputs(cfg, sd, images, with_var=False) for sd in sds
    ]
    anchors_per_level = member_outs[0][0]
    oracle_records = []
    for i in range(NUM_IMAGES):
        boxes_l, classes_l, pv_l, covs_l = [], [], [], []
        for _, outs in member_outs:
            # per-member standard NMS results feed the black-box merge;
            # detector_postprocess runs ONCE after the merge (reference:
            # post_processing_ensembles, probabilistic_inference.py:506-534
            # then __call__ :105-110)
            res = oracle_per_image(
                anchors_per_level, outs, i,
                lambda c: oracle.standard_nms_np(c, NMS_THRESH, MAX_DETS),
                seed=0, postprocess=False,
                topk=TOPK, score_thresh=SCORE_THRESH,
            )
            boxes_l.append(res[0])
            covs_l.append(res[1])
            classes_l.append(res[3])
            pv_l.append(res[4])
        merged = oracle.black_box_ensembles_np(
            boxes_l, classes_l, pv_l, covs_l, NMS_THRESH, MAX_DETS, 0.7
        )
        merged = oracle.detector_postprocess_np(merged, IMAGE_SIZE, IMAGE_SIZE)
        oracle_records.extend(oracle.instances_to_json_np(merged, i, cat_map))

    assert_detections_match(our_records, oracle_records, atol_box=0.1)
    _, our_metrics, _, oracle_metrics = final_metrics_both_stacks(
        tmp_path, name, gt, our_records, oracle_records
    )
    assert_metrics_close(our_metrics, oracle_metrics, rel=0.005)
