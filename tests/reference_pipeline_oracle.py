"""Reference-semantics pipeline oracle (numpy/torch, independent of the
JAX stack).

A faithful re-derivation of the reference's full inference + evaluation
chain, used by test_pipeline_parity.py to diff FINAL metric numbers
(mAP / NLL / partition counts) between the JAX stack and reference
semantics on the same weights + images:

  * anchorwise probabilistic inference — probabilistic_inference.py:178-388
  * standard-NMS / anchor-statistics / BayesOD / black-box-ensemble
    postprocessing — inference_utils.py:12-289,
    probabilistic_inference.py:536-636
  * rescale + covariance conjugation — inference_utils.py:374-425
  * COCO-json dump with cls_prob/bbox_covar — inference_utils.py:454-502
  * TP/dup/FP/FN matching — evaluation_utils.py:19-367
  * proper scoring rules — scoring_rules.py:6-114,
    compute_probabilistic_metrics.py:89-205

Everything here is plain numpy/torch with its own RNG; deterministic
sub-paths must match the JAX stack exactly, stochastic paths match
statistically (SURVEY.md §7 'stochastic parity').
"""

import math
import warnings

import numpy as np
import torch

SCALE_CLAMP = math.log(1000.0 / 16)


# --------------------------------------------------------------- box utils
def pairwise_iou_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """detectron2 `pairwise_iou` semantics: zero where union is empty."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float64)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.prod(np.clip(a[:, 2:] - a[:, :2], 0, None), axis=1)[:, None]
    area_b = np.prod(np.clip(b[:, 2:] - b[:, :2], 0, None), axis=1)[None]
    union = area_a + area_b - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-300), 0.0)


def nms_np(boxes: np.ndarray, scores: np.ndarray, thresh: float) -> np.ndarray:
    """torchvision `nms` semantics: greedy by descending score; suppress
    strictly-greater-than-threshold overlaps. Returns kept indices in
    score-descending order."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        ious = pairwise_iou_np(boxes[i : i + 1], boxes)[0]
        suppressed |= ious > thresh
        suppressed[i] = True
    return np.asarray(keep, np.int64)


def batched_nms_np(boxes, scores, classes, thresh):
    """detectron2 `batched_nms`: per-class coordinate-offset trick."""
    if len(boxes) == 0:
        return np.zeros((0,), np.int64)
    max_coord = boxes.max()
    offsets = classes.astype(np.float64) * (max_coord + 1.0)
    return nms_np(boxes + offsets[:, None], scores, thresh)


def decode_deltas_np(deltas, anchors, weights=(1.0, 1.0, 1.0, 1.0)):
    """detectron2 Box2BoxTransform.apply_deltas (supports (..., 4))."""
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = anchors[..., 0] + 0.5 * aw
    ay = anchors[..., 1] + 0.5 * ah
    wx, wy, ww, wh = weights
    dx, dy = deltas[..., 0] / wx, deltas[..., 1] / wy
    dw = np.minimum(deltas[..., 2] / ww, SCALE_CLAMP)
    dh = np.minimum(deltas[..., 3] / wh, SCALE_CLAMP)
    cx, cy = dx * aw + ax, dy * ah + ay
    w, h = np.exp(dw) * aw, np.exp(dh) * ah
    return np.stack(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def cholesky_from_cov_output_np(pred_cov: np.ndarray) -> np.ndarray:
    """modeling_utils.covariance_output_to_cholesky: sqrt(exp) diagonal,
    raw strict-lower-triangle fill for the 10-param 'full' type."""
    n = pred_cov.shape[0]
    chol = np.zeros((n, 4, 4), pred_cov.dtype)
    diag = np.sqrt(np.exp(pred_cov[:, :4]))
    chol[:, np.arange(4), np.arange(4)] = diag
    if pred_cov.shape[1] > 4:
        rows = [1, 2, 2, 3, 3, 3]
        cols = [0, 0, 1, 0, 1, 2]
        chol[:, rows, cols] = pred_cov[:, 4:10]
    return chol


def mean_covariance_np(samples: np.ndarray):
    """compute_mean_covariance_torch (inference_utils.py:337-371):
    samples (S, N, 4) -> mean (N, 4), unbiased covariance (N, 4, 4)."""
    num = samples.shape[0]
    mean = samples.mean(0)
    resid = samples - mean[None]
    cov = np.einsum("sni,snj->nij", resid, resid) / max(num - 1, 1)
    return mean, cov


# --------------------------------------------- anchorwise inference oracle
def anchorwise_inference_np(
    rng: np.random.RandomState,
    anchors_per_level,
    outputs,
    *,
    topk=1000,
    score_thresh=0.05,
    cls_num_samples=10,
    box_num_samples=1000,
    outputs_list=None,
):
    """Oracle of `retinanet_probabilistic_inference`
    (probabilistic_inference.py:178-388) on per-level numpy outputs.

    Args:
        anchors_per_level: list of (R_l, 4) arrays.
        outputs: dict of per-level lists box_cls/box_delta (each (R_l, K) /
            (R_l, 4)) and optional box_cls_var/box_reg_var; pass the
            run-averaged outputs when outputs_list is given (the reference
            averages per-level maps over runs, :211-270).
        outputs_list: optional list of per-run outputs dicts for the
            epistemic covariance path (:322-331).
    Returns:
        (boxes, covs_or_None, scores, classes, prob_vectors)
    """
    is_epistemic = outputs_list is not None
    sel = {"anchors": [], "deltas": [], "chol": [], "prob": [], "cls": [],
           "prob_vec": [], "epistemic": []}
    for lvl, anchors in enumerate(anchors_per_level):
        box_cls = outputs["box_cls"][lvl].astype(np.float64)
        box_delta = outputs["box_delta"][lvl].astype(np.float64)

        if outputs.get("box_cls_var") is not None:
            var = outputs["box_cls_var"][lvl].astype(np.float64)
            std = np.sqrt(np.exp(var))
            z = rng.randn(cls_num_samples, *box_cls.shape)
            with np.errstate(over="ignore"):
                probs = 1.0 / (1.0 + np.exp(-(box_cls[None] + z * std[None])))
            probs = probs.mean(0)
        else:
            with np.errstate(over="ignore"):
                probs = 1.0 / (1.0 + np.exp(-box_cls))

        num_topk = min(topk, box_delta.shape[0])
        predicted_prob = probs.max(1)
        classes_idxs = probs.argmax(1)
        # torch.topk is descending and stable for our purposes
        topk_idxs = np.argsort(-predicted_prob, kind="stable")[:num_topk]
        predicted_prob = predicted_prob[topk_idxs]
        keep = predicted_prob > score_thresh
        topk_idxs = topk_idxs[keep]
        predicted_prob = predicted_prob[keep]

        sel["deltas"].append(box_delta[topk_idxs])
        sel["anchors"].append(anchors[topk_idxs])
        sel["prob"].append(predicted_prob)
        sel["cls"].append(classes_idxs[topk_idxs])
        sel["prob_vec"].append(probs[topk_idxs])

        if outputs.get("box_reg_var") is not None:
            reg_var = outputs["box_reg_var"][lvl].astype(np.float64)
            sel["chol"].append(cholesky_from_cov_output_np(reg_var[topk_idxs]))
        if is_epistemic:
            run_boxes = np.stack(
                [
                    decode_deltas_np(
                        run["box_delta"][lvl].astype(np.float64)[topk_idxs],
                        anchors[topk_idxs],
                    )
                    for run in outputs_list
                ]
            )
            _, epi_cov = mean_covariance_np(run_boxes)
            sel["epistemic"].append(epi_cov)

    deltas = np.concatenate(sel["deltas"]) if sel["deltas"] else np.zeros((0, 4))
    anchors = np.concatenate(sel["anchors"]) if sel["anchors"] else np.zeros((0, 4))
    prob = np.concatenate(sel["prob"]) if sel["prob"] else np.zeros((0,))
    classes = np.concatenate(sel["cls"]) if sel["cls"] else np.zeros((0,), np.int64)
    prob_vec = (
        np.concatenate(sel["prob_vec"]) if sel["prob_vec"] else np.zeros((0, 1))
    )

    if sel["chol"]:
        chol = np.concatenate(sel["chol"])
        # 1000 MVN delta samples -> decode -> sample mean + covariance
        # (probabilistic_inference.py:344-374)
        z = rng.randn(box_num_samples, deltas.shape[0], 4)
        delta_samples = deltas[None] + np.einsum("cij,scj->sci", chol, z)
        box_samples = decode_deltas_np(
            delta_samples, np.broadcast_to(anchors[None], delta_samples.shape)
        )
        boxes, covs = mean_covariance_np(box_samples)
        if sel["epistemic"]:
            covs = covs + np.concatenate(sel["epistemic"])
    else:
        boxes = decode_deltas_np(deltas, anchors)
        covs = np.concatenate(sel["epistemic"]) if sel["epistemic"] else None
    return boxes, covs, prob, classes, prob_vec


# ------------------------------------------------- postprocessing oracles
def standard_nms_np(outputs, nms_thresh=0.5, max_dets=100):
    """inference_utils.general_standard_nms_postprocessing (:12-54)."""
    boxes, covs, prob, classes, prob_vec = outputs
    keep = batched_nms_np(boxes, prob, classes, nms_thresh)[:max_dets]
    covs_out = covs[keep] if covs is not None else np.zeros((len(keep), 4, 4))
    return (boxes[keep], covs_out, prob[keep], classes[keep], prob_vec[keep])


def anchor_statistics_np(outputs, nms_thresh=0.5, max_dets=100, affinity=0.7):
    """inference_utils.general_anchor_statistics_postprocessing (:57-162)."""
    boxes, covs, prob, classes, prob_vec = outputs
    iou = pairwise_iou_np(boxes, boxes)
    keep = batched_nms_np(boxes, prob, classes, nms_thresh)[:max_dets]
    clusters = iou[keep, :] > affinity

    out_boxes, out_covs, out_probs = [], [], []
    for cluster_idxs, center_idx in zip(clusters, keep):
        if cluster_idxs.sum() >= 2:
            center_cls = classes[center_idx]
            members = np.where(cluster_idxs)[0]
            members = members[classes[members] == center_cls]
            bc = boxes[members]
            mean = bc.mean(0)
            resid = bc - mean
            cov = np.einsum("ni,nj->ij", resid, resid) / max(bc.shape[0] - 1, 1.0)
            if covs is not None and len(covs) > 0:
                cov = cov + covs[members].mean(0)
            pv = prob_vec[members].mean(0)
        else:
            mean = boxes[center_idx]
            pv = prob_vec[center_idx]
            cov = 1e-4 * np.eye(4)
            if covs is not None and len(covs) > 0:
                cov = covs[center_idx]
        out_boxes.append(mean)
        out_covs.append(cov)
        out_probs.append(pv)
    if not out_boxes:
        return (np.zeros((0, 4)), np.zeros((0, 4, 4)), np.zeros((0,)),
                np.zeros((0,), np.int64), np.zeros((0, prob_vec.shape[1])))
    pv = np.stack(out_probs)
    return (
        np.stack(out_boxes), np.stack(out_covs), pv.max(1),
        pv.argmax(1), pv,
    )


def bayesian_fusion_np(cluster_means, cluster_covs, box_merge_mode):
    """inference_utils.bounding_box_bayesian_inference (:292-334)."""
    precs = np.linalg.inv(cluster_covs)
    if box_merge_mode == "bayesian_inference":
        final_cov = np.linalg.inv(precs.sum(0))
        final_mean = np.matmul(precs, cluster_means[..., None]).sum(0)
        final_mean = np.squeeze(final_cov @ final_mean)
    else:  # covariance_intersection
        diff_precs = precs.sum(0) - precs
        dets = np.linalg.det(precs)
        total_det = np.linalg.det(precs.sum(0))
        diff_dets = np.linalg.det(diff_precs)
        omegas = (total_det - diff_dets + dets) / (
            precs.shape[0] * total_det + (dets - diff_dets).sum(0)
        )
        weighted = omegas[:, None, None] * precs
        final_cov = np.linalg.inv(weighted.sum(0))
        final_mean = np.squeeze(
            final_cov @ np.matmul(weighted, cluster_means[..., None]).sum(0)
        )
    return final_mean, final_cov


def bayes_od_np(
    outputs, nms_thresh=0.5, max_dets=100, affinity=0.9,
    box_merge_mode="bayesian_inference", cls_merge_mode="bayesian_inference",
):
    """post_processing_bayes_od (probabilistic_inference.py:536-636)."""
    boxes, covs, prob, classes, prob_vec = outputs
    keep = batched_nms_np(boxes, prob, classes, nms_thresh)[:max_dets]
    iou = pairwise_iou_np(boxes, boxes)
    clusters = iou[keep, :] > affinity

    out_pv, out_boxes, out_covs = [], [], []
    for cluster_idxs, center_idx in zip(clusters, keep):
        center_pv = prob_vec[center_idx]
        cluster_pv = prob_vec[cluster_idxs]
        center_cat = center_pv.argmax()
        cat_idx = cluster_pv.argmax(1)
        class_sim = cat_idx == center_cat
        if cls_merge_mode == "bayesian_inference":
            out_pv.append(cluster_pv.mean(0))
        else:
            out_pv.append(center_pv)
        cluster_means = boxes[cluster_idxs][class_sim]
        cluster_covs = covs[cluster_idxs][class_sim]
        mean, cov = bayesian_fusion_np(cluster_means, cluster_covs, box_merge_mode)
        out_boxes.append(mean)
        out_covs.append(cov)

    if not out_boxes:
        return (np.zeros((0, 4)), np.zeros((0, 4, 4)), np.zeros((0,)),
                np.zeros((0,), np.int64), np.zeros((0, prob_vec.shape[1])))
    if cls_merge_mode == "bayesian_inference":
        pv = np.stack(out_pv)
        scores_out = pv.max(1)
        classes_out = pv.argmax(1)
    else:
        pv = prob_vec[keep]
        scores_out = prob[keep]
        classes_out = classes[keep]
    return np.stack(out_boxes), np.stack(out_covs), scores_out, classes_out, pv


def black_box_ensembles_np(
    boxes_list, classes_list, prob_vec_list, covs_list,
    nms_thresh=0.5, max_dets=100, affinity=0.7,
):
    """inference_utils.general_black_box_ensembles_post_processing
    (:165-289): sequential same-class IoU clustering over concatenated
    post-NMS member detections."""
    boxes = np.concatenate(boxes_list, 0)
    covs = np.concatenate(covs_list, 0)
    prob_vec = np.concatenate(prob_vec_list, 0)
    classes = np.concatenate(classes_list, 0)

    iou = pairwise_iou_np(boxes, boxes)
    clusters = []
    assigned = np.zeros(len(boxes), bool)
    for i in range(len(boxes)):
        if i != 0 and assigned[i]:
            continue
        members = np.where((iou[i] >= affinity) & (classes == classes[i]))[0]
        clusters.append(members)
        assigned[members] = True

    out_boxes, out_covs, out_pv = [], [], []
    for members in clusters:
        bc = boxes[members]
        cc = covs[members]
        # Empty clusters (all-zero padding boxes) mirror the reference's
        # nan means; silence the numpy chatter, keep the nans.
        with warnings.catch_warnings(), np.errstate(invalid="ignore"):
            warnings.simplefilter("ignore", RuntimeWarning)
            if bc.shape[0] >= 2:
                mean = bc.mean(0)
                resid = bc - mean
                cov = np.einsum("ni,nj->ij", resid, resid) / (bc.shape[0] - 1)
                cov = cov + cc.mean(0)
            else:
                mean = bc.mean(0)
                cov = cc.mean(0)
            out_pv.append(prob_vec[members].mean(0))
        out_boxes.append(mean)
        out_covs.append(cov)

    if not out_boxes:
        return (np.zeros((0, 4)), np.zeros((0, 4, 4)), np.zeros((0,)),
                np.zeros((0,), np.int64), np.zeros((0, prob_vec.shape[1])))
    pv = np.stack(out_pv)
    scores = pv.max(1)
    cls = pv.argmax(1)
    bx = np.stack(out_boxes)
    cv = np.stack(out_covs)
    keep = batched_nms_np(bx, scores, cls, nms_thresh)[:max_dets]
    return bx[keep], cv[keep], scores[keep], cls[keep], pv[keep]


def detector_postprocess_np(result, input_hw, output_hw):
    """inference_utils.probabilistic_detector_postprocess (:374-425):
    rescale + clip + drop empty + 1e-4 conditioning + S Σ Sᵀ."""
    boxes, covs, scores, classes, pv = result
    scale_x = output_hw[1] / input_hw[1]
    scale_y = output_hw[0] / input_hw[0]
    boxes = boxes * np.array([scale_x, scale_y, scale_x, scale_y])
    boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, output_hw[1])
    boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, output_hw[0])
    nonempty = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
    boxes, scores, classes, pv = (
        boxes[nonempty], scores[nonempty], classes[nonempty], pv[nonempty]
    )
    covs = covs[nonempty] + 1e-4 * np.eye(4)
    smat = np.diag([scale_x, scale_y, scale_x, scale_y])
    covs = smat[None] @ covs @ smat.T[None]
    return boxes, covs, scores, classes, pv


def instances_to_json_np(result, img_id, cat_mapping):
    """inference_utils.instances_to_json (:454-502)."""
    boxes, covs, scores, classes, pv = result
    jmat = np.array(
        [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [-1.0, 0, 1.0, 0], [0, -1.0, 0, 1.0]]
    )
    covs_xywh = jmat[None] @ covs @ jmat.T[None]
    out = []
    for k in range(len(boxes)):
        cls = int(classes[k])
        cat = cat_mapping.get(cls, -1)
        if cat == -1:
            continue
        x1, y1, x2, y2 = boxes[k]
        out.append(
            {
                "image_id": img_id,
                "category_id": cat,
                "bbox": [float(x1), float(y1), float(x2 - x1), float(y2 - y1)],
                "score": float(scores[k]),
                "cls_prob": pv[k].tolist(),
                "bbox_covar": covs_xywh[k].tolist(),
            }
        )
    return out


# ----------------------------------------------------- evaluation oracles
def preprocess_predictions_np(pred_json, min_allowed_score=0.0):
    """eval_predictions_preprocess (evaluation_utils.py:19-73)."""
    per_image = {}
    jmat = np.array(
        [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [1.0, 0, 1.0, 0], [0, 1.0, 0.0, 1.0]]
    )
    for inst in pred_json:
        probs = np.asarray(inst["cls_prob"], np.float64)
        if inst["category_id"] == -1 or probs.max() < min_allowed_score:
            continue
        b = inst["bbox"]
        box = np.array([b[0], b[1], b[0] + b[2], b[1] + b[3]])
        cov = jmat @ np.asarray(inst["bbox_covar"]) @ jmat.T
        entry = per_image.setdefault(
            inst["image_id"], {"boxes": [], "probs": [], "covs": []}
        )
        entry["boxes"].append(box)
        entry["probs"].append(probs)
        entry["covs"].append(cov)
    return {
        k: {kk: np.stack(vv) for kk, vv in v.items()}
        for k, v in per_image.items()
    }


def preprocess_gt_np(gt_json):
    """eval_gt_preprocess (evaluation_utils.py:76-92)."""
    per_image = {}
    for ann in gt_json:
        b = ann["bbox"]
        box = np.array([b[0], b[1], b[0] + b[2], b[1] + b[3]])
        entry = per_image.setdefault(ann["image_id"], {"boxes": [], "cats": []})
        entry["boxes"].append(box)
        entry["cats"].append(ann["category_id"])
    return {
        k: {"boxes": np.stack(v["boxes"]), "cats": np.asarray(v["cats"], float)}
        for k, v in per_image.items()
    }


def match_predictions_np(preds, gts, iou_min=0.1, iou_correct=0.7):
    """match_predictions_to_groundtruth (evaluation_utils.py:191-367),
    including its quirks: per-gt highest-score TP, `gt_idxs_processed`
    never updated (a detection can match several gts), and images absent
    from the prediction dict contribute no false negatives."""
    tp = {"boxes": [], "covs": [], "probs": [], "gt_boxes": [], "gt_cats": []}
    dup = {"boxes": [], "covs": [], "probs": [], "gt_boxes": [], "gt_cats": []}
    fp = {"boxes": [], "covs": [], "probs": []}
    fn = {"gt_boxes": [], "gt_cats": []}

    for key, pred in preds.items():
        if key not in gts:
            fp["boxes"].append(pred["boxes"])
            fp["probs"].append(pred["probs"])
            fp["covs"].append(pred["covs"])
            continue
        gt = gts[key]
        iou = pairwise_iou_np(gt["boxes"], pred["boxes"])  # (G, P)

        fn_mask = (iou <= iou_min).all(1)
        fn["gt_boxes"].append(gt["boxes"][fn_mask])
        fn["gt_cats"].append(gt["cats"][fn_mask])

        fp_mask = (iou <= iou_min).all(0)
        fp["boxes"].append(pred["boxes"][fp_mask])
        fp["probs"].append(pred["probs"][fp_mask])
        fp["covs"].append(pred["covs"][fp_mask])

        tp_pairs = np.argwhere(iou >= iou_correct)  # (n, 2): gt, det
        for i in range(gt["boxes"].shape[0]):
            gt_idxs = tp_pairs[tp_pairs[:, 0] == i][:, 1]
            if gt_idxs.shape[0] == 0:
                continue
            match_probs = pred["probs"][gt_idxs]
            max_scores = match_probs.max(1)
            order = np.argsort(-max_scores, kind="stable")
            max_idx, dup_idxs = order[0], order[1:]

            tp["boxes"].append(pred["boxes"][gt_idxs][max_idx : max_idx + 1])
            tp["probs"].append(match_probs[max_idx : max_idx + 1])
            tp["covs"].append(pred["covs"][gt_idxs][max_idx : max_idx + 1])
            tp["gt_boxes"].append(gt["boxes"][i : i + 1])
            tp["gt_cats"].append(gt["cats"][i : i + 1])
            if dup_idxs.shape[0] > 0:
                dup["boxes"].append(pred["boxes"][gt_idxs][dup_idxs])
                dup["probs"].append(match_probs[dup_idxs])
                dup["covs"].append(pred["covs"][gt_idxs][dup_idxs])
                dup["gt_boxes"].append(
                    np.repeat(gt["boxes"][i : i + 1], dup_idxs.shape[0], 0)
                )
                dup["gt_cats"].append(
                    np.repeat(gt["cats"][i : i + 1], dup_idxs.shape[0], 0)
                )

    def cat_or_empty(lst, width=None):
        arrs = [a for a in lst if len(a)]
        if not arrs:
            if width is None:
                return np.zeros((0,))
            return np.zeros((0,) + width)
        return np.concatenate(arrs, 0)

    return {
        "true_positives": {
            "predicted_box_means": cat_or_empty(tp["boxes"], (4,)),
            "predicted_box_covariances": cat_or_empty(tp["covs"], (4, 4)),
            "predicted_cls_probs": cat_or_empty(tp["probs"], (1,)),
            "gt_box_means": cat_or_empty(tp["gt_boxes"], (4,)),
            "gt_cat_idxs": cat_or_empty(tp["gt_cats"]),
        },
        "duplicates": {
            "predicted_box_means": cat_or_empty(dup["boxes"], (4,)),
            "predicted_box_covariances": cat_or_empty(dup["covs"], (4, 4)),
            "predicted_cls_probs": cat_or_empty(dup["probs"], (1,)),
            "gt_box_means": cat_or_empty(dup["gt_boxes"], (4,)),
            "gt_cat_idxs": cat_or_empty(dup["gt_cats"]),
        },
        "false_positives": {
            "predicted_box_means": cat_or_empty(fp["boxes"], (4,)),
            "predicted_box_covariances": cat_or_empty(fp["covs"], (4, 4)),
            "predicted_cls_probs": cat_or_empty(fp["probs"], (1,)),
        },
        "false_negatives": {
            "gt_box_means": cat_or_empty(fn["gt_boxes"], (4,)),
            "gt_cat_idxs": cat_or_empty(fn["gt_cats"]),
        },
    }


def probabilistic_metrics_np(matched, cat_mapping, eval_classes):
    """compute_probabilistic_metrics.main metric body (:89-205) +
    scoring_rules.py formulas, aggregated with nanmean over classes."""
    tp, fp = matched["true_positives"], matched["false_positives"]

    tp_conv = np.asarray(
        [cat_mapping[int(c)] for c in tp["gt_cat_idxs"]], np.int64
    ) if len(tp["gt_cat_idxs"]) else np.zeros((0,), np.int64)
    tp_score_of_gt = (
        tp["predicted_cls_probs"][np.arange(len(tp_conv)), tp_conv]
        if len(tp_conv)
        else np.zeros((0,))
    )
    fp_probs = fp["predicted_cls_probs"]
    fp_max = fp_probs.max(1) if len(fp_probs) else np.zeros((0,))
    fp_cats = fp_probs.argmax(1) if len(fp_probs) else np.zeros((0,), np.int64)

    def cls_ignorance(scores):
        # binary-multilabel ignorance of the correct category
        # (scoring_rules.py:6-42): mean of −log p
        if scores.shape[0] == 0:
            return None
        return float(np.mean(-np.log(scores)))

    def reg_ignorance(means, covs, gts):
        if means.shape[0] == 0:
            return None, None
        covs = covs + 1e-2 * np.eye(4)
        nll = []
        for m, c, g in zip(means, covs, gts):
            dist = torch.distributions.MultivariateNormal(
                torch.tensor(m), covariance_matrix=torch.tensor(c)
            )
            nll.append(-dist.log_prob(torch.tensor(g)).item())
        mse = float(np.mean((means - gts) ** 2))
        return float(np.mean(nll)), mse

    def fp_entropy(covs):
        if covs.shape[0] == 0:
            return None
        covs = covs + 1e-2 * np.eye(4)
        sign, logdet = np.linalg.slogdet(covs)
        ent = 0.5 * 4 * (1 + math.log(2 * math.pi)) + 0.5 * logdet
        return float(np.mean(ent))

    per_class = []
    for cls in eval_classes:
        tmask = tp_conv == cls
        fmask = fp_cats == cls
        nll, mse = reg_ignorance(
            tp["predicted_box_means"][tmask],
            tp["predicted_box_covariances"][tmask],
            tp["gt_box_means"][tmask],
        )
        per_class.append(
            {
                "tp_cls_ignorance": cls_ignorance(tp_score_of_gt[tmask]),
                "fp_cls_ignorance": cls_ignorance(1.0 - fp_max[fmask]),
                "tp_reg_ignorance": nll,
                "tp_reg_mse": mse,
                "fp_reg_entropy": fp_entropy(
                    fp["predicted_box_covariances"][fmask]
                ),
            }
        )

    def agg(key):
        vals = [c[key] for c in per_class if c[key] is not None]
        return float(np.nanmean(vals)) if vals else float("nan")

    return {
        "num_true_positives": int(len(tp["predicted_box_means"])),
        "num_false_positives": int(len(fp["predicted_box_means"])),
        "num_false_negatives": int(
            len(matched["false_negatives"]["gt_box_means"])
        ),
        "tp_cls_ignorance": agg("tp_cls_ignorance"),
        "tp_reg_ignorance": agg("tp_reg_ignorance"),
        "tp_reg_mse": agg("tp_reg_mse"),
        "fp_cls_ignorance": agg("fp_cls_ignorance"),
        "fp_reg_entropy": agg("fp_reg_entropy"),
    }
