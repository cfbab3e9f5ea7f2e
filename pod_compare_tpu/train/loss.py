"""Training loss assembly for the probabilistic RetinaNet.

Replicates the reference's loss pipeline as one fused, maskable computation
(reference: probabilistic_retinanet.py:168-333):
  * focal classification loss, optionally sampled ("loss attenuation") from
    the predicted logit Gaussians
  * smooth-L1 box regression, optionally the diagonal-Gaussian NLL with the
    exponential annealing schedule (annealing_step = SOLVER.STEPS[1],
    probabilistic_retinanet.py:49-50)
  * EMA loss normalizer over the batch positive-anchor count
    (probabilistic_retinanet.py:199-203)

Everything takes padded ground truth with validity masks; num_pos and the
normalizer are global sums, so under data-parallel jit XLA inserts the
cross-device psum automatically.
"""

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from pod_compare_tpu.ops import losses as L
from pod_compare_tpu.ops.boxes import encode_deltas
from pod_compare_tpu.ops.matcher import label_anchors_batch


class LossConfig(NamedTuple):
    num_classes: int
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    smooth_l1_beta: float = 0.0
    iou_thresholds: Tuple[float, float] = (0.4, 0.5)
    cls_var_loss: str = "none"  # 'none' | 'loss_attenuation'
    cls_var_num_samples: int = 10
    cls_var_shared_batch: bool = False
    # 'threefry' | 'pallas' (fused TPU kernel; falls back to threefry
    # off-TPU — ops/pallas/focal.py)
    cls_var_impl: str = "threefry"
    # 'none' | 'negative_log_likelihood' | 'second_moment_matching' |
    # 'energy_loss'
    bbox_cov_loss: str = "none"
    bbox_cov_type: str = "diagonal"  # 'diagonal' | 'full'
    bbox_cov_num_samples: int = 1000
    annealing_step: int = 80000
    loss_normalizer_momentum: float = 0.9
    box_reg_weights: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)

    @classmethod
    def from_config(cls, cfg) -> "LossConfig":
        pm = cfg.MODEL.PROBABILISTIC_MODELING
        annealing = pm.ANNEALING_STEP or cfg.SOLVER.STEPS[1]
        return cls(
            num_classes=cfg.MODEL.RETINANET.NUM_CLASSES,
            focal_alpha=cfg.MODEL.RETINANET.FOCAL_LOSS_ALPHA,
            focal_gamma=cfg.MODEL.RETINANET.FOCAL_LOSS_GAMMA,
            smooth_l1_beta=cfg.MODEL.RETINANET.SMOOTH_L1_LOSS_BETA,
            iou_thresholds=tuple(cfg.MODEL.RETINANET.IOU_THRESHOLDS),
            cls_var_loss=pm.CLS_VAR_LOSS.NAME,
            cls_var_num_samples=pm.CLS_VAR_LOSS.NUM_SAMPLES,
            cls_var_shared_batch=pm.CLS_VAR_LOSS.SHARED_BATCH_SAMPLES,
            cls_var_impl=pm.CLS_VAR_LOSS.IMPL,
            bbox_cov_loss=pm.BBOX_COV_LOSS.NAME,
            bbox_cov_type=pm.BBOX_COV_LOSS.COVARIANCE_TYPE,
            bbox_cov_num_samples=pm.BBOX_COV_LOSS.NUM_SAMPLES,
            annealing_step=annealing,
            loss_normalizer_momentum=cfg.MODEL.RETINANET.LOSS_NORMALIZER_MOMENTUM,
            box_reg_weights=tuple(cfg.MODEL.RETINANET.BBOX_REG_WEIGHTS),
        )


def compute_losses(
    rng: jax.Array,
    outputs: Dict[str, Optional[jnp.ndarray]],
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_classes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    loss_normalizer: jnp.ndarray,
    step: jnp.ndarray,
    lc: LossConfig,
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """Compute {loss_cls, loss_box_reg} and the updated loss normalizer.

    Args:
        outputs: head outputs (B, R, ·).
        anchors: (R, 4) static anchors.
        gt_*: padded per-image ground truth.
        loss_normalizer: EMA carry.
        step: current iteration (for annealing).
    """
    rng, rng_box = jax.random.split(rng)
    labels = label_anchors_batch(
        anchors, gt_boxes, gt_classes, gt_valid, lc.num_classes,
        lc.iou_thresholds,
    )
    anchor_classes = labels.gt_classes  # (B, R)
    valid_mask = anchor_classes >= 0
    pos_mask = (anchor_classes >= 0) & (anchor_classes != lc.num_classes)
    num_pos = jnp.sum(pos_mask.astype(jnp.float32))

    new_normalizer = L.ema_loss_normalizer(
        loss_normalizer, num_pos, lc.loss_normalizer_momentum
    )
    norm = jnp.maximum(1.0, new_normalizer)

    # One-hot targets without a background column; ignore/-1 handled by the
    # valid mask (background rows become all-zero).
    targets = jax.nn.one_hot(
        jnp.clip(anchor_classes, 0, lc.num_classes), lc.num_classes + 1
    )[..., :-1]

    logits = outputs["box_cls"]
    if lc.cls_var_loss == "loss_attenuation":
        assert outputs["box_cls_var"] is not None, (
            "loss_attenuation requires the cls_var head"
        )
        loss_cls = (
            L.stochastic_focal_loss(
                rng, logits, outputs["box_cls_var"], targets, valid_mask,
                lc.cls_var_num_samples, lc.focal_alpha, lc.focal_gamma,
                shared_batch=lc.cls_var_shared_batch,
                impl=lc.cls_var_impl,
            )
            / norm
        )
    elif lc.cls_var_loss == "none":
        loss_cls = (
            L.masked_sum_focal_loss(
                logits, targets, valid_mask, lc.focal_alpha, lc.focal_gamma
            )
            / norm
        )
    else:
        raise ValueError(f"Invalid classification loss name {lc.cls_var_loss}.")

    gt_deltas = encode_deltas(
        anchors[None], labels.matched_boxes, lc.box_reg_weights
    )
    pred_deltas = outputs["box_delta"]
    standard_reg = (
        L.masked_sum_smooth_l1(pred_deltas, gt_deltas, pos_mask, lc.smooth_l1_beta)
        / norm
    )
    if lc.bbox_cov_loss == "negative_log_likelihood":
        assert outputs["box_reg_var"] is not None, (
            "negative_log_likelihood requires the bbox_cov head"
        )
        if lc.bbox_cov_type == "full" and outputs["box_reg_var"].shape[-1] == 10:
            # True MVN NLL over the 10-param Cholesky head. The reference
            # CRASHES on full+NLL (probabilistic_retinanet.py:287-307 binds
            # loss_box_reg only for 'diagonal') — this exceeds it.
            nll = (
                L.mvn_nll_box_loss(
                    pred_deltas, gt_deltas, outputs["box_reg_var"], pos_mask,
                )
                / norm
            )
        else:
            nll = (
                L.nll_box_loss(
                    pred_deltas, gt_deltas, outputs["box_reg_var"][..., 0:4],
                    pos_mask, lc.smooth_l1_beta,
                )
                / norm
            )
        w = L.annealing_weight(step.astype(jnp.float32), lc.annealing_step)
        loss_box_reg = (1.0 - w) * standard_reg + w * nll
    elif lc.bbox_cov_loss in ("second_moment_matching", "energy_loss"):
        # Named in the reference's configs but unimplemented there (its
        # loss dispatch raises ValueError, probabilistic_retinanet.py:
        # 307-310) — implemented here per the authors' ICLR 2021
        # successor semantics; annealed like the NLL path.
        assert outputs["box_reg_var"] is not None, (
            f"{lc.bbox_cov_loss} requires the bbox_cov head"
        )
        if lc.bbox_cov_loss == "second_moment_matching":
            prob = (
                L.second_moment_matching_box_loss(
                    pred_deltas, gt_deltas, outputs["box_reg_var"],
                    pos_mask, lc.smooth_l1_beta,
                )
                / norm
            )
        else:
            prob = (
                L.energy_score_box_loss(
                    rng_box, pred_deltas, gt_deltas, outputs["box_reg_var"],
                    pos_mask, lc.bbox_cov_num_samples, lc.smooth_l1_beta,
                )
                / norm
            )
        w = L.annealing_weight(step.astype(jnp.float32), lc.annealing_step)
        loss_box_reg = (1.0 - w) * standard_reg + w * prob
    elif lc.bbox_cov_loss == "none":
        loss_box_reg = standard_reg
    else:
        raise ValueError(f"Invalid regression loss name {lc.bbox_cov_loss}.")

    losses = {
        "loss_cls": loss_cls,
        "loss_box_reg": loss_box_reg,
        "num_pos_anchors": num_pos / gt_boxes.shape[0],
    }
    return losses, new_normalizer
