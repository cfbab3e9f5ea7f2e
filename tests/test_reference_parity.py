"""Parity tests against independently-written oracles of the reference's
inference math (SURVEY.md §7 'stochastic parity': deterministic sub-paths
match exactly; sampling-based paths match statistically).

Oracle formulas re-derived from reference: probabilistic_inference.py
178-388 (anchorwise inference), inference_utils.py:12-54 (standard NMS).
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from pod_compare_tpu.inference.core import probabilistic_inference_core
from pod_compare_tpu.inference.modes import standard_nms


def synth_outputs(rng, R=120, K=6):
    anchors_xy = rng.rand(R, 2).astype(np.float32) * 300
    anchors_wh = rng.rand(R, 2).astype(np.float32) * 40 + 20
    anchors = np.concatenate([anchors_xy, anchors_xy + anchors_wh], 1)
    box_cls = (rng.randn(R, K) * 2 - 3).astype(np.float32)
    box_cls[rng.choice(R, 10, replace=False), rng.randint(0, K, 10)] = 3.0
    box_delta = (rng.randn(R, 4) * 0.1).astype(np.float32)
    box_cls_var = (rng.randn(R, K) - 4).astype(np.float32)
    box_reg_var = (rng.randn(R, 4) - 2).astype(np.float32)
    return anchors, box_cls, box_delta, box_cls_var, box_reg_var


def oracle_decode(deltas, anchors):
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    ax = anchors[:, 0] + aw / 2
    ay = anchors[:, 1] + ah / 2
    dx, dy, dw, dh = deltas.T
    dw = np.minimum(dw, np.log(1000.0 / 16))
    dh = np.minimum(dh, np.log(1000.0 / 16))
    cx, cy = dx * aw + ax, dy * ah + ay
    w, h = np.exp(dw) * aw, np.exp(dh) * ah
    return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], 1)


def test_deterministic_candidate_path_exact(rng):
    """No variance heads: sigmoid→topk→threshold→decode must match the
    numpy oracle exactly."""
    anchors, box_cls, box_delta, _, _ = synth_outputs(rng)
    topk = 50
    cands = probabilistic_inference_core(
        jax.random.PRNGKey(0), jnp.asarray(anchors), jnp.asarray(box_cls),
        jnp.asarray(box_delta), None, None, None,
        topk=topk, score_thresh=0.05, cls_num_samples=10, box_num_samples=10,
    )
    probs = 1 / (1 + np.exp(-box_cls))
    top_scores = probs.max(1)
    order = np.argsort(-top_scores, kind="stable")[:topk]
    np.testing.assert_allclose(
        np.asarray(cands.scores), top_scores[order], rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(cands.classes), probs.argmax(1)[order]
    )
    np.testing.assert_array_equal(
        np.asarray(cands.valid), top_scores[order] > 0.05
    )
    np.testing.assert_allclose(
        np.asarray(cands.boxes),
        oracle_decode(box_delta[order], anchors[order]),
        rtol=1e-4, atol=1e-2,
    )


def test_cls_var_sampling_statistical(rng):
    """MC-sampled sigmoid probabilities converge to the torch oracle's
    estimate of E[sigmoid(N(logit, sqrt(exp(var))))]."""
    anchors, box_cls, box_delta, box_cls_var, _ = synth_outputs(rng)
    cands = probabilistic_inference_core(
        jax.random.PRNGKey(0), jnp.asarray(anchors), jnp.asarray(box_cls),
        jnp.asarray(box_delta), jnp.asarray(box_cls_var), None, None,
        topk=120, score_thresh=0.0, cls_num_samples=4000, box_num_samples=10,
    )
    # torch oracle with its own RNG (reference formula,
    # probabilistic_inference.py:289-295)
    dist = torch.distributions.Normal(
        torch.tensor(box_cls),
        scale=torch.sqrt(torch.exp(torch.tensor(box_cls_var))),
    )
    torch.manual_seed(0)
    oracle_probs = torch.sigmoid(dist.rsample((4000,))).mean(0).numpy()
    # match candidates back to anchors via anchor_idx (candidate order is
    # by the SAMPLED scores, which differ from plain sigmoid ranking)
    ours = np.asarray(cands.prob_vectors)
    anchor_idx = np.asarray(cands.anchor_idx)
    np.testing.assert_allclose(ours, oracle_probs[anchor_idx], atol=0.03)


def test_box_sampling_statistical(rng):
    """Sampled box mean/covariance match an independent torch MVN sampling
    chain (reference: probabilistic_inference.py:344-374). Log-variances
    kept moderate: the decoded w/h are lognormal, so wild variances make
    any finite-sample mean estimate unstable."""
    anchors, box_cls, box_delta, _, box_reg_var = synth_outputs(rng, R=40)
    box_reg_var = (box_reg_var * 0.3 - 2.0).astype(np.float32)
    S = 8000
    cands = probabilistic_inference_core(
        jax.random.PRNGKey(1), jnp.asarray(anchors), jnp.asarray(box_cls),
        jnp.asarray(box_delta), None, jnp.asarray(box_reg_var), None,
        topk=40, score_thresh=0.0, cls_num_samples=4, box_num_samples=S,
    )
    idx = np.asarray(cands.anchor_idx)

    # torch oracle: sample deltas from N(delta, diag(exp(var))), decode,
    # compute mean/covariance with the unbiased divisor.
    torch.manual_seed(0)
    chol = torch.diag_embed(
        torch.sqrt(torch.exp(torch.tensor(box_reg_var[idx])))
    )
    mvn = torch.distributions.MultivariateNormal(
        torch.tensor(box_delta[idx]), scale_tril=chol
    )
    samples = mvn.rsample((S,)).numpy()  # (S, N, 4)
    decoded = np.stack(
        [oracle_decode(samples[s], anchors[idx]) for s in range(S)]
    )
    oracle_mean = decoded.mean(0)

    ours_boxes = np.asarray(cands.boxes)
    np.testing.assert_allclose(ours_boxes, oracle_mean, rtol=0.05, atol=1.0)
    # covariance diagonal magnitudes agree statistically
    oracle_var = decoded.var(0, ddof=1)
    ours_var = np.diagonal(np.asarray(cands.covs), axis1=1, axis2=2)
    np.testing.assert_allclose(ours_var, oracle_var, rtol=0.3, atol=0.5)


def test_standard_nms_detections_exact(rng):
    """Full deterministic standard_nms chain matches a python oracle:
    NMS keep order + top-k truncation (inference_utils.py:12-54)."""
    anchors, box_cls, box_delta, _, _ = synth_outputs(rng)
    cands = probabilistic_inference_core(
        jax.random.PRNGKey(0), jnp.asarray(anchors), jnp.asarray(box_cls),
        jnp.asarray(box_delta), None, None, None,
        topk=120, score_thresh=0.05, cls_num_samples=2, box_num_samples=2,
    )
    det = standard_nms(cands, 0.5, 20)

    boxes = np.asarray(cands.boxes)
    scores = np.asarray(cands.scores)
    classes = np.asarray(cands.classes)
    valid = np.asarray(cands.valid)

    # python greedy class-aware NMS oracle
    def iou(a, b):
        lt = np.maximum(a[:2], b[:2]); rb = np.minimum(a[2:], b[2:])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[0] * wh[1]
        u = (a[2]-a[0])*(a[3]-a[1]) + (b[2]-b[0])*(b[3]-b[1]) - inter
        return inter / u if u > 0 else 0.0

    order = np.argsort(-scores, kind="stable")
    keep, dead = [], set()
    for i in order:
        if not valid[i] or i in dead:
            continue
        keep.append(i)
        for j in order:
            if j not in dead and valid[j] and classes[j] == classes[i]:
                if iou(boxes[i], boxes[j]) > 0.5:
                    dead.add(j)
    keep = keep[:20]

    got = np.asarray(det.valid)
    np.testing.assert_array_equal(
        np.asarray(det.boxes)[got], boxes[np.asarray(keep)]
    )
    np.testing.assert_allclose(
        np.asarray(det.scores)[got], scores[np.asarray(keep)], rtol=1e-6
    )
