"""Loss tests against torch/fvcore-formula oracles (SURVEY.md §2.2)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from pod_compare_tpu.ops import losses as L


def torch_sigmoid_focal_loss(logits, targets, alpha=0.25, gamma=2.0):
    """Direct port of fvcore.nn.sigmoid_focal_loss (the reference's provider)."""
    p = torch.sigmoid(logits)
    ce = F.binary_cross_entropy_with_logits(logits, targets, reduction="none")
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss


def test_focal_loss_matches_fvcore(rng):
    logits = rng.randn(40, 7).astype(np.float32) * 3
    targets = (rng.rand(40, 7) > 0.8).astype(np.float32)
    ours = np.asarray(L.sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets)))
    ref = torch_sigmoid_focal_loss(torch.tensor(logits), torch.tensor(targets)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_smooth_l1_matches_fvcore(rng):
    pred = rng.randn(30, 4).astype(np.float32)
    target = rng.randn(30, 4).astype(np.float32)
    for beta in [0.0, 0.5]:
        ours = np.asarray(
            L.smooth_l1_loss(jnp.asarray(pred), jnp.asarray(target), beta)
        )
        diff = torch.abs(torch.tensor(pred) - torch.tensor(target))
        if beta == 0.0:
            ref = diff
        else:
            ref = torch.where(diff < beta, 0.5 * diff ** 2 / beta, diff - 0.5 * beta)
        np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5, atol=1e-6)


def test_nll_box_loss_matches_reference_formula(rng):
    """0.5·exp(−s)·|x−t| + 0.5·s with s clamped ±7
    (probabilistic_retinanet.py:287-307)."""
    pred = rng.randn(20, 4).astype(np.float32)
    target = rng.randn(20, 4).astype(np.float32)
    log_var = (rng.randn(20, 4) * 5).astype(np.float32)
    pos = rng.rand(20) > 0.3

    ours = float(
        L.nll_box_loss(
            jnp.asarray(pred), jnp.asarray(target), jnp.asarray(log_var),
            jnp.asarray(pos), beta=0.0,
        )
    )
    s = torch.clamp(torch.tensor(log_var[pos]), -7.0, 7.0)
    base = torch.abs(torch.tensor(pred[pos]) - torch.tensor(target[pos]))
    ref = float((0.5 * torch.exp(-s) * base + 0.5 * s).sum())
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_annealing_weight_endpoints():
    """(100^w − 1)/99 (probabilistic_retinanet.py:320-321)."""
    assert float(L.annealing_weight(jnp.asarray(0.0), 80000)) == 0.0
    np.testing.assert_allclose(float(L.annealing_weight(jnp.asarray(80000.0), 80000)), 1.0)
    np.testing.assert_allclose(float(L.annealing_weight(jnp.asarray(100000.0), 80000)), 1.0)
    w = float(L.annealing_weight(jnp.asarray(40000.0), 80000))
    np.testing.assert_allclose(w, (100 ** 0.5 - 1) / 99, rtol=1e-5)


def test_stochastic_focal_loss_converges_to_deterministic(rng):
    """With log-var → −inf the stochastic loss equals the plain focal loss."""
    logits = rng.randn(3, 10, 7).astype(np.float32)
    targets = (rng.rand(3, 10, 7) > 0.8).astype(np.float32)
    valid = np.ones((3, 10), bool)
    log_vars = np.full((3, 10, 7), -40.0, np.float32)

    stoch = float(
        L.stochastic_focal_loss(
            jax.random.PRNGKey(0), jnp.asarray(logits), jnp.asarray(log_vars),
            jnp.asarray(targets), jnp.asarray(valid), num_samples=4,
        )
    )
    det = float(
        L.masked_sum_focal_loss(
            jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(valid)
        )
    )
    np.testing.assert_allclose(stoch, det, rtol=1e-3)


def test_stochastic_focal_loss_respects_mask(rng):
    logits = rng.randn(2, 6, 7).astype(np.float32)
    targets = (rng.rand(2, 6, 7) > 0.8).astype(np.float32)
    log_vars = rng.randn(2, 6, 7).astype(np.float32)
    all_valid = np.ones((2, 6), bool)
    none_valid = np.zeros((2, 6), bool)
    key = jax.random.PRNGKey(1)
    full = float(
        L.stochastic_focal_loss(
            key, jnp.asarray(logits), jnp.asarray(log_vars), jnp.asarray(targets),
            jnp.asarray(all_valid), 3,
        )
    )
    empty = float(
        L.stochastic_focal_loss(
            key, jnp.asarray(logits), jnp.asarray(log_vars), jnp.asarray(targets),
            jnp.asarray(none_valid), 3,
        )
    )
    assert full > 0 and empty == 0.0


def test_ema_loss_normalizer():
    out = float(L.ema_loss_normalizer(jnp.asarray(100.0), jnp.asarray(40.0), 0.9))
    np.testing.assert_allclose(out, 0.9 * 100 + 0.1 * 40)
    # max(num_pos, 1) guard
    out = float(L.ema_loss_normalizer(jnp.asarray(100.0), jnp.asarray(0.0), 0.9))
    np.testing.assert_allclose(out, 0.9 * 100 + 0.1 * 1.0)


def test_stochastic_focal_shared_batch_law(rng):
    """SHARED_BATCH_SAMPLES: at B=1 the shared bank is the SAME draw as
    iid (identical threefry count => identical values), and at B>1 every
    image's loss equals a B=1 iid evaluation with the shared bank's noise
    — i.e. the per-image law is unchanged, only cross-image correlation
    appears."""
    S, B, R, K = 4, 3, 11, 2
    key = jax.random.PRNGKey(5)
    logits = jnp.asarray(rng.randn(B, R, K).astype(np.float32))
    log_vars = jnp.asarray(rng.randn(B, R, K).astype(np.float32) * 0.3)
    targets = jnp.asarray((rng.rand(B, R, K) < 0.3).astype(np.float32))
    valid = jnp.asarray(rng.rand(B, R) < 0.8)

    iid_b1 = float(L.stochastic_focal_loss(
        key, logits[:1], log_vars[:1], targets[:1], valid[:1], S))
    shared_b1 = float(L.stochastic_focal_loss(
        key, logits[:1], log_vars[:1], targets[:1], valid[:1], S,
        shared_batch=True))
    np.testing.assert_allclose(shared_b1, iid_b1, rtol=1e-6)

    total = float(L.stochastic_focal_loss(
        key, logits, log_vars, targets, valid, S, shared_batch=True))
    per_image = sum(
        float(L.stochastic_focal_loss(
            key, logits[i:i + 1], log_vars[i:i + 1], targets[i:i + 1],
            valid[i:i + 1], S, shared_batch=True))
        for i in range(B)
    )
    np.testing.assert_allclose(total, per_image, rtol=1e-5)


def test_second_moment_matching_optimum(rng):
    """SMM is minimized (in the variance head) when exp(s) equals the
    squared residual — its distribution-free target. The reference names
    this loss but raises ValueError on it (probabilistic_retinanet.py:
    307-310)."""
    B, R = 2, 9
    pred = jnp.asarray(rng.randn(B, R, 4).astype(np.float32))
    gt = pred + jnp.asarray(rng.randn(B, R, 4).astype(np.float32) * 0.5)
    pos = jnp.ones((B, R), bool)
    resid_sq = np.asarray(gt - pred) ** 2

    s_opt = jnp.asarray(np.log(np.maximum(resid_sq, 1e-8)))
    at_opt = float(L.second_moment_matching_box_loss(pred, gt, s_opt, pos))
    for delta in (-0.7, 0.9):
        off = float(
            L.second_moment_matching_box_loss(pred, gt, s_opt + delta, pos)
        )
        assert off > at_opt, (off, at_opt)
    # the variance term must NOT backprop into the mean head (residual is
    # stop_gradient'ed): grad wrt pred equals the plain smooth-L1 grad
    g_smm = jax.grad(
        lambda p: L.second_moment_matching_box_loss(p, gt, s_opt, pos)
    )(pred)
    g_l1 = jax.grad(
        lambda p: jnp.sum(jnp.where(pos[..., None], L.smooth_l1_loss(p, gt), 0.0))
    )(pred)
    np.testing.assert_allclose(np.asarray(g_smm), np.asarray(g_l1), atol=1e-5)


def test_energy_score_prefers_truth(rng):
    """The energy score is a proper scoring rule: with enough samples,
    the true (mu, sigma) scores better than wrong means or wildly wrong
    scales. (The reference names 'energy_loss' but raises ValueError.)"""
    B, R = 1, 64
    true_sigma = 0.8
    mu = jnp.asarray(rng.randn(B, R, 4).astype(np.float32))
    gt = mu + jnp.asarray(
        (rng.randn(B, R, 4) * true_sigma).astype(np.float32)
    )
    pos = jnp.ones((B, R), bool)
    key = jax.random.PRNGKey(3)

    def es(pred_mu, log_var):
        s = jnp.full((B, R, 4), log_var, jnp.float32)
        return float(L.energy_score_box_loss(
            key, pred_mu, gt, s, pos, num_samples=600, max_positives=64,
        )) / (B * R)

    at_truth = es(mu, float(np.log(true_sigma ** 2)))
    assert es(mu + 3.0, float(np.log(true_sigma ** 2))) > at_truth
    assert es(mu, float(np.log(25.0))) > at_truth  # sigma 5 >> 0.8
    assert es(mu, float(np.log(1e-4))) > at_truth  # sigma ~0 (overconfident)


def test_compute_losses_routes_new_cov_losses(rng):
    """compute_losses dispatches second_moment_matching and energy_loss
    (diagonal + full heads) with finite values and gradients."""
    from pod_compare_tpu.ops.anchors import AnchorGenerator  # noqa: F401
    from pod_compare_tpu.train.loss import LossConfig, compute_losses

    B, R, K = 2, 24, 3
    anchors = jnp.asarray(
        np.stack([
            np.array([i * 4.0, i * 3.0, i * 4.0 + 16, i * 3.0 + 16],
                     np.float32)
            for i in range(R)
        ])
    )
    gt_boxes = jnp.asarray(
        np.tile(np.array([[4.0, 2.0, 30.0, 28.0]], np.float32), (B, 2, 1))
    )
    gt_classes = jnp.zeros((B, 2), jnp.int32)
    gt_valid = jnp.ones((B, 2), bool)

    for name, cov_dims in [
        ("second_moment_matching", 4), ("second_moment_matching", 10),
        ("energy_loss", 4), ("energy_loss", 10),
    ]:
        lc = LossConfig(
            num_classes=K, bbox_cov_loss=name,
            bbox_cov_type="full" if cov_dims == 10 else "diagonal",
            bbox_cov_num_samples=40, annealing_step=1,
        )
        outputs = {
            "box_cls": jnp.asarray(rng.randn(B, R, K).astype(np.float32) - 3),
            "box_delta": jnp.asarray(
                rng.randn(B, R, 4).astype(np.float32) * 0.1),
            "box_cls_var": None,
            "box_reg_var": jnp.asarray(
                rng.randn(B, R, cov_dims).astype(np.float32) * 0.3 - 1),
        }

        def f(var):
            o = dict(outputs)
            o["box_reg_var"] = var
            losses, _ = compute_losses(
                jax.random.PRNGKey(0), o, anchors, gt_boxes, gt_classes,
                gt_valid, jnp.asarray(10.0), jnp.asarray(5, jnp.int32), lc,
            )
            return losses["loss_box_reg"]

        val, grad = jax.value_and_grad(f)(outputs["box_reg_var"])
        assert np.isfinite(float(val)), (name, cov_dims)
        assert np.isfinite(np.asarray(grad)).all(), (name, cov_dims)


def test_mvn_nll_box_loss_matches_torch_mvn(rng):
    """Full-covariance NLL == -log N(Δ; 0, LLᵀ) − (k/2)·log 2π summed over
    positives, with L built exactly as covariance_output_to_cholesky
    (exceed-the-reference: its full+NLL path crashes,
    probabilistic_retinanet.py:287-307)."""
    from pod_compare_tpu.ops.gaussian import covariance_output_to_cholesky

    B, R = 3, 17
    pred = jnp.asarray(rng.randn(B, R, 4).astype(np.float32))
    gt = jnp.asarray(rng.randn(B, R, 4).astype(np.float32))
    params = rng.randn(B, R, 10).astype(np.float32)
    params[..., 0:4] *= 0.5  # log-variances in a sane range
    params[..., 4:] *= 0.3
    pos = rng.rand(B, R) < 0.4
    got = float(
        L.mvn_nll_box_loss(pred, gt, jnp.asarray(params), jnp.asarray(pos))
    )

    chol = np.asarray(covariance_output_to_cholesky(jnp.asarray(params)))
    mvn = torch.distributions.MultivariateNormal(
        loc=torch.as_tensor(np.asarray(pred)),
        scale_tril=torch.as_tensor(chol),
    )
    logpdf = mvn.log_prob(torch.as_tensor(np.asarray(gt))).numpy()
    want = float((-logpdf[pos] - 2.0 * np.log(2 * np.pi)).sum())
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_mvn_nll_clamps_and_stays_finite(rng):
    """Extreme log-variances are clamped (±7, like the diagonal path) and
    gradients stay finite."""
    pred = jnp.zeros((1, 5, 4))
    gt = jnp.ones((1, 5, 4)) * 3.0
    params = np.zeros((1, 5, 10), np.float32)
    params[..., 0] = -40.0  # would be exp(40) precision without clamping
    params[..., 1] = 40.0
    pos = jnp.ones((1, 5), bool)

    def f(p):
        return L.mvn_nll_box_loss(pred, gt, p, pos)

    val, grad = jax.value_and_grad(f)(jnp.asarray(params))
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all()
