"""Detection losses in pure JAX (XLA fuses these into the backward pass).

TPU-native equivalents of the fvcore/torch losses the reference exercises
(SURVEY.md §2.2):
  * sigmoid focal loss         (reference: probabilistic_retinanet.py:262-282)
  * smooth L1                  (reference: probabilistic_retinanet.py:298-331)
  * stochastic ("attenuated") focal loss — samples logits from the predicted
    logit Gaussian (reference: probabilistic_retinanet.py:228-268)
  * NLL box regression with log-variance clamp and annealed mixing with the
    standard loss (reference: probabilistic_retinanet.py:287-322)

All losses take explicit validity/positivity masks instead of boolean
indexing, keeping shapes static under jit.
"""

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """Elementwise focal loss on logits; `targets` is one-hot {0,1}."""
    p = jax.nn.sigmoid(logits)
    # Numerically-stable BCE-with-logits.
    ce = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    loss = ce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss
    return loss


def smooth_l1_loss(
    pred: jnp.ndarray, target: jnp.ndarray, beta: float = 0.0
) -> jnp.ndarray:
    """Elementwise smooth L1; beta=0 is pure L1 (the reference's setting,
    src/configs/Base-RetinaNet.yaml:14)."""
    diff = jnp.abs(pred - target)
    if beta <= 0.0:
        return diff
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def stochastic_focal_loss(
    rng: jax.Array,
    logits: jnp.ndarray,
    logit_log_vars: jnp.ndarray,
    targets: jnp.ndarray,
    valid_mask: jnp.ndarray,
    num_samples: int,
    alpha: float = 0.25,
    gamma: float = 2.0,
    shared_batch: bool = False,
    impl: str = "threefry",
) -> jnp.ndarray:
    """Loss-attenuation classification loss (Kendall & Gal NeurIPS'17).

    Samples `num_samples` logits per anchor from N(logit, exp(log_var)) and
    averages the focal loss over the sample axis (reference:
    probabilistic_retinanet.py:228-268, sample count from
    MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.NUM_SAMPLES). Returns the
    masked SUM over (anchors, classes), mean over samples — caller divides by
    the loss normalizer.

    The sample axis is a leading vmap-friendly axis; XLA keeps the whole
    (S, N, R, K) bank in registers/VMEM fused with the focal computation.

    The log-variance is clamped to ±10 (std ≤ e^5 logits) before exp — far
    outside any trained operating point, but it keeps the loss finite when
    training from a random (non-pretrained) backbone whose activation scale
    can push exp() past the f32 range. The reference has no clamp here but
    always initializes from ImageNet weights.

    impl: 'threefry' (sample bank inside the XLA graph) or 'pallas'
    (fused TPU kernel: hardware-PRNG samples + focal forward + analytic
    gradients in one VMEM pass — ops/pallas/focal.py). Identical
    per-element law; different PRNG stream. 'pallas' ignores
    `shared_batch` (its RNG is effectively free, so it always draws the
    reference-exact iid bank).
    """
    if impl == "pallas" and jax.default_backend() == "tpu":
        from pod_compare_tpu.ops.pallas.focal import (
            stochastic_focal_elem_pallas,
        )

        seed = jax.random.randint(
            rng, (), minval=-(2 ** 31), maxval=2 ** 31 - 1, dtype=jnp.int32
        )
        targets_b = jnp.broadcast_to(targets, logits.shape).astype(jnp.float32)
        loss_elem = stochastic_focal_elem_pallas(
            logits.astype(jnp.float32),
            logit_log_vars.astype(jnp.float32),
            targets_b, seed, num_samples, alpha, gamma,
        )
        return jnp.sum(jnp.where(valid_mask[..., None], loss_elem, 0.0))
    std = jnp.sqrt(jnp.exp(jnp.clip(logit_log_vars, -10.0, 10.0)))
    if shared_batch and logits.ndim == 3:
        # One (S, R, K) bank broadcast over the batch axis: per-anchor law
        # unchanged (iid over samples/anchors/classes), gradient estimator
        # unbiased, batch-size-times fewer threefry bits (the bank is
        # RNG-bound, DESIGN.md §5b). Drawn WITHOUT the size-1 axis and
        # broadcast, per the TPU tile-padding rule.
        noise = jax.random.normal(
            rng, (num_samples,) + logits.shape[1:], dtype=logits.dtype
        )[:, None]
    else:
        noise = jax.random.normal(
            rng, (num_samples,) + logits.shape, dtype=logits.dtype
        )
    stochastic_logits = logits[None] + noise * std[None]
    loss = sigmoid_focal_loss(stochastic_logits, targets[None], alpha, gamma)
    loss = jnp.where(valid_mask[None][..., None], loss, 0.0)
    return jnp.sum(loss) / num_samples


def nll_box_loss(
    pred_deltas: jnp.ndarray,
    gt_deltas: jnp.ndarray,
    pred_log_vars: jnp.ndarray,
    pos_mask: jnp.ndarray,
    beta: float = 0.0,
    log_var_clamp: float = 7.0,
) -> jnp.ndarray:
    """Diagonal-Gaussian NLL box loss: 0.5·exp(−s)·smoothL1 + 0.5·s, with
    s = log-variance clamped to ±`log_var_clamp`
    (reference: probabilistic_retinanet.py:287-307). Masked sum."""
    s = jnp.clip(pred_log_vars, -log_var_clamp, log_var_clamp)
    base = smooth_l1_loss(pred_deltas, gt_deltas, beta)
    loss = 0.5 * jnp.exp(-s) * base + 0.5 * s
    return jnp.sum(jnp.where(pos_mask[..., None], loss, 0.0))


def mvn_nll_box_loss(
    pred_deltas: jnp.ndarray,
    gt_deltas: jnp.ndarray,
    pred_cov_params: jnp.ndarray,
    pos_mask: jnp.ndarray,
    log_var_clamp: float = 7.0,
) -> jnp.ndarray:
    """Full-covariance multivariate-Gaussian NLL box loss (masked sum):

        0.5 · ‖L⁻¹ (gt − pred)‖² + Σᵢ log Lᵢᵢ

    with L the lower-triangular Cholesky factor built exactly as at
    inference (ops/gaussian.py::covariance_output_to_cholesky — diagonal
    sqrt(exp(sᵢ)), raw strict-lower-triangle; reference:
    modeling_utils.py:4-22). The log-variance channels are clamped to
    ±`log_var_clamp` like the diagonal path (probabilistic_retinanet.py:
    287-307). This EXCEEDS the reference: its full+NLL combination crashes
    (probabilistic_retinanet.py:287-307 binds `loss_box_reg` only for
    'diagonal'), so there is no reference formula to be bug-compatible
    with — the standard MVN NLL (up to the k/2·log 2π constant) is used.

    The 4×4 triangular solve is unrolled as forward substitution on
    unpacked channels — no (…, 4, 4) materialization (trailing dims of 4
    tile-pad 32× on TPU; cf. ops/boxes.py::pairwise_intersection).

    `pred_cov_params` is (..., 10): [s₁..s₄, l₂₁, l₃₁, l₃₂, l₄₁, l₄₂, l₄₃]
    (ops/gaussian.py::_TRIL_ROWS/_TRIL_COLS order).
    """
    s = jnp.clip(pred_cov_params[..., 0:4], -log_var_clamp, log_var_clamp)
    # L diagonal = sqrt(exp(s)) => log L_ii = s/2; solve scaled by
    # exp(-s/2) per row.
    inv_d = jnp.exp(-0.5 * s)
    d = gt_deltas - pred_deltas
    l21, l31, l32, l41, l42, l43 = (pred_cov_params[..., i] for i in range(4, 10))
    z1 = d[..., 0] * inv_d[..., 0]
    z2 = (d[..., 1] - l21 * z1) * inv_d[..., 1]
    z3 = (d[..., 2] - l31 * z1 - l32 * z2) * inv_d[..., 2]
    z4 = (d[..., 3] - l41 * z1 - l42 * z2 - l43 * z3) * inv_d[..., 3]
    maha = z1 * z1 + z2 * z2 + z3 * z3 + z4 * z4
    log_det_l = 0.5 * jnp.sum(s, axis=-1)
    loss = 0.5 * maha + log_det_l
    return jnp.sum(jnp.where(pos_mask, loss, 0.0))


def second_moment_matching_box_loss(
    pred_deltas: jnp.ndarray,
    gt_deltas: jnp.ndarray,
    pred_cov_params: jnp.ndarray,
    pos_mask: jnp.ndarray,
    beta: float = 0.0,
    log_var_clamp: float = 7.0,
) -> jnp.ndarray:
    """Second-moment-matching box loss (masked sum).

    smoothL1(μ, Δ) + smoothL1(Σ̂, (Δ−μ)²): the predicted variance is
    regressed onto the squared residual (its distribution-free target —
    E[(Δ−μ)²] IS the aleatoric variance), with the residual treated as a
    constant (stop_gradient) so the mean head is trained only by the
    first term. The reference names this loss in its configs
    (retinanet_R_50_FPN_1x_reg_cls_var.yaml:10) but raises ValueError on
    it (probabilistic_retinanet.py:307-310); semantics follow the
    authors' successor work ("Estimating and Evaluating Regression
    Predictive Uncertainty in Deep Object Detectors", ICLR 2021).

    Diagonal (4-param log-variance) heads match per-dim variances; full
    (10-param Cholesky) heads additionally match the off-diagonal
    second moments of LLᵀ against the residual outer product.
    """
    residual = jax.lax.stop_gradient(gt_deltas - pred_deltas)
    base = smooth_l1_loss(pred_deltas, gt_deltas, beta)
    if pred_cov_params.shape[-1] == 4:
        s = jnp.clip(pred_cov_params, -log_var_clamp, log_var_clamp)
        var_term = smooth_l1_loss(jnp.exp(s), residual * residual, beta)
        loss = jnp.sum(base + var_term, axis=-1)
    else:
        from pod_compare_tpu.ops.gaussian import covariance_output_to_cholesky

        params = pred_cov_params.at[..., 0:4].set(
            jnp.clip(pred_cov_params[..., 0:4], -log_var_clamp, log_var_clamp)
        )
        chol = covariance_output_to_cholesky(params)
        cov = jnp.einsum("...ij,...kj->...ik", chol, chol)
        outer = residual[..., :, None] * residual[..., None, :]
        mom_term = jnp.sum(smooth_l1_loss(cov, outer, beta), axis=(-2, -1))
        loss = jnp.sum(base, axis=-1) + mom_term
    return jnp.sum(jnp.where(pos_mask, loss, 0.0))


def energy_score_box_loss(
    rng: jax.Array,
    pred_deltas: jnp.ndarray,
    gt_deltas: jnp.ndarray,
    pred_cov_params: jnp.ndarray,
    pos_mask: jnp.ndarray,
    num_samples: int = 1000,
    beta: float = 0.0,
    log_var_clamp: float = 7.0,
    max_positives: int = 256,
    chunk: int = 50,
) -> jnp.ndarray:
    """Energy-score box loss (masked sum) — a proper scoring rule:

        ES = mean_i d(sᵢ, Δ) − 0.5 · mean_i d(sᵢ, s'ᵢ),
        sᵢ, s'ᵢ iid ~ N(μ, LLᵀ) via μ + L·z

    with d the smooth-L1 metric summed over the 4 box dims (the
    reference names 'energy_loss' in its configs,
    retinanet_R_50_FPN_1x_reg_cls_var.yaml:10, but raises ValueError on
    it, probabilistic_retinanet.py:307-310; semantics follow the
    authors' ICLR 2021 successor work, which uses exactly this
    sample-pair estimator with BBOX_COV_LOSS.NUM_SAMPLES draws).

    TPU shape discipline: the (S≈1000, B, R, 4) bank over ALL anchors
    would be terabytes, and boolean-gathering positives is dynamic. So
    positives are gathered into `max_positives` STATIC slots per image
    (top-k on the mask; BDD averages well under 100 positives/batch-row
    — overflow beyond the cap is dropped deterministically), and the
    sample mean is accumulated by a `lax.scan` over chunks of `chunk`+1
    draws (peak memory = one chunk, not the bank). Each chunk's first
    `chunk` samples feed the attraction term and consecutive pairs feed
    the repulsion term — all draws iid, so the estimator is unbiased.
    Diagonal heads sample with σ = exp(s/2); full heads through the
    10-param Cholesky.
    """
    from pod_compare_tpu.ops.gaussian import covariance_output_to_cholesky

    score = pos_mask.astype(jnp.float32)
    max_positives = min(max_positives, score.shape[-1])
    _, idx = jax.lax.top_k(score, max_positives)  # (B, P)
    weight = jnp.take_along_axis(score, idx, axis=1)  # (B, P) in {0, 1}

    def take(x):
        return jnp.take_along_axis(x, idx[..., None], axis=1)

    mu = take(pred_deltas)  # (B, P, 4)
    gt = take(gt_deltas)
    cov = take(pred_cov_params)
    if cov.shape[-1] == 4:
        scale = jnp.exp(0.5 * jnp.clip(cov, -log_var_clamp, log_var_clamp))

        def push(z):
            return mu[None] + z * scale[None]
    else:
        params = cov.at[..., 0:4].set(
            jnp.clip(cov[..., 0:4], -log_var_clamp, log_var_clamp)
        )
        chol = covariance_output_to_cholesky(params)

        def push(z):
            return mu[None] + jnp.einsum("...ij,s...j->s...i", chol, z)

    n_chunks = -(-num_samples // chunk)

    def body(carry, key):
        attract_sum, repulse_sum = carry
        z = jax.random.normal(
            key, (chunk + 1,) + mu.shape, dtype=mu.dtype
        )
        samples = push(z)  # (chunk+1, B, P, 4)
        attract = jnp.sum(
            smooth_l1_loss(samples[:chunk], gt[None], beta), axis=-1
        ).sum(axis=0)
        repulse = jnp.sum(
            smooth_l1_loss(samples[:chunk], samples[1:], beta), axis=-1
        ).sum(axis=0)
        return (attract_sum + attract, repulse_sum + repulse), None

    init = (jnp.zeros(mu.shape[:2], mu.dtype),) * 2
    (attract_sum, repulse_sum), _ = jax.lax.scan(
        body, init, jax.random.split(rng, n_chunks)
    )
    n = float(n_chunks * chunk)
    loss = attract_sum / n - 0.5 * repulse_sum / n
    return jnp.sum(loss * weight)


def annealing_weight(step: jnp.ndarray, annealing_step: int) -> jnp.ndarray:
    """Exponential probabilistic-loss annealing: (100^w − 1)/99 with
    w = min(1, step/annealing_step) (reference:
    probabilistic_retinanet.py:313-321; annealing_step = SOLVER.STEPS[1])."""
    w = jnp.minimum(1.0, step / float(max(annealing_step, 1)))
    return (jnp.power(100.0, w) - 1.0) / 99.0


def masked_sum_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    valid_mask: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """Standard (non-stochastic) focal loss, masked sum over anchors/classes
    (reference: probabilistic_retinanet.py:276-282)."""
    loss = sigmoid_focal_loss(logits, targets, alpha, gamma)
    return jnp.sum(jnp.where(valid_mask[..., None], loss, 0.0))


def masked_sum_smooth_l1(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    pos_mask: jnp.ndarray,
    beta: float = 0.0,
) -> jnp.ndarray:
    """Smooth-L1 box loss, masked sum (reference:
    probabilistic_retinanet.py:314-331)."""
    loss = smooth_l1_loss(pred, target, beta)
    return jnp.sum(jnp.where(pos_mask[..., None], loss, 0.0))


def ema_loss_normalizer(
    normalizer: jnp.ndarray,
    num_pos: jnp.ndarray,
    momentum: float = 0.9,
) -> jnp.ndarray:
    """EMA of the positive-anchor count used to normalize both losses
    (detectron2 RetinaNet semantics, exercised at
    reference: probabilistic_retinanet.py:201-203)."""
    return momentum * normalizer + (1.0 - momentum) * jnp.maximum(num_pos, 1.0)
