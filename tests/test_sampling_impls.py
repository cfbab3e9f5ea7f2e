"""Tests for the TPU-native sampling implementations of the candidate core:
analytic (closed-form) decode moments, Gauss-Hermite sigmoid expectations,
shared sample banks, and batch-shared MC-dropout masks.

Each alternative must agree with the reference's Monte-Carlo semantics
(probabilistic_inference.py:289-374) in the S→∞ limit: the analytic paths
are checked against large-sample numpy oracles, the shared-bank paths
against their iid counterparts' converged statistics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pod_compare_tpu.inference import core as C
from pod_compare_tpu.ops.boxes import decode_deltas, decoded_box_moments
from pod_compare_tpu.ops.gaussian import covariance_output_to_cholesky
from pod_compare_tpu.ops.pallas.dropout import dropout

from tests.test_inference_core import run_core


def _random_spd(rng, n, dim=4, scale=0.05):
    a = rng.randn(n, dim, dim) * scale
    return np.einsum("nij,nkj->nik", a, a) + 1e-4 * np.eye(dim)


def test_decoded_box_moments_vs_mc_oracle(rng):
    """Closed-form decode moments == large-sample MC decode statistics."""
    n = 6
    anchors_xy = rng.rand(n, 2).astype(np.float64) * 100
    anchors = np.concatenate([anchors_xy, anchors_xy + 30], axis=1)
    mu = rng.randn(n, 4) * 0.2
    cov = _random_spd(rng, n, scale=0.08)
    weights = (1.3, 0.9, 1.1, 1.0)

    s = 400_000
    chol = np.linalg.cholesky(cov)
    z = rng.randn(s, n, 4)
    samples = mu[None] + np.einsum("nij,snj->sni", chol, z)
    boxes = np.asarray(
        jax.vmap(
            lambda d: decode_deltas(
                jnp.asarray(d, jnp.float32), jnp.asarray(anchors, jnp.float32),
                weights,
            )
        )(jnp.asarray(samples, jnp.float32))
    )
    mc_mean = boxes.mean(axis=0)
    resid = boxes - mc_mean[None]
    mc_cov = np.einsum("sni,snj->nij", resid, resid) / (s - 1)

    a_mean, a_cov = decoded_box_moments(
        jnp.asarray(mu, jnp.float32),
        jnp.asarray(cov, jnp.float32),
        jnp.asarray(anchors, jnp.float32),
        weights,
    )
    np.testing.assert_allclose(np.asarray(a_mean), mc_mean, atol=0.05)
    # MC noise on covariance entries at S=400k is ~0.5%; allow 2%.
    scale = np.sqrt(
        np.einsum("nii,njj->nij", np.asarray(a_cov), np.asarray(a_cov))
    )
    np.testing.assert_allclose(
        np.asarray(a_cov) / scale, mc_cov / scale, atol=0.02
    )


def test_decoded_box_moments_degenerate_variances_stay_finite(rng):
    """Untrained full-cov heads emit ~1e6 log-size variances; the sampled
    pipeline saturates at SCALE_CLAMP per draw, and the analytic path must
    likewise stay finite (PSD-safe variance clamp) instead of overflowing
    exp()."""
    anchors = jnp.asarray([[10.0, 10.0, 50.0, 50.0]] * 3)
    mu = jnp.asarray([[0.0, 0.0, 0.0, 0.0],
                      [0.1, -0.1, 20.0, 0.2],
                      [0.0, 0.0, 0.0, 0.0]])
    cov = jnp.stack([
        jnp.diag(jnp.asarray([0.01, 0.01, 1e6, 1e6])),
        jnp.diag(jnp.asarray([1e3, 1e3, 1e3, 1e3])),
        jnp.diag(jnp.asarray([0.01, 0.01, 0.02, 0.02])),
    ])
    mean, bc = decoded_box_moments(mu, cov, anchors)
    assert np.isfinite(np.asarray(mean)).all()
    assert np.isfinite(np.asarray(bc)).all()
    # PSD survives the clamp (eigvals >= ~0 up to roundoff).
    eig = np.linalg.eigvalsh(np.asarray(bc, np.float64))
    assert (eig > -1e-3 * np.abs(eig).max()).all()
    # The well-conditioned candidate is untouched by the guard: matches
    # the exact closed form.
    s = 0.02
    ew = np.exp(0.5 * s)
    aw = 40.0
    expected_var_pw = aw * aw * ew * ew * np.expm1(s)
    got = np.asarray(bc)[2]
    # var(pw) maps to corner covariance entries via A; check total spread
    np.testing.assert_allclose(
        got[0, 0] + got[2, 2] - 2 * got[0, 2],
        expected_var_pw, rtol=1e-5,
    )


def test_decoded_box_mean_bitwise_matches_moments(rng):
    """decoded_box_mean (the defer-covariance fast path) must equal the
    mean returned by decoded_box_moments BITWISE — the defer redesign's
    correctness argument (DESIGN.md §5d) is that NMS sees identical
    means either way. Both now share _decoded_mean_terms (elementwise
    only — an einsum mean would ride the bf16 MXU on TPU and break this),
    so this pins the invariant structurally, degenerate variances
    included."""
    from pod_compare_tpu.ops.boxes import decoded_box_mean

    n = 64
    anchors_xy = rng.rand(n, 2).astype(np.float32) * 600
    anchors = np.concatenate([anchors_xy, anchors_xy + 40], axis=1)
    mu = np.asarray(rng.randn(n, 4) * 0.3, np.float32)
    cov = np.asarray(_random_spd(rng, n, scale=0.1), np.float32)
    # include saturation-guard-active rows (untrained-head magnitudes)
    cov[:4, 2, 2] = cov[:4, 3, 3] = 1e6
    mu[4:6, 2] = 30.0
    weights = (1.3, 0.9, 1.1, 1.0)

    mean_m, _ = decoded_box_moments(
        jnp.asarray(mu), jnp.asarray(cov), jnp.asarray(anchors), weights
    )
    diag = jnp.stack([cov[:, i, i] for i in range(4)], -1)
    mean_f = decoded_box_mean(
        jnp.asarray(mu), diag, jnp.asarray(anchors), weights
    )
    assert (np.asarray(mean_m) == np.asarray(mean_f)).all()


def test_classification_probs_analytic_vs_quadrature_oracle(rng):
    """16-node Gauss-Hermite == high-order float64 quadrature of
    E[sigmoid(z)], z ~ N(logit, var) (the limit the reference's 10-sample
    MC estimates, probabilistic_inference.py:289-297)."""
    logits = np.asarray(rng.randn(40, 5) * 3, np.float64)
    log_var = np.asarray(rng.randn(40, 5) * 1.5 - 1, np.float64)
    std = np.sqrt(np.exp(log_var))

    nodes, w = np.polynomial.hermite.hermgauss(80)
    oracle = (
        w[:, None, None]
        / (1.0 + np.exp(-(logits[None] + np.sqrt(2.0) * nodes[:, None, None] * std[None])))
    ).sum(0) / np.sqrt(np.pi)

    analytic = C.classification_probs(
        None, jnp.asarray(logits), jnp.asarray(log_var), 10, impl="analytic"
    )
    np.testing.assert_allclose(np.asarray(analytic), oracle, atol=5e-4)

    # MC sanity: a 100k-sample iid estimate agrees within its noise floor.
    s = 100_000
    z = rng.randn(s, 1, 1)
    mc = (1.0 / (1.0 + np.exp(-(logits[None] + z * std[None])))).mean(0)
    np.testing.assert_allclose(np.asarray(analytic), mc, atol=1.5e-2)


def test_classification_probs_shared_marginal(rng):
    """mc_shared averaged over many keys converges to the same expectation
    as mc_iid (identical per-anchor marginal law)."""
    logits = jnp.asarray(rng.randn(30, 4), jnp.float32)
    log_var = jnp.asarray(rng.randn(30, 4) * 0.5, jnp.float32)

    def mean_over_keys(impl, n_keys=200):
        f = jax.jit(
            lambda k: C.classification_probs(k, logits, log_var, 16, impl=impl)
        )
        outs = [f(jax.random.PRNGKey(i)) for i in range(n_keys)]
        return np.mean([np.asarray(o) for o in outs], axis=0)

    exact = np.asarray(
        C.classification_probs(None, logits, log_var, 10, impl="analytic")
    )
    # 200 keys x 16 samples -> MC std ~6e-3 per entry; 4 sigma headroom.
    np.testing.assert_allclose(mean_over_keys("mc_shared"), exact, atol=2.5e-2)
    np.testing.assert_allclose(mean_over_keys("mc_iid"), exact, atol=2.5e-2)


def test_box_mc_shared_marginal(rng):
    """Per-candidate sampled covariance under a shared z bank converges to
    the analytic covariance (same marginal law as iid banks)."""
    kwargs = dict(box_num_samples=512)
    outs = []
    for i in range(60):
        cands, _ = run_core(
            np.random.RandomState(0), box_sampling="mc_shared",
            rng_key=jax.random.PRNGKey(i), **kwargs,
        )
        outs.append(np.asarray(cands.covs))
    mean_cov = np.mean(outs, axis=0)
    analytic, _ = run_core(np.random.RandomState(0), box_sampling="analytic")
    a = np.asarray(analytic.covs)
    v = np.asarray(analytic.valid)
    scale = np.sqrt(np.einsum("nii,njj->nij", a[v], a[v]))
    np.testing.assert_allclose(
        mean_cov[v] / scale, a[v] / scale, atol=0.05
    )


def test_core_analytic_matches_sampled_at_convergence(rng):
    """The sampled core at large S approaches the analytic core."""
    sampled, _ = run_core(
        np.random.RandomState(3), box_sampling="mc_iid", box_num_samples=4000
    )
    analytic, _ = run_core(np.random.RandomState(3), box_sampling="analytic")
    v = np.asarray(analytic.valid)
    np.testing.assert_allclose(
        np.asarray(analytic.boxes)[v], np.asarray(sampled.boxes)[v], atol=0.5
    )
    a = np.asarray(analytic.covs)[v]
    s = np.asarray(sampled.covs)[v]
    scale = np.sqrt(np.einsum("nii,njj->nij", a, a))
    np.testing.assert_allclose(a / scale, s / scale, atol=0.08)
    # scores/classes/validity identical (cls path untouched here)
    np.testing.assert_array_equal(
        np.asarray(analytic.classes), np.asarray(sampled.classes)
    )


@pytest.mark.parametrize("impl", ["bernoulli", "packed2", "packed4", "rbg"])
def test_tower_dropout_masks_fused_draw(rng, impl):
    """One flat RNG draw split into per-application masks: right shapes,
    right rate, independent across applications."""
    from pod_compare_tpu.ops.pallas.dropout import tower_dropout_masks

    shapes = [(1, 8, 10, 64), (1, 4, 5, 64), (2, 8, 10, 64)]
    masks = tower_dropout_masks(
        jax.random.PRNGKey(3), shapes, 0.2, impl=impl
    )
    assert [m.shape for m in masks] == shapes
    all_bits = np.concatenate([np.asarray(m).ravel() for m in masks])
    assert abs(all_bits.mean() - 0.8) < 0.01
    # Applications with identical shapes are distinct slices of the draw.
    assert not np.array_equal(np.asarray(masks[0]), np.asarray(masks[2][:1]))
    # Reproducible for a fixed key; different for a different key.
    again = tower_dropout_masks(jax.random.PRNGKey(3), shapes, 0.2, impl=impl)
    np.testing.assert_array_equal(np.asarray(masks[0]), np.asarray(again[0]))
    other = tower_dropout_masks(jax.random.PRNGKey(4), shapes, 0.2, impl=impl)
    assert not np.array_equal(np.asarray(masks[0]), np.asarray(other[0]))


def test_head_mc_bank_masks_differ_across_runs_and_layers(rng):
    """Through the real head: MC runs get different masks; layers within a
    run get different masks; batch sharing yields identical per-image
    outputs statistics only (masks equal across batch)."""
    import jax

    from pod_compare_tpu.config import get_cfg
    from pod_compare_tpu.models import build_model, init_model_params

    cfg = get_cfg()
    cfg.MODEL.RETINANET.NUM_CLASSES = 3
    cfg.MODEL.PROBABILISTIC_MODELING.DROPOUT_RATE = 0.5
    model = build_model(cfg)
    canvas = (64, 64)
    params = init_model_params(model, canvas, seed=0)
    images = jnp.asarray(rng.rand(2, *canvas, 3) * 255, jnp.float32)
    feats = model.apply({"params": params}, images, method="backbone")

    def head(k, shared):
        return model.apply(
            {"params": params}, feats, False, shared,
            method="forward_head", rngs={"dropout": k},
        )

    o1 = head(jax.random.PRNGKey(0), True)
    o2 = head(jax.random.PRNGKey(1), True)
    # Different keys -> different stochastic outputs.
    assert not np.allclose(
        np.asarray(o1["box_cls"]), np.asarray(o2["box_cls"])
    )
    # Deterministic pass unaffected by masks machinery.
    d1 = model.apply({"params": params}, feats, True, method="forward_head")
    d2 = model.apply({"params": params}, feats, True, method="forward_head")
    np.testing.assert_array_equal(
        np.asarray(d1["box_cls"]), np.asarray(d2["box_cls"])
    )


@pytest.mark.parametrize("impl", ["bernoulli", "packed2", "packed4", "rbg"])
def test_dropout_shared_batch_mask(rng, impl):
    """shared_batch draws ONE mask row and broadcasts it over the batch:
    identical drop pattern per image, correct rate and scaling."""
    x = jnp.ones((8, 32, 64), jnp.float32)
    key = jax.random.PRNGKey(7)
    out = np.asarray(dropout(x, key, 0.25, False, impl=impl, shared_batch=True))
    # Same pattern across the batch axis.
    for b in range(1, 8):
        np.testing.assert_array_equal(out[b], out[0])
    kept = out[0] != 0
    assert abs(kept.mean() - 0.75) < 0.04
    np.testing.assert_allclose(out[0][kept], 1.0 / 0.75, rtol=1e-6)
    # Unshared differs across batch rows (same key, full-shape mask).
    out_iid = np.asarray(dropout(x, key, 0.25, False, impl=impl))
    assert not np.array_equal(out_iid[0] != 0, out_iid[1] != 0)
