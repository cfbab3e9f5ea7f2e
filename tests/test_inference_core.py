"""Tests for the anchorwise inference core and fusion modes on synthetic
raw outputs (no model involved)."""

import jax
import jax.numpy as jnp
import numpy as np

from pod_compare_tpu.inference import core as C
from pod_compare_tpu.inference import modes as M


def make_synthetic(rng, num_anchors=60, num_classes=5, with_vars=True):
    """Anchorwise outputs with 3 strong objects and background elsewhere."""
    anchors_xy = rng.rand(num_anchors, 2).astype(np.float32) * 100
    anchors = np.concatenate([anchors_xy, anchors_xy + 20], axis=1)
    box_cls = np.full((num_anchors, num_classes), -8.0, np.float32)
    # objects at anchors 5, 20, 40 with classes 1, 3, 1
    for a, c in [(5, 1), (20, 3), (40, 1)]:
        box_cls[a, c] = 4.0
    box_delta = (rng.randn(num_anchors, 4) * 0.05).astype(np.float32)
    box_cls_var = np.full((num_anchors, num_classes), -6.0, np.float32)
    box_reg_var = np.full((num_anchors, 4), -4.0, np.float32)
    return (
        jnp.asarray(anchors),
        jnp.asarray(box_cls),
        jnp.asarray(box_delta),
        jnp.asarray(box_cls_var) if with_vars else None,
        jnp.asarray(box_reg_var) if with_vars else None,
    )


def run_core(rng_np, with_vars=True, run_deltas=None, rng_key=None, **kw):
    anchors, cls, delta, cvar, rvar = make_synthetic(rng_np, with_vars=with_vars)
    kwargs = dict(
        topk=32, score_thresh=0.05, cls_num_samples=10, box_num_samples=200
    )
    kwargs.update(kw)
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    return C.probabilistic_inference_core(
        rng_key, anchors, cls, delta, cvar, rvar, run_deltas,
        **kwargs,
    ), anchors


def test_core_selects_objects(rng):
    cands, anchors = run_core(rng)
    v = np.asarray(cands.valid)
    assert v.sum() == 3  # only the three strong objects pass 0.05
    kept_classes = np.asarray(cands.classes)[v]
    assert sorted(kept_classes.tolist()) == [1, 1, 3]
    # decoded boxes stay near their anchors (small deltas)
    top_boxes = np.asarray(cands.boxes)[v]
    top_scores = np.asarray(cands.scores)[v]
    assert (top_scores > 0.9).all()
    for b in top_boxes:
        d = np.abs(b - np.asarray(anchors)).sum(1).min()
        assert d < 20.0


def test_core_covariance_magnitude(rng):
    """Sampled box covariance must reflect exp(log_var) of the deltas scaled
    by anchor size (20px anchors, log_var=-4 → std ≈ 0.135*20 ≈ 2.7px)."""
    cands, _ = run_core(rng, box_num_samples=2000)
    v = np.asarray(cands.valid)
    covs = np.asarray(cands.covs)[v]
    stds = np.sqrt(np.diagonal(covs, axis1=1, axis2=2))
    assert (stds > 1.0).all() and (stds < 6.0).all()
    assert cands.has_cov


def test_core_no_cov_heads(rng):
    cands, _ = run_core(rng, with_vars=False)
    assert not cands.has_cov
    np.testing.assert_array_equal(np.asarray(cands.covs), 0.0)


def test_core_sigmoid_probs_without_var(rng):
    anchors, cls, delta, _, _ = make_synthetic(rng, with_vars=False)
    cands = C.probabilistic_inference_core(
        jax.random.PRNGKey(0), anchors, cls, delta, None, None, None,
        topk=32, score_thresh=0.05, cls_num_samples=10, box_num_samples=10,
    )
    v = np.asarray(cands.valid)
    np.testing.assert_allclose(
        np.asarray(cands.scores)[v],
        jax.nn.sigmoid(4.0),
        atol=1e-5,
    )


def test_core_epistemic_covariance(rng):
    """run_deltas spread across runs must appear as epistemic covariance."""
    anchors, cls, delta, _, _ = make_synthetic(rng, with_vars=False)
    spread = 0.1
    run_deltas = jnp.stack(
        [delta + spread, delta - spread], axis=0
    )  # 2 runs, symmetric
    cands = C.probabilistic_inference_core(
        jax.random.PRNGKey(0), anchors, cls, delta, None, None, run_deltas,
        topk=32, score_thresh=0.05, cls_num_samples=10, box_num_samples=10,
    )
    assert cands.has_cov
    v = np.asarray(cands.valid)
    covs = np.asarray(cands.covs)[v]
    # anchors are 20px wide; dx spread 0.1 → x displacement ±2px → var 8
    assert (np.diagonal(covs, axis1=1, axis2=2) > 1.0).all()


def _dets_from_core(rng, **kw):
    cands, _ = run_core(rng, **kw)
    return cands


def test_standard_nms_mode(rng):
    cands = _dets_from_core(rng)
    det = M.standard_nms(cands, 0.5, 10)
    v = np.asarray(det.valid)
    assert v.sum() == 3
    assert det.boxes.shape == (10, 4)


def test_anchor_statistics_mode(rng):
    cands = _dets_from_core(rng)
    det = M.anchor_statistics(cands, 0.5, 10, 0.7)
    v = np.asarray(det.valid)
    assert v.sum() == 3
    # covariances are at least the aleatoric ones (positive diagonal)
    covs = np.asarray(det.covs)[v]
    assert (np.diagonal(covs, axis1=1, axis2=2) > 0).all()


def test_bayes_od_modes(rng):
    cands = _dets_from_core(rng)
    for box_mode in ["bayesian_inference", "covariance_intersection"]:
        for cls_mode in ["bayesian_inference", "max_score"]:
            det = M.bayes_od(cands, 0.5, 10, 0.9, box_mode, cls_mode)
            v = np.asarray(det.valid)
            assert v.sum() == 3, (box_mode, cls_mode)
            covs = np.asarray(det.covs)[v]
            assert np.isfinite(covs).all()
            assert (np.diagonal(covs, axis1=1, axis2=2) > 0).all()


def test_bayes_od_singleton_cluster_preserves_member(rng):
    """A cluster with one member must fuse to (approximately) itself."""
    cands = _dets_from_core(rng)
    det = M.bayes_od(cands, 0.5, 10, 0.9, "bayesian_inference", "max_score")
    v = np.asarray(det.valid)
    fused = np.asarray(det.boxes)[v]
    orig_valid = np.asarray(cands.valid)
    orig = np.asarray(cands.boxes)[orig_valid]
    for b in fused:
        assert np.abs(orig - b).sum(1).min() < 1.0


def test_black_box_merge_identical_runs(rng):
    """Two identical runs: every cluster has 2 coincident members; epistemic
    covariance ≈ 0 so output covariance ≈ mean member covariance."""
    cands = _dets_from_core(rng)
    det = M.standard_nms(cands, 0.5, 10)
    both = M.concatenate_detections([det, det])
    merged = M.black_box_merge(both, 0.5, 10, 0.7)
    v = np.asarray(merged.valid)
    assert v.sum() == 3
    dv = np.asarray(det.valid)
    np.testing.assert_allclose(
        np.sort(np.asarray(merged.scores)[v]),
        np.sort(np.asarray(det.scores)[dv]),
        atol=1e-5,
    )
    # epistemic covariance of identical members is 0 → covs equal member covs
    merged_covs = np.asarray(merged.covs)[v]
    orig_covs = np.asarray(det.covs)[dv]
    for c in merged_covs:
        assert min(np.abs(orig_covs - c).max(axis=(1, 2))) < 1e-3


def test_black_box_merge_separated_runs(rng):
    """Members displaced between runs add epistemic covariance."""
    cands = _dets_from_core(rng)
    det = M.standard_nms(cands, 0.5, 10)
    shifted = det._replace(boxes=det.boxes + 2.0)
    both = M.concatenate_detections([det, shifted])
    merged = M.black_box_merge(both, 0.5, 10, 0.5)
    v = np.asarray(merged.valid)
    assert v.sum() == 3
    # cluster mean should sit between the two members
    m_boxes = np.asarray(merged.boxes)[v]
    d_boxes = np.asarray(det.boxes)[np.asarray(det.valid)]
    for b in m_boxes:
        assert np.abs(d_boxes + 1.0 - b).sum(1).min() < 0.5


def test_per_level_topk_matches_reference_semantics(rng):
    """_topk_candidates with level_sizes = per-level top-k concatenated in
    level order (reference: probabilistic_inference.py:283-308); without =
    one global top-k."""
    import jax.numpy as jnp
    from pod_compare_tpu.inference.core import _topk_candidates

    scores = jnp.asarray(rng.rand(120).astype(np.float32))
    level_sizes = (60, 40, 12, 8)
    topk = 16

    s, idx = _topk_candidates(scores, topk, level_sizes)
    assert s.shape == (16 + 16 + 12 + 8,)
    sc = np.asarray(scores)
    start, out_start = 0, 0
    for n in level_sizes:
        k = min(topk, n)
        expect_idx = start + np.argsort(-sc[start:start + n], kind="stable")[:k]
        np.testing.assert_array_equal(
            np.sort(np.asarray(idx)[out_start:out_start + k]),
            np.sort(expect_idx),
        )
        np.testing.assert_allclose(
            np.asarray(s)[out_start:out_start + k], sc[expect_idx], rtol=1e-6
        )
        start += n
        out_start += k

    s_g, idx_g = _topk_candidates(scores, topk, None)
    np.testing.assert_allclose(
        np.asarray(s_g), np.sort(sc)[::-1][:topk], rtol=1e-6
    )


def test_pick_chunk_divides_and_bounds():
    from pod_compare_tpu.inference.core import _pick_chunk

    for samples, cands in [(1000, 4540), (1000, 254), (1000, 100000),
                           (7, 3), (1, 1), (999, 10000)]:
        chunk = _pick_chunk(samples, cands)
        assert samples % chunk == 0, (samples, cands, chunk)
        assert chunk >= 1
        if chunk < samples:  # chunked: buffer bounded
            assert chunk * cands * 4 <= (1 << 21) * 4


def test_chunked_box_sampling_matches_unchunked(rng):
    """The scan-accumulated sample mean/covariance must equal the one-shot
    formulation statistically (same sample count, different stream)."""
    import jax
    import jax.numpy as jnp
    from pod_compare_tpu.inference.core import probabilistic_inference_core

    R, K = 600, 3  # large enough that 2048-sample chunking kicks in
    anchors_xy = rng.rand(R, 2).astype(np.float32) * 200
    anchors_wh = rng.rand(R, 2).astype(np.float32) * 30 + 20
    anchors = np.concatenate([anchors_xy, anchors_xy + anchors_wh], 1)
    box_cls = (rng.randn(R, K) - 2).astype(np.float32)
    box_delta = (rng.randn(R, 4) * 0.1).astype(np.float32)
    box_reg_var = (rng.randn(R, 4) * 0.2 - 3).astype(np.float32)

    def run(samples, seed):
        return probabilistic_inference_core(
            jax.random.PRNGKey(seed), jnp.asarray(anchors),
            jnp.asarray(box_cls), jnp.asarray(box_delta), None,
            jnp.asarray(box_reg_var), None,
            topk=600, score_thresh=0.0, cls_num_samples=2,
            box_num_samples=samples,
        )

    a = run(8192, 0)  # chunked (8192 * 600 > 2^21)
    b = run(8192, 1)
    np.testing.assert_allclose(
        np.asarray(a.boxes), np.asarray(b.boxes), rtol=0.05, atol=0.5
    )
    da = np.diagonal(np.asarray(a.covs), axis1=1, axis2=2)
    db = np.diagonal(np.asarray(b.covs), axis1=1, axis2=2)
    np.testing.assert_allclose(da, db, rtol=0.3, atol=0.3)
