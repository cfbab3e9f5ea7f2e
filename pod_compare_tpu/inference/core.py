"""Shared probabilistic anchor-wise inference core (single image, jittable).

TPU-native equivalent of the reference's
`RetinaNetProbabilisticPredictor.retinanet_probabilistic_inference`
(reference: probabilistic_inference.py:178-388): MC-sample classification
probabilities from the predicted logit Gaussians, select top-k candidates,
build box covariances by decoding a bank of multivariate-normal delta
samples, and add epistemic covariance across stochastic runs.

Everything is fixed-shape: the dynamic top-k → score-filter chain of the
reference becomes a static top-k with a validity mask. The per-image core
vmaps over the batch axis.
"""

import os
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pod_compare_tpu.ops.boxes import (
    decode_deltas,
    decoded_box_mean,
    decoded_box_moments,
)
from pod_compare_tpu.ops.gaussian import (
    covariance_output_to_cholesky,
    sample_mean_covariance,
)


class Detections(NamedTuple):
    """Padded detection set (one image).

    boxes: (D, 4) XYXY in network-input coordinates.
    covs: (D, 4, 4) box covariance matrices (zeros when unavailable).
    scores: (D,) max class probability.
    classes: (D,) int32 class indices.
    prob_vectors: (D, K) per-class probabilities.
    valid: (D,) bool.
    """

    boxes: jnp.ndarray
    covs: jnp.ndarray
    scores: jnp.ndarray
    classes: jnp.ndarray
    prob_vectors: jnp.ndarray
    valid: jnp.ndarray
    # Source-anchor index per detection (None outside NMS-first paths):
    # carried so `deferred_covariance` can rebuild the analytic box
    # covariance for the NMS survivors only.
    anchor_idx: jnp.ndarray = None

    def gather(self, idx: jnp.ndarray, idx_valid: jnp.ndarray) -> "Detections":
        """Reindex all fields by `idx`, intersecting validity."""
        return Detections(
            boxes=self.boxes[idx],
            covs=self.covs[idx],
            scores=self.scores[idx],
            classes=self.classes[idx],
            prob_vectors=self.prob_vectors[idx],
            valid=self.valid[idx] & idx_valid,
            anchor_idx=(
                None if self.anchor_idx is None else self.anchor_idx[idx]
            ),
        )


class Candidates(NamedTuple):
    """Top-k anchor candidates before NMS/fusion (one image)."""

    boxes: jnp.ndarray  # (C, 4) decoded box means
    covs: jnp.ndarray  # (C, 4, 4); zeros if no covariance source
    has_cov: bool  # static: whether covs is meaningful
    scores: jnp.ndarray  # (C,)
    classes: jnp.ndarray  # (C,) int32
    prob_vectors: jnp.ndarray  # (C, K)
    valid: jnp.ndarray  # (C,)
    anchor_idx: jnp.ndarray = None  # (C,) source anchor of each candidate


def classification_probs(
    rng: Optional[jax.Array],
    box_cls: jnp.ndarray,
    box_cls_var: Optional[jnp.ndarray],
    num_samples: int,
    impl: str = "mc_iid",
) -> jnp.ndarray:
    """Mean sigmoid probability under the logit Gaussian when a
    classification variance head exists (reference MC-samples this,
    probabilistic_inference.py:289-297).

    impl:
        'mc_iid'    — `num_samples` iid normals per (anchor, class); exact
                      reference semantics.
        'mc_shared' — one bank of `num_samples` normals shared across
                      anchors. Identical per-anchor marginal law (samples
                      are still iid draws from each anchor's own logit
                      Gaussian); only the cross-anchor correlation of the
                      Monte-Carlo error changes — R×K fewer random bits.
        'analytic'  — exact E[sigmoid(z)], z~N(logit, var), via 32-node
                      Gauss-Hermite quadrature (the S→∞ limit of both MC
                      modes; deterministic, no RNG at all; ≤1e-4 absolute
                      error for σ up to ~5).
    """
    if box_cls_var is None:
        return jax.nn.sigmoid(box_cls)
    std = jnp.sqrt(jnp.exp(box_cls_var))
    if impl != "analytic" and os.environ.get("POD_IID_BANK_BARRIER"):
        # Fault-bisection knob for the b17-20 mc_iid v5e runtime fault
        # (DESIGN.md §5d): materialize the (R, K) logit mean/std before
        # the (S, R, K) bank consumes them, so XLA cannot fuse the
        # head-bank mean reduction (over the M dropout runs) into the
        # bank's elementwise kernel. The standalone bank with
        # PREMATERIALIZED operands survives the faulting shape
        # (tools/repro_v5e_iid_bank_fault.py) while the in-pipeline bank
        # crashes with both threefry and rbg bits — this isolates
        # whether the pathological kernel is that producer fusion.
        # Numerics unchanged (a barrier reorders no arithmetic).
        box_cls, std = jax.lax.optimization_barrier((box_cls, std))
    if impl == "analytic":
        nodes, weights = np.polynomial.hermite.hermgauss(32)
        nodes = jnp.asarray(np.sqrt(2.0) * nodes, box_cls.dtype)
        weights = jnp.asarray(weights / np.sqrt(np.pi), box_cls.dtype)
        z = box_cls[None] + nodes[:, None, None] * std[None]
        return jnp.einsum("s,sak->ak", weights, jax.nn.sigmoid(z))
    if impl == "mc_shared":
        noise_shape = (num_samples,) + (1,) * (box_cls.ndim - 1) + box_cls.shape[-1:]
    else:
        # mc_iid: one fused (S, R, K) draw. A scan-chunked variant
        # (accumulate the sigmoid mean one sample at a time, identical
        # per-logit law) was built and measured as a round-5 mitigation
        # for the b17-20 v5e runtime fault: it did NOT dodge the fault
        # (b20 still crashes the worker on its first invocation at the
        # same 8.08 GB compile peak) and it costs 5% at the proven-safe
        # batch (33.9 vs 35.8 img/s at b16) — so the one-shot form stays.
        # See DESIGN.md §5d and tools/probe_mc_iid_runtime.py.
        noise_shape = (num_samples,) + box_cls.shape
    if impl == "mc_iid" and os.environ.get("POD_IID_BANK_PRNG") == "rbg":
        # Fault-bisection knob for the b17-20 mc_iid v5e runtime fault
        # (DESIGN.md §5d): draw the bank from XLA's RngBitGenerator
        # instead of threefry — a single HLO op with radically different
        # codegen. Same per-logit law (iid normals are iid normals
        # whatever the bit source); bits differ from the threefry
        # default, which is fine because every mc_iid contract in this
        # repo is law-based, not bit-based. Key conversion mirrors
        # ops/pallas/dropout.py::rbg_dropout (2-u32 threefry key seeds a
        # 4-u32 rbg key; distinct keys keep distinct streams).
        # MEASURED (round 5): does NOT dodge the fault — the cls-only
        # iid pipeline at b20 crashes the worker on its first invocation
        # with rbg exactly as with threefry (same 8.11 GB compile peak),
        # while the bare bank at identical shape survives standalone
        # (tools/repro_v5e_iid_bank_fault.py). The bit source is
        # innocent; the fault needs the surrounding pipeline.
        data = jax.random.key_data(rng).astype(jnp.uint32)
        rng = jax.random.wrap_key_data(
            jnp.concatenate([data, data]), impl="rbg"
        )
    noise = jax.random.normal(rng, noise_shape, box_cls.dtype)
    probs = jnp.mean(jax.nn.sigmoid(box_cls[None] + noise * std[None]), axis=0)
    if impl == "mc_iid" and os.environ.get("POD_IID_BANK_OUT_BARRIER"):
        # Consumer-side twin of POD_IID_BANK_BARRIER (DESIGN.md §5d):
        # materialize the (R, K) probs so the max/argmax consumers
        # (core.py scores/classes — a VARIADIC reduce) cannot fuse onto
        # the (S, R, K) bank chain. The analytic path never forms that
        # fusion (its probs materialize after the Gauss-Hermite einsum),
        # which is the remaining structural difference between the
        # crashing iid pipeline and everything that survives.
        probs = jax.lax.optimization_barrier(probs)
    return probs


def _topk_candidates(
    scores_all: jnp.ndarray,
    topk: int,
    level_sizes: Optional[Sequence[int]],
):
    """Top-k candidate selection over anchor scores.

    The reference selects top-k independently PER FPN LEVEL and
    concatenates (`for i, anchors in enumerate(outputs['anchors'])` with
    `num_topk = min(topk, level_size)` inside,
    probabilistic_inference.py:283-308) — at BDD geometry that is up to
    5x1000 candidates, not a single global 1000. With `level_sizes`
    (static per-level anchor counts summing to R) this replicates that;
    without, a single global top-k is used (callers operating on an
    unstructured anchor set).
    """
    if level_sizes is None:
        return jax.lax.top_k(scores_all, topk)
    assert sum(level_sizes) == scores_all.shape[0], (
        level_sizes, scores_all.shape)
    scores_parts, idx_parts = [], []
    start = 0
    for n in level_sizes:
        k = min(topk, int(n))
        s, i = jax.lax.top_k(scores_all[start:start + n], k)
        scores_parts.append(s)
        idx_parts.append(i + start)
        start += n
    return jnp.concatenate(scores_parts), jnp.concatenate(idx_parts)


def _pick_chunk(num_samples: int, num_candidates: int) -> int:
    """Largest divisor of `num_samples` keeping a (chunk, C, 4) sample
    buffer under ~2^21 elements, so the 1000-sample decode never
    materializes (S, C, 4) for the full per-level candidate set.

    POD_BOX_SAMPLE_CHUNK_ELEMS overrides the element limit — a
    fault-bisection knob for the b17-20 mc_iid v5e runtime fault
    (tools/probe_mc_iid_runtime.py, DESIGN.md §5d): smaller chunks
    shrink every live (chunk, C, 4) buffer in the sampled box decode
    without changing the accumulated moments (chunk order is fixed by
    the split keys, sums are exact in fp32 accumulation order per
    chunk count — so only timings/memory move, not semantics at a
    given chunk size)."""
    elem_limit = int(os.environ.get("POD_BOX_SAMPLE_CHUNK_ELEMS", 1 << 21))
    limit = max(1, elem_limit // max(4 * num_candidates, 1))
    if num_samples <= limit:
        return num_samples
    for c in range(limit, 0, -1):
        if num_samples % c == 0:
            return c
    return 1


def probabilistic_inference_core(
    rng: jax.Array,
    anchors: jnp.ndarray,
    box_cls: jnp.ndarray,
    box_delta: jnp.ndarray,
    box_cls_var: Optional[jnp.ndarray],
    box_reg_var: Optional[jnp.ndarray],
    run_deltas: Optional[jnp.ndarray],
    *,
    topk: int,
    score_thresh: float,
    cls_num_samples: int,
    box_num_samples: int,
    box_reg_weights=(1.0, 1.0, 1.0, 1.0),
    level_sizes: Optional[Sequence[int]] = None,
    cls_sampling: str = "mc_iid",
    box_sampling: str = "mc_iid",
    defer_covariance: bool = False,
) -> Candidates:
    """Single-image anchor-wise probabilistic inference.

    Args:
        anchors: (R, 4).
        box_cls/box_delta: (R, K) logits / (R, 4) deltas — already averaged
            over MC/ensemble runs when applicable (reference:
            probabilistic_inference.py:211-270).
        box_cls_var/box_reg_var: optional (R, K) / (R, Ccov) heads.
        run_deltas: optional (M, R, 4) per-run deltas for epistemic box
            covariance across stochastic runs (reference: :322-331).
        topk: static candidate count per level (1000 in the reference).
        box_num_samples: MVN delta samples for the sampled box decode
            (1000 in the reference, :355).
        level_sizes: static per-level anchor counts for the reference's
            per-level top-k (see `_topk_candidates`); None → global top-k.
        cls_sampling: see `classification_probs`.
        box_sampling: 'mc_iid' (reference-exact iid sample bank),
            'mc_shared' (one standardized-normal bank shared across
            candidates — per-candidate marginal law unchanged), or
            'analytic' (closed-form decode moments via
            `decoded_box_moments`; no sampling).
    """
    rng_cls, rng_box = jax.random.split(rng)
    probs = classification_probs(
        rng_cls, box_cls, box_cls_var, cls_num_samples, impl=cls_sampling
    )

    scores_all = jnp.max(probs, axis=1)  # (R,)
    classes_all = jnp.argmax(probs, axis=1).astype(jnp.int32)

    top_scores, top_idx = _topk_candidates(scores_all, topk, level_sizes)
    valid = top_scores > score_thresh

    sel_deltas = box_delta[top_idx]  # (C, 4)
    sel_anchors = anchors[top_idx]
    sel_probs = probs[top_idx]
    sel_classes = classes_all[top_idx]

    epistemic_cov = None
    if run_deltas is not None:
        # Decode each run's mean deltas at the selected anchors; the spread
        # across runs is the epistemic box covariance.
        sel_run_deltas = run_deltas[:, top_idx, :]  # (M, C, 4)
        run_boxes = jax.vmap(
            lambda d: decode_deltas(d, sel_anchors, box_reg_weights)
        )(sel_run_deltas)
        _, epistemic_cov = sample_mean_covariance(run_boxes)

    if (
        box_reg_var is not None
        and box_sampling == "analytic"
        and defer_covariance
        and epistemic_cov is None
    ):
        # NMS-first modes discard all but max_dets of the C candidates, and
        # NMS reads only means/scores — so compute the analytic decode MEAN
        # (needs only the delta-covariance diagonal, O(C*4)) here and let
        # the caller rebuild full covariances for the survivors via
        # `deferred_covariance` (measured: the O(C*16) covariance algebra
        # was 75 ms of the 162 ms per-unit core at 160 units/BDD geometry).
        chol = covariance_output_to_cholesky(box_reg_var[top_idx])
        diag = jnp.einsum("cij,cij->ci", chol, chol, precision="highest")
        boxes = decoded_box_mean(sel_deltas, diag, sel_anchors, box_reg_weights)
        covs = jnp.zeros(boxes.shape[:-1] + (4, 4), boxes.dtype)
        has_cov = False
    elif box_reg_var is not None and box_sampling == "analytic":
        chol = covariance_output_to_cholesky(box_reg_var[top_idx])  # (C,4,4)
        delta_cov = jnp.einsum(
            "cij,ckj->cik", chol, chol, precision="highest"
        )
        boxes, covs = decoded_box_moments(
            sel_deltas, delta_cov, sel_anchors, box_reg_weights
        )
        if epistemic_cov is not None:
            covs = covs + epistemic_cov
        has_cov = True
    elif box_reg_var is not None:
        chol = covariance_output_to_cholesky(box_reg_var[top_idx])  # (C,4,4)
        num_cand = sel_deltas.shape[0]
        chunk = _pick_chunk(box_num_samples, num_cand)
        num_chunks = box_num_samples // chunk
        # Residuals are accumulated against the deterministic decoded box
        # so the streaming covariance sums stay small-magnitude (stable in
        # fp32 even for 1000x4500-candidate sample banks).
        center = decode_deltas(sel_deltas, sel_anchors, box_reg_weights)

        def chunk_stats(key):
            if box_sampling == "mc_shared":
                z = jax.random.normal(key, (chunk, 4), sel_deltas.dtype)
                delta_samples = sel_deltas[None] + jnp.einsum(
                    "cij,sj->sci", chol, z, precision="highest"
                )
            else:
                z = jax.random.normal(
                    key, (chunk,) + sel_deltas.shape, sel_deltas.dtype
                )
                delta_samples = sel_deltas[None] + jnp.einsum(
                    "cij,scj->sci", chol, z, precision="highest"
                )
            box_samples = jax.vmap(
                lambda d: decode_deltas(d, sel_anchors, box_reg_weights)
            )(delta_samples)
            resid = box_samples - center[None]
            return (
                jnp.sum(resid, axis=0),
                jnp.einsum("sci,scj->cij", resid, resid, precision="highest"),
            )

        if num_chunks == 1:
            resid_sum, outer_sum = chunk_stats(rng_box)
        else:
            def body(carry, key):
                rs, os = chunk_stats(key)
                return (carry[0] + rs, carry[1] + os), None

            keys = jax.random.split(rng_box, num_chunks)
            (resid_sum, outer_sum), _ = jax.lax.scan(
                body,
                (
                    jnp.zeros((num_cand, 4), sel_deltas.dtype),
                    jnp.zeros((num_cand, 4, 4), sel_deltas.dtype),
                ),
                keys,
            )
        n = float(box_num_samples)
        resid_mean = resid_sum / n
        boxes = center + resid_mean
        # Unbiased sample covariance (divisor S−1, matching
        # compute_mean_covariance_torch, inference_utils.py:337-371).
        covs = (
            outer_sum
            - n * jnp.einsum("ci,cj->cij", resid_mean, resid_mean)
        ) / max(n - 1.0, 1.0)
        if epistemic_cov is not None:
            covs = covs + epistemic_cov
        has_cov = True
    else:
        boxes = decode_deltas(sel_deltas, sel_anchors, box_reg_weights)
        if epistemic_cov is not None:
            covs = epistemic_cov
            has_cov = True
        else:
            covs = jnp.zeros(boxes.shape[:-1] + (4, 4), boxes.dtype)
            has_cov = False

    return Candidates(
        boxes=boxes,
        covs=covs,
        has_cov=has_cov,
        scores=top_scores,
        classes=sel_classes,
        prob_vectors=sel_probs,
        valid=valid,
        anchor_idx=top_idx.astype(jnp.int32),
    )


def deferred_covariance(
    dets: Detections,
    box_delta: jnp.ndarray,
    box_reg_var: jnp.ndarray,
    anchors: jnp.ndarray,
    box_reg_weights=(1.0, 1.0, 1.0, 1.0),
) -> Detections:
    """Fill analytic box covariances for NMS survivors only.

    Companion to `probabilistic_inference_core(defer_covariance=True)`:
    rebuilds the exact `decoded_box_moments` covariance from the raw head
    outputs at the detections' source anchors (bit-identical inputs —
    elementwise math on gathered rows gives the same values the full-set
    path would have gathered).
    """
    a_idx = dets.anchor_idx
    chol = covariance_output_to_cholesky(box_reg_var[a_idx])
    delta_cov = jnp.einsum("cij,ckj->cik", chol, chol, precision="highest")
    _, covs = decoded_box_moments(
        box_delta[a_idx], delta_cov, anchors[a_idx], box_reg_weights
    )
    return dets._replace(covs=covs)
