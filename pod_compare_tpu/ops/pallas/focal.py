"""Fused stochastic (loss-attenuation) focal loss as a Pallas TPU kernel.

The reference-exact training step draws a (S=10, B, R, K) bank of iid
normal logit samples and averages the focal loss over it (reference:
probabilistic_retinanet.py:228-268). Under XLA that bank costs ~21 ms of
the 200 ms step at batch 16 (in-situ ablation, DESIGN.md §5b): threefry
bit generation + erf-based normal transform + focal transcendentals in
the forward, and a second traversal in the backward (XLA rematerializes
the samples rather than spill a 790 MB bank).

This kernel does the whole thing in ONE VMEM pass per element block:
  * sample bits from the TPU's hardware PRNG (`pltpu.prng_random_bits`),
  * Box-Muller them into iid normals (two per draw-pair),
  * accumulate the per-element MEAN focal loss over the S samples,
  * accumulate the ANALYTIC gradients d(mean loss)/d(logit) and
    d(mean loss)/d(log_var) in the same pass,
so the backward pass is a pure elementwise multiply (custom VJP) — no
sample is ever regenerated or materialized in HBM.

Per-element law is identical to the threefry path: S iid draws from
N(logit, exp(clip(log_var, ±10))); only the PRNG stream differs (the
reference's torch stream differs from both — stochastic parity is
distributional either way, tests/test_pipeline_parity.py).

Falls back to the plain-JAX implementation off-TPU
(ops/losses.py::stochastic_focal_loss dispatches on
MODEL.PROBABILISTIC_MODELING.CLS_VAR_LOSS.IMPL).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Elements per block: (rows, lanes). 0.25 MB per f32 buffer; Mosaic
# stack-allocates the unrolled sample loop's temporaries, so the live set
# is ~35 buffers — (256, 512) blocks overflowed the 16 MB scoped-VMEM
# limit by 3 MB (measured), (128, 512) fits with headroom.
_BLOCK_ROWS = 128
_LANES = 512
_LOG_VAR_CLAMP = 10.0
_TWO_PI = 2.0 * np.pi


def _u01(bits):
    """uint32 -> uniform in (0, 1]: top 24 bits, +1 so log() never sees 0."""
    return ((bits >> 8).astype(jnp.float32) + 1.0) * (1.0 / (1 << 24))


def _hash_bits(shape, seed, draw):
    """Counter-based uint32 bits in plain jnp ops (lowbias32 hash) — the
    interpret-mode bit source, so the whole kernel (Box-Muller, focal
    math, gradients) is testable on the CPU suite. On TPU the hardware
    PRNG is used instead (faster; both are iid uniform bit streams)."""
    idx = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) * jnp.uint32(
        shape[1]
    ) + jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = idx + jnp.uint32(draw) * jnp.uint32(0x9E3779B9)
    x = x + seed.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def _focal_terms(y, t, alpha, gamma):
    """Elementwise focal loss and its derivative wrt the logit `y`.

    q = 1 - p_t = |t - p|;  loss = alpha_t * ce * q^gamma;
    dloss/dy = -(2t-1) * alpha_t * q^(gamma-1) * (q^2 + gamma*p*(1-p)*ce)
    (no division — safe at q = 0).
    """
    p = jax.nn.sigmoid(y)
    ce = jnp.maximum(y, 0.0) - y * t + jnp.log1p(jnp.exp(-jnp.abs(y)))
    q = jnp.abs(t - p)
    if gamma == 2.0:
        q_gm1, q_g = q, q * q
    else:
        q_gm1 = jnp.power(q, gamma - 1.0)
        q_g = q_gm1 * q
    alpha_t = alpha * t + (1.0 - alpha) * (1.0 - t)
    loss = alpha_t * ce * q_g
    dldy = -(2.0 * t - 1.0) * alpha_t * q_gm1 * (q * q + gamma * p * (1.0 - p) * ce)
    return loss, dldy


def _kernel(seed_ref, x_ref, s_ref, t_ref, loss_ref, gx_ref, gs_ref,
            *, num_samples, alpha, gamma, interpret):
    if interpret:
        # Per-block stream: fold the block id into the hash seed.
        block_seed = seed_ref[0] + pl.program_id(0)
        draw_bits = lambda shape, k: _hash_bits(shape, block_seed, k)
    else:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        draw_bits = lambda shape, k: pltpu.prng_random_bits(shape)
    x = x_ref[:]
    s_raw = s_ref[:]
    t = t_ref[:]
    s = jnp.clip(s_raw, -_LOG_VAR_CLAMP, _LOG_VAR_CLAMP)
    std = jnp.exp(0.5 * s)
    # d std / d s_raw is zero where the clamp is active.
    gate = jnp.where(
        (s_raw > -_LOG_VAR_CLAMP) & (s_raw < _LOG_VAR_CLAMP), 1.0, 0.0
    )

    acc_l = jnp.zeros(x.shape, jnp.float32)
    acc_gx = jnp.zeros(x.shape, jnp.float32)
    acc_gz = jnp.zeros(x.shape, jnp.float32)  # sum of dl/dy * z
    # Box-Muller: each pair of uniform draws yields two iid normals.
    for pair in range((num_samples + 1) // 2):
        u1 = _u01(draw_bits(x.shape, 2 * pair))
        u2 = _u01(draw_bits(x.shape, 2 * pair + 1))
        r = jnp.sqrt(-2.0 * jnp.log(u1))
        theta = _TWO_PI * u2
        zs = (r * jnp.cos(theta), r * jnp.sin(theta))
        take = 2 if 2 * pair + 2 <= num_samples else 1
        for z in zs[:take]:
            loss, dldy = _focal_terms(x + std * z, t, alpha, gamma)
            acc_l = acc_l + loss
            acc_gx = acc_gx + dldy
            acc_gz = acc_gz + dldy * z

    inv_n = 1.0 / num_samples
    loss_ref[:] = acc_l * inv_n
    gx_ref[:] = acc_gx * inv_n
    # y = x + exp(s/2)·z  =>  dy/ds = 0.5·std·z (inside the clamp).
    gs_ref[:] = acc_gz * (0.5 * inv_n) * std * gate


def _run(seed, x2d, s2d, t2d, num_samples, alpha, gamma):
    n, c = x2d.shape
    grid = n // _BLOCK_ROWS
    spec = pl.BlockSpec(
        (_BLOCK_ROWS, c), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((n, c), jnp.float32)
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        functools.partial(
            _kernel, num_samples=num_samples, alpha=alpha, gamma=gamma,
            interpret=interpret,
        ),
        out_shape=(out_shape,) * 3,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[spec, spec, spec],
            out_specs=(spec,) * 3,
        ),
        # Off-TPU (CPU test suite): run the kernel in interpreter mode —
        # same math path, with the hash bit source standing in for the
        # hardware PRNG (see _hash_bits).
        interpret=interpret,
    )(seed.reshape(1).astype(jnp.int32), x2d, s2d, t2d)


def _as_blocks(arr):
    flat = arr.reshape(-1)
    n = flat.shape[0]
    rows = -(-n // _LANES)
    rows_pad = -(-rows // _BLOCK_ROWS) * _BLOCK_ROWS
    pad = rows_pad * _LANES - n
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    return flat.reshape(rows_pad, _LANES), n


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def stochastic_focal_elem_pallas(
    logits, log_vars, targets, seed, num_samples, alpha=0.25, gamma=2.0
):
    """Per-element mean-over-samples attenuated focal loss (TPU kernel).

    Args:
        logits/log_vars/targets: same shape, any rank; float32.
        seed: int32 scalar (derive per step from the jax PRNG key).
        num_samples/alpha/gamma: static.
    Returns:
        Array like `logits`: mean_s focal(logit + exp(clip(s)/2)·z_s, t).
    """
    return _fwd(logits, log_vars, targets, seed, num_samples, alpha, gamma)[0]


def _fwd(logits, log_vars, targets, seed, num_samples, alpha, gamma):
    shape = logits.shape
    x2d, n = _as_blocks(logits.astype(jnp.float32))
    s2d, _ = _as_blocks(log_vars.astype(jnp.float32))
    t2d, _ = _as_blocks(targets.astype(jnp.float32))
    loss, gx, gs = _run(seed, x2d, s2d, t2d, num_samples, alpha, gamma)

    def unblock(a):
        return a.reshape(-1)[:n].reshape(shape)

    return unblock(loss), (unblock(gx), unblock(gs))


def _bwd(num_samples, alpha, gamma, res, ct):
    gx, gs = res
    # targets and seed are non-differentiable inputs (the int32 seed's
    # tangent space is float0).
    return (
        ct * gx,
        ct * gs,
        jnp.zeros_like(gx),
        np.zeros((), jax.dtypes.float0),
    )


stochastic_focal_elem_pallas.defvjp(_fwd, _bwd)
