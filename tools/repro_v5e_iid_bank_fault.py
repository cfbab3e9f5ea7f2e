"""Standalone repro ladder for the b17-20 mc_iid v5e runtime fault.

Distilled from the axis bisection (tools/probe_mc_iid_runtime.py with
PROBE_BOX_SAMPLING=analytic): at batch 20 the iid CLASSIFICATION bank
alone — a vmapped jax.random.normal((10, R, K)) + sigmoid-mean per
image, nothing else iid in the program — crashes the v5e worker on its
first invocation (compile-time peak 8.11 GB, far under the 13.5 GB
budget). R/K match BDD RetinaNet-50 geometry (736x1280, FPN P3-P7,
9 anchors/loc, 7 classes; reference: probabilistic_inference.py:289-297).

    python tools/repro_v5e_iid_bank_fault.py 20            # bare bank
    python tools/repro_v5e_iid_bank_fault.py 20 fused-mean # + M-run mean
                                                           # as producer
    python tools/repro_v5e_iid_bank_fault.py 20 argmax     # + argmax
                                                           # as consumer

'bare' feeds the bank prematerialized (R, K) logits/std and consumes it
with a plain max. 'fused-mean' feeds it the mean over an (M=10, R, K)
head bank — the producer fusion the real pipeline has and 'bare' lacks.
'argmax' consumes it with max AND argmax over K as the pipeline does
(core.py:233-234) — a VARIADIC reduce fused onto the bank chain, which
the analytic path never forms (its probs materialize after the
Gauss-Hermite einsum).

OUTCOMES (round 5, 2026-08-20, fresh process each):
  bare b20:       SURVIVED (42 s compile, 0.04 s/iter) — the bank
                  codegen is clean at the faulting shape. The
                  in-pipeline bank also crashes with rbg bits
                  (POD_IID_BANK_PRNG=rbg, same 8.11 GB peak), so the
                  bit source is innocent.
  fused-mean b20: SURVIVED (13 s compile) — producer fusion exonerated;
                  matches the in-pipeline producer barrier
                  (POD_IID_BANK_BARRIER=1) also NOT dodging the crash.
  argmax b20:     SURVIVED (12 s compile) — the variadic max+argmax
                  reduce fused onto the bank chain is clean too. And
                  in-pipeline, BOTH barriers at once (bank kernel
                  isolated to exactly the standalone form) still
                  crashes — the faulting kernel is NOT the bank; the
                  iid variant merely flips XLA fusion/layout decisions
                  elsewhere in the program. Full ledger: DESIGN.md §5d.
"""
import sys
import time

import jax
import jax.numpy as jnp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 20
MODE = sys.argv[2] if len(sys.argv) > 2 else "bare"
S, M, K = 10, 10, 7
R = 9 * (92 * 160 + 46 * 80 + 23 * 40 + 12 * 20 + 6 * 10)  # 176,580


def mean_sigmoid_probs(key, logits, std):
    if MODE == "fused-mean":  # (M, R, K) head banks -> per-image mean
        logits, std = jnp.mean(logits, 0), jnp.sqrt(jnp.exp(jnp.mean(std, 0)))
    noise = jax.random.normal(key, (S, R, K), logits.dtype)
    probs = jnp.mean(jax.nn.sigmoid(logits[None] + noise * std[None]), 0)
    if MODE == "argmax":  # pipeline consumers: core.py:233-234
        return jnp.max(probs, axis=1), jnp.argmax(probs, axis=1)
    return jnp.max(probs, axis=1)


fn = jax.jit(jax.vmap(mean_sigmoid_probs))
keys = jax.random.split(jax.random.PRNGKey(0), B)
shape = (B, M, R, K) if MODE == "fused-mean" else (B, R, K)
logits = jnp.zeros(shape, jnp.float32)
std = jnp.ones(shape, jnp.float32)
print(f"[b{B} {MODE}] compiling (S,R,K)=({S},{R},{K})...", flush=True)
for i in range(4):
    t0 = time.time()
    res = fn(keys, logits, std)
    out = float(res[0].sum() if isinstance(res, tuple) else res.sum())
    print(f"[b{B} {MODE}] iter {i}: {time.time() - t0:.2f}s sum={out:.1f}",
          flush=True)
print(f"[b{B} {MODE}] SURVIVED", flush=True)
