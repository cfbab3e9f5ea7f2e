"""Standalone candidate repro for the b17-20 mc_iid v5e runtime fault.

Distilled from the axis bisection (tools/probe_mc_iid_runtime.py with
PROBE_BOX_SAMPLING=analytic): at batch 20 the iid CLASSIFICATION bank
alone — a vmapped jax.random.normal((10, R, K)) + sigmoid-mean per
image, nothing else iid in the program — crashes the v5e worker on its
first invocation (compile-time peak 8.11 GB, far under the 13.5 GB
budget). This script is that bank with every other pipeline stage
stripped: B keys -> per-image (S, R, K) threefry draw -> mean sigmoid
-> per-class max (so the bank is consumed, not DCE'd). R/K match the
BDD RetinaNet-50 geometry (736x1280, FPN P3-P7, 9 anchors/loc, 7
classes; reference semantics: probabilistic_inference.py:289-297).

    python tools/repro_v5e_iid_bank_fault.py 20   # faulting batch
    python tools/repro_v5e_iid_bank_fault.py 16   # proven-safe batch

If this crashes the worker, the fault is the RNG+elementwise bank
codegen itself; if it survives, the fault needs the surrounding
pipeline (head bank, top-k, NMS) to manifest. Outcome documented in
DESIGN.md §5d.

OUTCOME (round 5, 2026-08-20): SURVIVED at b20 — 42 s compile,
0.04 s/iter, bit-stable across iterations. The bank codegen alone is
clean at the faulting shape; and the in-pipeline bank crashes with BOTH
threefry and rbg bits (POD_IID_BANK_PRNG=rbg, same 8.11 GB compile
peak), so the bit source is innocent too. The fault needs the
surrounding pipeline — prime suspect: XLA fusing the head-bank mean
reduction (over M dropout runs) into the (B, S, R, K) bank kernel,
which this script's prematerialized logits/std exactly avoid. That
hypothesis is testable in-pipeline with POD_IID_BANK_BARRIER=1
(inference/core.py::classification_probs).
"""
import sys
import time

import jax
import jax.numpy as jnp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 20
S, K = 10, 7
R = 9 * (92 * 160 + 46 * 80 + 23 * 40 + 12 * 20 + 6 * 10)  # 176,580


def mean_sigmoid_probs(key, logits, std):
    noise = jax.random.normal(key, (S, R, K), logits.dtype)
    probs = jnp.mean(jax.nn.sigmoid(logits[None] + noise * std[None]), 0)
    return jnp.max(probs, axis=1)


fn = jax.jit(jax.vmap(mean_sigmoid_probs))
keys = jax.random.split(jax.random.PRNGKey(0), B)
logits = jnp.zeros((B, R, K), jnp.float32)
std = jnp.ones((B, R, K), jnp.float32)
print(f"[b{B}] compiling (S,R,K)=({S},{R},{K})...", flush=True)
for i in range(4):
    t0 = time.time()
    out = float(fn(keys, logits, std).sum())  # host fetch = hard sync
    print(f"[b{B}] iter {i}: {time.time() - t0:.2f}s sum={out:.1f}", flush=True)
print(f"[b{B}] SURVIVED", flush=True)
