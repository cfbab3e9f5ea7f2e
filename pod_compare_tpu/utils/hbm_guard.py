"""Compile-time peak-HBM guard for benches.

A runtime OOM on the v5e tunnel worker presents as a kernel fault with a
~50-minute outage (bench.py batch-48 incident), so every bench compiles
first and checks XLA's `memory_analysis` against a budget BEFORE
executing anything. One implementation — bench.py and the tools/ benches
all route through here so the budget and the peak formula cannot drift.

Budget: 13.5e9 bytes, leaving headroom below the v5e-1's ~16 GB
(compile-only bisect 2026-08-17: BayesOD+MC peaks b32=12.02 /
b36=13.50 / b40=15.46 GB; b32 runs, b48 crashed the worker).
"""

import sys
import time
from typing import Optional, Tuple

import numpy as np

HBM_BUDGET_BYTES = 13.5e9

# Runtime-fault boundary for the reference-exact mc_iid sampling
# pipelines — a limit the COMPILE-TIME analysis provably cannot see
# (round-4 probe, 2026-08-19): mc_iid BayesOD+MC at batch 20 compiles
# clean at 8.08 GB peak (well under budget) in a fresh process with no
# other programs resident, yet the v5e worker crashes on the FIRST
# invocation (~50-min outage). Batch 16 (7.33 GB) has run hundreds of
# iterations across rounds. The fault is therefore a runtime/codegen
# issue crossing somewhere in b17-b20, not an HBM-accounting gap —
# bisecting it costs one worker outage per probe, so the guard pins the
# largest empirically validated batch instead of trusting the compile
# bound for this pipeline family.
MC_IID_PROVEN_SAFE_BATCH = 16

# The two-program pipeline layout (PROBABILISTIC_INFERENCE.
# SPLIT_HEAD_PROGRAM, predictor._build_split_pipeline) sidesteps the
# fused-program fault: b20 and b24 ran clean on the v5e where the fused
# form crashes (tools/probe_mc_iid_split.py, 2026-08-20; b24 =
# 36.6 img/s). Larger batches are untested at runtime — the compile-time
# guard still bounds them, but this family has shown compile-clean
# runtime faults before, so the cap advances only with empirical proof.
MC_IID_SPLIT_PROVEN_SAFE_BATCH = 24


def runtime_safe_batch_cap(cfg) -> Optional[int]:
    """Empirical batch cap for pipelines where compile-time analysis is
    proven insufficient; None when the compile-time guard alone is
    trustworthy. Consulted by `--batch-size auto` (cli/apply_net.py)."""
    pi = cfg.PROBABILISTIC_INFERENCE
    if "mc_iid" in (pi.CLS_SAMPLING, pi.BOX_SAMPLING):
        if pi.SPLIT_HEAD_PROGRAM:
            return MC_IID_SPLIT_PROVEN_SAFE_BATCH
        return MC_IID_PROVEN_SAFE_BATCH
    return None


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def guarded_compile(
    jitted,
    args: tuple,
    name: str = "program",
    budget_bytes: float = HBM_BUDGET_BYTES,
    log=_log,
) -> Tuple[Optional[object], dict]:
    """lower+compile `jitted(*args)`; return (compiled, info).

    compiled is None when the compiled peak exceeds the budget (info has
    ``skipped_oom_guard``). When `memory_analysis`/`cost_analysis` are
    unavailable (best-effort on some platforms) the program is NOT
    skipped — info just lacks those fields.
    """
    t0 = time.time()
    compiled = jitted.lower(*args).compile()
    info = {"compile_s": round(time.time() - t0, 1)}
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        if flops:
            info["tflop"] = round(flops / 1e12, 3)
    except Exception:
        pass
    try:
        ma = compiled.memory_analysis()
        peak = float(
            ma.temp_size_in_bytes
            + ma.argument_size_in_bytes
            + ma.output_size_in_bytes
        )
        info["peak_hbm_gb"] = round(peak / 1e9, 2)
        log(f"[{name}] compiled in {info['compile_s']}s, "
            f"peak HBM {peak / 1e9:.2f} GB")
        if peak > budget_bytes:
            log(f"[{name}] SKIPPED: peak {peak / 1e9:.1f} GB > "
                f"{budget_bytes / 1e9:.1f} GB budget")
            info["skipped_oom_guard"] = True
            return None, info
    except Exception as exc:
        log(f"[{name}] memory_analysis unavailable ({exc}); proceeding")
    return compiled, info


def pick_max_batch(
    jitted,
    make_args,
    candidates,
    name: str = "program",
    budget_bytes: float = HBM_BUDGET_BYTES,
    log=_log,
):
    """Largest candidate batch whose compiled peak HBM fits the budget.

    Compile-probes `jitted(*make_args(batch))` for each candidate in the
    given (descending) order and returns the first fit as
    (batch, compiled, info); every probe is compile-only (nothing
    executes — a runtime OOM on the v5e worker costs a ~50-min outage)
    and lands in the persistent compilation cache, so repeat invocations
    re-probe cheaply. Returns (None, None, info) when nothing fits.
    """
    info_all = {}
    for batch in candidates:
        compiled, info = guarded_compile(
            jitted, make_args(batch), name=f"{name}_b{batch}",
            budget_bytes=budget_bytes, log=log,
        )
        info_all[batch] = info
        if compiled is not None:
            log(f"[{name}] auto batch -> {batch}")
            return batch, compiled, info_all
    return None, None, info_all


def predictor_programs(predictor, batch: int, canvas) -> list:
    """(name, jitted, args) triples covering every XLA program in a
    predictor's pipeline at one batch size — ShapeDtypeStruct image args,
    so guarding stays compile-only. Fused pipelines yield one program;
    SPLIT_HEAD_PROGRAM pipelines yield head + tail (the tail's argument
    shapes come from eval_shape of the head, so the seam buffers are
    accounted as the tail's arguments)."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    images = jax.ShapeDtypeStruct((batch, *canvas, 3), jnp.float32)
    sizes = jax.ShapeDtypeStruct((batch, 2), jnp.float32)
    rng = jax.ShapeDtypeStruct(key.shape, key.dtype)
    if predictor._head_fn is None:
        return [
            ("pipeline", predictor._fn,
             (predictor.params, images, rng, sizes, sizes)),
        ]
    head_args = (predictor.params, images, rng)
    head_out = jax.eval_shape(predictor._head_fn, *head_args)
    return [
        ("head", predictor._head_fn, head_args),
        ("tail", predictor._tail_fn, tuple(head_out) + (sizes, sizes)),
    ]


def pick_max_batch_programs(
    programs_for_batch,
    candidates,
    name: str = "program",
    budget_bytes: float = HBM_BUDGET_BYTES,
    log=_log,
):
    """pick_max_batch generalized to multi-program pipelines: the first
    (descending) candidate where EVERY program of the pipeline fits the
    budget. `programs_for_batch(batch)` returns (name, jitted, args)
    triples (see predictor_programs). Returns (batch, info) or
    (None, info)."""
    info_all = {}
    for batch in candidates:
        infos = {}
        ok = True
        for prog_name, jitted, args in programs_for_batch(batch):
            compiled, info = guarded_compile(
                jitted, args, name=f"{name}_{prog_name}_b{batch}",
                budget_bytes=budget_bytes, log=log,
            )
            infos[prog_name] = info
            if compiled is None:
                ok = False
                break
        info_all[batch] = infos
        if ok:
            log(f"[{name}] auto batch -> {batch}")
            return batch, info_all
    return None, info_all


def synthetic_box(rng: np.random.RandomState) -> np.ndarray:
    """One plausible BDD-scale XYXY box for synthetic training batches."""
    x1 = rng.rand() * 1000
    y1 = rng.rand() * 600
    w = 20 + rng.rand() * 200
    h = 20 + rng.rand() * 100
    return np.array([x1, y1, x1 + w, y1 + h], np.float32)
