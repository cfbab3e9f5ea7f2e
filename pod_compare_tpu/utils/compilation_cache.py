"""Persistent XLA compilation cache.

The reference has no analog (PyTorch eager pays no compile cost); under
JAX every CLI/bench invocation re-traces and re-compiles its pipelines
(~200 s for the BayesOD+MC program at BDD geometry, BENCH_r01.json tail).
Enabling `jax_compilation_cache_dir` persists compiled executables keyed
by (HLO, compile options, backend version), so the second invocation of
any entry point warms up in seconds.
"""

import os

_DEFAULT_CACHE_DIR = os.environ.get(
    "POD_COMPARE_COMPILATION_CACHE",
    os.path.expanduser("~/.cache/pod_compare_tpu/jax_cache"),
)


def enable_persistent_cache(cache_dir: str = None) -> str:
    """Turn on JAX's persistent compilation cache (idempotent).

    Set POD_COMPARE_COMPILATION_CACHE="" to disable entirely.

    Returns the cache directory in use ("" when disabled).
    """
    cache_dir = _DEFAULT_CACHE_DIR if cache_dir is None else cache_dir
    if not cache_dir:
        return ""
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything: the default thresholds skip small/fast programs,
    # but the per-image vmapped pipelines are exactly the ones re-hit by
    # every CLI run.
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return cache_dir
