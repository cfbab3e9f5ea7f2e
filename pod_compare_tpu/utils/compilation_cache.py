"""Persistent XLA compilation cache.

The reference has no analog (PyTorch eager pays no compile cost); under
JAX every CLI/bench invocation re-traces and re-compiles its pipelines
(~200 s for the BayesOD+MC program at BDD geometry, BENCH_r01.json tail).
Enabling `jax_compilation_cache_dir` persists compiled executables keyed
by (HLO, compile options, backend version), so the second invocation of
any entry point warms up in seconds.
"""

import logging
import os

_DEFAULT_CACHE_DIR = os.environ.get(
    "POD_COMPARE_COMPILATION_CACHE",
    os.path.expanduser("~/.cache/pod_compare_tpu/jax_cache"),
)


class _CacheEventCounter(logging.Handler):
    """Counts persistent-cache hit/miss debug messages from jax.

    Measured on the v5e tunnel (2026-08-17): keys ARE stable across
    processes and sessions (the b16 train step hit an entry written 100
    min earlier by a different session, 398 s compile -> 61.8 s warm),
    but loading a large (~42 MB) serialized executable through the remote
    runtime is slow and INTERMITTENTLY fails, silently falling back to a
    full compile with no new write (the key already exists). These
    counters make that visible: `get_cache_stats()` after warmup.
    """

    def __init__(self):
        super().__init__(level=logging.DEBUG)
        self.hits = 0
        self.misses = 0

    def emit(self, record):
        msg = record.getMessage()
        if "compilation cache hit" in msg.lower():
            self.hits += 1
        elif "compilation cache miss" in msg.lower():
            self.misses += 1


_COUNTER = None


def get_cache_stats():
    """(hits, misses) counted since enable_persistent_cache()."""
    if _COUNTER is None:
        return (0, 0)
    return (_COUNTER.hits, _COUNTER.misses)


def enable_persistent_cache(cache_dir: str = None) -> str:
    """Turn on JAX's persistent compilation cache (idempotent).

    Set POD_COMPARE_COMPILATION_CACHE="" to disable entirely.

    Returns the cache directory in use ("" when disabled).
    """
    global _COUNTER
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
    if _COUNTER is None:
        _COUNTER = _CacheEventCounter()
        # The hit/miss lines are DEBUG-level in jax._src.compiler; route
        # them through the counter without enabling debug output globally.
        compiler_logger = logging.getLogger("jax._src.compiler")
        compiler_logger.addHandler(_COUNTER)
        if compiler_logger.level in (logging.NOTSET, logging.WARNING):
            # The logger must pass DEBUG records for the counter to see
            # them, but they must NOT propagate (absl/basicConfig root
            # handlers would print every hit/miss line). A local WARNING
            # passthrough keeps real compiler warnings visible.
            compiler_logger.setLevel(logging.DEBUG)
            compiler_logger.propagate = False
            passthrough = logging.StreamHandler()
            passthrough.setLevel(logging.WARNING)
            compiler_logger.addHandler(passthrough)
    return cache_dir
