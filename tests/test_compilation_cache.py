"""Warm-seed + read-retry mechanics of the persistent compilation cache.

Round-3 postmortem: the driver's end-of-round bench always started cold
because ~/.cache is wiped by container rebuilds (BENCH_r03: 0 hits / 286
misses). The fix is a repo-resident warm_cache/ seed dir; these tests
cover the copy/sync plumbing and the retrying read wrapper without
touching the session-global jax cache config.
"""

import os

import pytest

from pod_compare_tpu.utils import compilation_cache as cc


def _write(path, size):
    with open(path, "wb") as f:
        f.write(b"x" * size)


def test_copy_if_absent_links_and_skips(tmp_path):
    src = tmp_path / "src"
    dst = tmp_path / "dst"
    src.mkdir()
    _write(src / "a-cache", 10)
    _write(src / "b-cache", 2_000_000)
    assert cc._copy_if_absent(str(src), str(dst)) == 2
    # existing entries are never touched (content-addressed names)
    _write(src / "c-cache", 5)
    assert cc._copy_if_absent(str(src), str(dst)) == 1
    assert sorted(os.listdir(dst)) == ["a-cache", "b-cache", "c-cache"]
    # min_bytes filters small entries
    dst2 = tmp_path / "dst2"
    assert cc._copy_if_absent(str(src), str(dst2), min_bytes=1_000_000) == 1
    assert os.listdir(dst2) == ["b-cache"]


def test_sync_warm_cache_round_trip(tmp_path, monkeypatch):
    live = tmp_path / "live"
    seed = tmp_path / "seed"
    live.mkdir()
    _write(live / "jit_pipeline-deadbeef-cache", 2_000_000)
    _write(live / "jit_tiny-cafe-cache", 100)
    monkeypatch.setattr(cc, "_DEFAULT_CACHE_DIR", str(live))
    monkeypatch.setenv("POD_COMPARE_WARM_CACHE", str(seed))
    # Round-4 default: EVERYTHING syncs — the cold-start cost is the long
    # tail of small jit programs, not the big pipelines (see module
    # docstring); a min_bytes override still filters.
    assert cc.sync_warm_cache() == 2
    assert sorted(os.listdir(seed)) == [
        "jit_pipeline-deadbeef-cache", "jit_tiny-cafe-cache",
    ]
    # idempotent
    assert cc.sync_warm_cache() == 0
    seed2 = tmp_path / "seed2"
    monkeypatch.setenv("POD_COMPARE_WARM_CACHE", str(seed2))
    assert cc.sync_warm_cache(min_bytes=1_000_000) == 1
    assert os.listdir(seed2) == ["jit_pipeline-deadbeef-cache"]
    # a fresh (post-rebuild) live cache re-seeds from the repo dir
    monkeypatch.setenv("POD_COMPARE_WARM_CACHE", str(seed))
    live2 = tmp_path / "live2"
    assert cc._copy_if_absent(cc.seed_dir(), str(live2)) == 2
    assert sorted(os.listdir(live2)) == [
        "jit_pipeline-deadbeef-cache", "jit_tiny-cafe-cache",
    ]


def test_read_retry_retries_errors_not_misses(monkeypatch):
    from jax._src import compilation_cache as jax_cc
    from jax._src import compiler as jax_compiler

    cc._install_read_retry()
    wrapped = jax_compiler._cache_read
    assert getattr(wrapped, "_pod_compare_retry", False)
    # installation is idempotent
    cc._install_read_retry()
    assert jax_compiler._cache_read is wrapped

    calls = {"n": 0}

    def flaky(cache_key, compile_options, backend, executable_devices):
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError("transient remote-runtime hiccup")
        return "EXE", 42

    monkeypatch.setattr(jax_cc, "get_executable_and_time", flaky)
    monkeypatch.setattr(cc.time, "sleep", lambda s: None)
    assert wrapped("mod", "key", None, None, None) == ("EXE", 42)
    assert calls["n"] == 3

    # a genuine miss (None, None) returns immediately — no retry
    calls["n"] = 0

    def miss(*a):
        calls["n"] += 1
        return (None, None)

    monkeypatch.setattr(jax_cc, "get_executable_and_time", miss)
    assert wrapped("mod", "key", None, None, None) == (None, None)
    assert calls["n"] == 1

    # persistent errors exhaust retries, record a fallback, and warn
    def broken(*a):
        raise OSError("permanently broken")

    monkeypatch.setattr(jax_cc, "get_executable_and_time", broken)
    before = len(cc.get_read_fallbacks())
    with pytest.warns(UserWarning, match="permanently broken"):
        assert wrapped("mod2", "key2", None, None, None) == (None, None)
    fallbacks = cc.get_read_fallbacks()
    assert len(fallbacks) == before + 1
    assert fallbacks[-1][0] == "mod2"
