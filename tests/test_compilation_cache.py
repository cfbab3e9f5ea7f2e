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
    # conftest's enable_persistent_cache points this at the session cache
    monkeypatch.setattr(cc, "_ACTIVE_CACHE_DIR", None)
    monkeypatch.setenv("POD_COMPARE_WARM_CACHE", str(seed))
    # Round-4 default: EVERYTHING syncs — the cold-start cost is the long
    # tail of small jit programs, not the big pipelines (see module
    # docstring); a min_bytes override still filters.
    assert cc.sync_warm_cache() == 2
    assert sorted(os.listdir(seed)) == [
        cc._MANIFEST_NAME, "jit_pipeline-deadbeef-cache",
        "jit_tiny-cafe-cache",
    ]
    # every synced entry is tagged with the current toolchain generation;
    # the seen ordinal stays 0 until the entry is OBSERVED LIVE (hit or
    # written by the wrappers) — merely being present in the live dir
    # does not refresh it (round-5 hard-cap postmortem).
    tag = cc._version_tag()
    manifest = cc._load_manifest(str(seed))
    assert manifest["syncs"] == 1
    assert manifest["generations"] == {tag: 1}
    assert manifest["entries"] == {
        "jit_pipeline-deadbeef-cache": {"gen": tag, "seen": 0},
        "jit_tiny-cafe-cache": {"gen": tag, "seen": 0},
    }
    # idempotent
    assert cc.sync_warm_cache() == 0
    seed2 = tmp_path / "seed2"
    monkeypatch.setenv("POD_COMPARE_WARM_CACHE", str(seed2))
    assert cc.sync_warm_cache(min_bytes=1_000_000) == 1
    assert sorted(os.listdir(seed2)) == [
        cc._MANIFEST_NAME, "jit_pipeline-deadbeef-cache",
    ]
    # a fresh (post-rebuild) live cache re-seeds from the repo dir
    monkeypatch.setenv("POD_COMPARE_WARM_CACHE", str(seed))
    live2 = tmp_path / "live2"
    assert cc._copy_if_absent(cc.seed_dir(), str(live2)) == 2
    assert sorted(os.listdir(live2)) == [
        "jit_pipeline-deadbeef-cache", "jit_tiny-cafe-cache",
    ]


def test_sync_warm_cache_uses_active_cache_dir(tmp_path, monkeypatch):
    """sync must read the dir enable_persistent_cache() activated, not the
    import-time default — an explicit cache_dir otherwise compiles into
    one dir while sync scans another and silently returns 0 (the exact
    cold-start failure the feature exists to prevent)."""
    active = tmp_path / "active"
    stale_default = tmp_path / "default"
    seed = tmp_path / "seed"
    active.mkdir()
    stale_default.mkdir()
    _write(active / "jit_real-cache", 50)
    _write(stale_default / "jit_wrong-cache", 50)
    monkeypatch.setattr(cc, "_DEFAULT_CACHE_DIR", str(stale_default))
    monkeypatch.setattr(cc, "_ACTIVE_CACHE_DIR", str(active))
    monkeypatch.setenv("POD_COMPARE_WARM_CACHE", str(seed))
    assert cc.sync_warm_cache() == 1
    assert "jit_real-cache" in os.listdir(seed)
    assert "jit_wrong-cache" not in os.listdir(seed)


def test_sync_warm_cache_prunes_stale_generations(tmp_path, monkeypatch):
    """A jax/jaxlib rebuild rotates every XLA cache key; the seed entries
    tagged by the previous generation can never match again and must be
    pruned instead of accumulating a dead ~200 MB generation per rebuild
    in the git-tracked seed dir — but only after a grace window of
    _GENERATION_GRACE syncs, so two alternating toolchains
    (version-matrix CI) don't churn each other's entries every run."""
    live = tmp_path / "live"
    seed = tmp_path / "seed"
    live.mkdir()
    seed.mkdir()
    monkeypatch.setattr(cc, "_DEFAULT_CACHE_DIR", str(live))
    monkeypatch.setattr(cc, "_ACTIVE_CACHE_DIR", None)
    monkeypatch.setenv("POD_COMPARE_WARM_CACHE", str(seed))
    # a seed generation written by an older toolchain (v1 manifest:
    # migrates with last_seen 0)
    _write(seed / "jit_old-cache", 40)
    cc._save_manifest(str(seed), {"jit_old-cache": "jax-0.0.1/jaxlib-0.0.1"})
    _write(live / "jit_new-cache", 40)
    # sync 1: the old generation is within grace and survives
    assert cc.sync_warm_cache() == 1
    assert "jit_old-cache" in os.listdir(seed)
    # sync 2: grace exhausted (unseen for _GENERATION_GRACE syncs) — pruned
    assert cc.sync_warm_cache() == 0
    assert sorted(os.listdir(seed)) == [cc._MANIFEST_NAME, "jit_new-cache"]
    manifest = cc._load_manifest(str(seed))
    assert manifest["entries"] == {
        "jit_new-cache": {"gen": cc._version_tag(), "seen": 0}
    }
    assert manifest["generations"] == {cc._version_tag(): 2}
    # prune_stale=False keeps foreign generations (opt-out) forever
    _write(seed / "jit_old2-cache", 40)
    manifest["entries"]["jit_old2-cache"] = {
        "gen": "jax-0.0.1/jaxlib-0.0.1", "seen": 0,
    }
    cc._save_manifest(str(seed), manifest)
    assert cc.sync_warm_cache(prune_stale=False) == 0
    assert "jit_old2-cache" in os.listdir(seed)
    assert cc.sync_warm_cache(prune_stale=False) == 0
    assert "jit_old2-cache" in os.listdir(seed)
    # ...and prune_stale=True removes it (its generation is long unseen)
    assert cc.sync_warm_cache() == 0
    assert "jit_old2-cache" not in os.listdir(seed)
    # pre-manifest entries (no row) are adopted into the current generation
    _write(seed / "jit_legacy-cache", 40)
    assert cc.sync_warm_cache() == 0
    manifest = cc._load_manifest(str(seed))
    assert manifest["entries"]["jit_legacy-cache"]["gen"] == cc._version_tag()
    assert "jit_legacy-cache" in os.listdir(seed)


def test_sync_warm_cache_alternating_generations_no_churn(tmp_path, monkeypatch):
    """ADVICE r4: two toolchains alternating syncs against the same seed
    must not delete each other's entries — each generation is re-seen
    every other sync, always inside the grace window."""
    live = tmp_path / "live"
    seed = tmp_path / "seed"
    live.mkdir()
    monkeypatch.setattr(cc, "_DEFAULT_CACHE_DIR", str(live))
    monkeypatch.setattr(cc, "_ACTIVE_CACHE_DIR", None)
    monkeypatch.setenv("POD_COMPARE_WARM_CACHE", str(seed))
    _write(live / "jit_a-cache", 40)

    tags = ["jax-A/jaxlib-A", "jax-B/jaxlib-B"] * 3
    for i, tag in enumerate(tags):
        monkeypatch.setattr(cc, "_version_tag", lambda t=tag: t)
        if i == 1:
            _write(live / "jit_b-cache", 40)
        cc.sync_warm_cache()
        assert "jit_a-cache" in os.listdir(seed), f"sync {i} churned A"
        if i >= 1:
            assert "jit_b-cache" in os.listdir(seed), f"sync {i} churned B"


def test_sync_warm_cache_byte_cap_lru(tmp_path, monkeypatch):
    """VERDICT r4 #7: the git-tracked seed is bounded — over the cap, the
    oldest-seen entries are evicted first; entries hit by the persistent
    cache (or freshly written by a compile) this session refresh their
    seen ordinal and survive."""
    live = tmp_path / "live"
    seed = tmp_path / "seed"
    live.mkdir()
    monkeypatch.setattr(cc, "_DEFAULT_CACHE_DIR", str(live))
    monkeypatch.setattr(cc, "_ACTIVE_CACHE_DIR", None)
    monkeypatch.setenv("POD_COMPARE_WARM_CACHE", str(seed))

    # sync 1: two old entries land (seen=1)
    _write(live / "jit_stale-cache", 60)
    _write(live / "jit_hot-cache", 60)
    assert cc.sync_warm_cache(cap_bytes=1000) == 2
    # sync 2: a fresh entry pushes the seed over the cap; jit_hot is hit
    # this session, jit_stale is not — jit_stale is the LRU victim.
    _write(live / "jit_fresh-cache", 60)
    assert cc.sync_warm_cache(
        cap_bytes=150, hit_keys={"jit_hot-cache", "jit_fresh-cache"}
    ) == 1
    names = set(os.listdir(seed)) - {cc._MANIFEST_NAME}
    assert names == {"jit_hot-cache", "jit_fresh-cache"}
    manifest = cc._load_manifest(str(seed))
    assert manifest["entries"]["jit_hot-cache"]["seen"] == 2


def test_sync_warm_cache_byte_cap_is_hard(tmp_path, monkeypatch):
    """Round-5 postmortem: entries merely PRESENT in the shared live
    cache (probe runs, test-suite programs) must NOT count as live — a
    fresh-entry eviction exemption let 5k such leftovers balloon the
    git-tracked seed to 568 MB. The cap now holds unconditionally:
    copied-but-not-observed-live entries are evicted before live ones,
    and live ones shed largest-first if the live set alone overflows."""
    live = tmp_path / "live"
    seed = tmp_path / "seed"
    live.mkdir()
    monkeypatch.setattr(cc, "_DEFAULT_CACHE_DIR", str(live))
    monkeypatch.setattr(cc, "_ACTIVE_CACHE_DIR", None)
    monkeypatch.setenv("POD_COMPARE_WARM_CACHE", str(seed))

    # A big leftover (another process's probe) + two live entries: the
    # leftover goes first even though it is fresh this sync. The hit set
    # carries BARE jax cache keys while files are named "{key}-cache"
    # (jax LRUCache suffix) — the sync must match on the stem, or live
    # entries silently lose their protection (round-5 review finding).
    _write(live / "jit_leftover-cache", 500)
    _write(live / "jit_live_small-cache", 40)
    _write(live / "jit_live_big-cache", 100)
    hit = {"jit_live_small", "jit_live_big"}
    assert cc.sync_warm_cache(cap_bytes=150, hit_keys=hit) == 3
    names = set(os.listdir(seed)) - {cc._MANIFEST_NAME}
    assert names == {"jit_live_small-cache", "jit_live_big-cache"}
    # Live set alone over the cap: largest live entry is shed first (the
    # small-program long tail is the expensive part of a cold start).
    # (Drop the evicted leftover from the live dir — in the real flow a
    # fresh container's live cache is seeded FROM the repo dir, so an
    # evicted entry only reappears if genuinely recompiled.)
    os.remove(live / "jit_leftover-cache")
    assert cc.sync_warm_cache(cap_bytes=50, hit_keys=hit) == 0
    names = set(os.listdir(seed)) - {cc._MANIFEST_NAME}
    assert names == {"jit_live_small-cache"}
    # An older live cohort (the TPU bench set during a later CPU gate
    # sync) survives as long as the cap allows: the never-live newcomer
    # is evicted first even though the cohort's seen is older.
    os.remove(live / "jit_live_big-cache")
    _write(live / "jit_gate-cache", 40)
    _write(live / "jit_noise-cache", 40)
    assert cc.sync_warm_cache(cap_bytes=90, hit_keys={"jit_gate"}) == 2
    names = set(os.listdir(seed)) - {cc._MANIFEST_NAME}
    assert names == {"jit_live_small-cache", "jit_gate-cache"}
    # The default live record is hits ∪ writes: the write recorder marks
    # keys compiled this session.
    cc._install_write_recorder()
    from jax._src import compilation_cache as jax_cc
    assert getattr(jax_cc.put_executable_and_time, "_pod_compare_record", False)


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
