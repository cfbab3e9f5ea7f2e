"""Persistent XLA compilation cache with a repo-resident warm seed.

The reference has no analog (PyTorch eager pays no compile cost); under
JAX every CLI/bench invocation re-traces and re-compiles its pipelines
(~200 s for the BayesOD+MC program at BDD geometry, BENCH_r01.json tail).
Enabling `jax_compilation_cache_dir` persists compiled executables keyed
by (HLO, compile options, backend version), so the second invocation of
any entry point warms up in seconds.

Round-3 postmortem (BENCH_r03 tail: 0 hits / 286 misses): the cache keys
ARE stable — re-compiling the identical bench pipeline in a fresh process
hits the entry a prior process wrote (measured 2026-08-18: XLA compile
2.3 s on a hit vs ~40-50 s cold) — but the cache lived in ``~/.cache``,
which is wiped whenever the round driver rebuilds the container, so the
driver's end-of-round bench always started cold. Two fixes here:

* **Warm seed in the repo** (`<repo>/warm_cache/`): the repo directory is
  the one path that persists across container rebuilds. On
  `enable_persistent_cache()` any seed entries are hard-linked/copied
  into the live cache dir; `sync_warm_cache()` (called by bench.py after
  its legs) copies freshly-compiled executables back into the seed dir so
  the next cold container still warm-starts. If the rebuilt container
  ships a different jaxlib/libtpu the keys simply miss and the normal
  cold compile runs — the seed can never make things worse. Round-4
  finding (2026-08-19): an environment rebuild DID rotate every key (the
  round-3 seeds all missed), and the dominant cold cost is the long tail
  of ~283 small jit programs (~9 min at ~2 s each through the tunnel),
  not the three big pipelines — so the seed now ships every entry
  (SEED_MIN_BYTES=0), including the CPU-platform entries the test suite
  compiles (the suite shares this cache via tests/conftest.py).
* **Read retry**: loading a large (~26-56 MB) serialized executable
  through the remote TPU runtime can fail transiently; stock JAX falls
  straight back to a full compile (`jax._src.compiler._cache_read`
  swallows the exception). `enable_persistent_cache()` wraps the read
  path with a short exponential-backoff retry and records which modules
  still fell back (`get_cache_stats()`).
"""

import json
import logging
import os
import shutil
import time
import warnings

_DEFAULT_SEED_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "warm_cache",
)

_DEFAULT_CACHE_DIR = os.environ.get(
    "POD_COMPARE_COMPILATION_CACHE",
    os.path.expanduser("~/.cache/pod_compare_tpu/jax_cache"),
)

# Sync EVERYTHING into the repo seed dir. Round-4 measurement
# (2026-08-19, fresh container): the three big pipeline executables are
# NOT the cold-start cost — the ~283 small jit programs (model init,
# RNG draws, einsums) are, at ~2 s each through the remote tunnel
# (~9 min of an 18-min cold bench, vs ~4 min for the three big
# compiles). They total ~23 MB, so shipping all of them is cheap.
SEED_MIN_BYTES = int(os.environ.get("POD_COMPARE_WARM_CACHE_MIN_BYTES", 0))

# The cache dir most recently activated by enable_persistent_cache();
# sync_warm_cache() reads from it so an explicit cache_dir argument and
# the warm-seed sync can never silently diverge.
_ACTIVE_CACHE_DIR = None

# Generation manifest: seed entries are tagged with the jax/jaxlib
# version that produced them. XLA cache keys embed the compiler/backend
# version, so entries from another toolchain generation can never match
# again in that generation's absence — sync_warm_cache() prunes them to
# keep the git-tracked seed from growing a dead generation per
# environment rebuild. A generation gets a grace period
# (_GENERATION_GRACE syncs) before its entries are deleted so two
# toolchains alternating syncs against the same seed (e.g. a
# version-matrix CI) don't churn each other's entries every run.
#
# v2 manifest: {"syncs": N, "generations": {tag: last_seen_sync},
# "entries": {name: {"gen": tag, "seen": sync_ordinal}}} where "seen" is
# the last sync at which the entry was OBSERVED LIVE — freshly compiled
# (copied into the seed that sync) or actually HIT by the persistent
# cache this session (the read-retry wrapper records hit keys; cache
# file names ARE the keys). Eviction under the byte cap is LRU on
# "seen", so executables for superseded code revisions age out while
# the entries every bench still loads stay pinned.
_MANIFEST_NAME = "MANIFEST.json"
_GENERATION_GRACE = 2  # syncs a generation may go unseen before pruning

# Hard size cap for the git-tracked seed dir (VERDICT r4 #7: the seed had
# grown to 269 MB, comparable to the repo's whole git history). 200 MB
# because TWO workloads' live sets share the seed: the TPU bench's
# executables (~150 MB — three big pipelines + the small-program tail)
# AND the CPU-mesh gate/test-suite programs (~30-40 MB) that
# dryrun_multichip syncs; a cap below their sum makes alternating
# bench/gate syncs evict each other's entries every run.
SEED_CAP_BYTES = int(
    os.environ.get("POD_COMPARE_WARM_CACHE_CAP_BYTES", int(200e6))
)

# jax's LRUCache names cache files "{key}-cache" (jax._src.lru_cache.
# _CACHE_SUFFIX) while the read/write wrappers observe BARE keys —
# match on the stem so the live set maps onto seed file names.
_CACHE_FILE_SUFFIX = "-cache"


def _key_stem(name: str) -> str:
    return (
        name[: -len(_CACHE_FILE_SUFFIX)]
        if name.endswith(_CACHE_FILE_SUFFIX)
        else name
    )


def _version_tag() -> str:
    import jax
    import jaxlib

    return f"jax-{jax.__version__}/jaxlib-{jaxlib.__version__}"


def _load_manifest(sdir: str) -> dict:
    """Load the seed manifest, migrating the v1 {name: tag} format."""
    path = os.path.join(sdir, _MANIFEST_NAME)
    try:
        with open(path) as f:
            raw = json.load(f)
    except (OSError, ValueError):
        raw = {}
    if "entries" in raw and isinstance(raw.get("entries"), dict):
        raw.setdefault("syncs", 0)
        raw.setdefault("generations", {})
        return raw
    # v1: flat {entry_name: generation_tag}. Treat everything as seen at
    # sync 0 of the new numbering.
    entries = {
        name: {"gen": tag, "seen": 0}
        for name, tag in raw.items()
        if isinstance(tag, str)
    }
    gens = {tag: 0 for tag in set(e["gen"] for e in entries.values())}
    return {"syncs": 0, "generations": gens, "entries": entries}


def _save_manifest(sdir: str, manifest: dict) -> None:
    path = os.path.join(sdir, _MANIFEST_NAME)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=0, sort_keys=True)
    os.replace(tmp, path)


class _CacheEventCounter(logging.Handler):
    """Counts persistent-cache hit/miss debug messages from jax.

    Measured on the v5e tunnel (2026-08-17): keys ARE stable across
    processes and sessions (the b16 train step hit an entry written 100
    min earlier by a different session, 398 s compile -> 61.8 s warm).
    These counters make cache behavior visible: `get_cache_stats()`.
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
_READ_FALLBACKS = []  # (module_name, error repr) after retries exhausted
_HIT_KEYS = set()  # cache keys (== cache file names) hit this session
_WRITTEN_KEYS = set()  # cache keys written (freshly compiled) this session


def get_cache_stats():
    """(hits, misses) counted since enable_persistent_cache()."""
    if _COUNTER is None:
        return (0, 0)
    return (_COUNTER.hits, _COUNTER.misses)


def get_read_fallbacks():
    """Entries whose cached executable failed to load even after retries
    (each fell back to a full compile): list of (module_name, error)."""
    return list(_READ_FALLBACKS)


def _install_read_retry(attempts: int = 3, base_delay_s: float = 2.0):
    """Wrap jax's persistent-cache read with exponential-backoff retries.

    Stock JAX treats ANY exception during the read as a miss and silently
    recompiles (jax._src.compiler._cache_read). On this platform the
    failure mode is a transient remote-runtime hiccup while deserializing
    a large executable, so a couple of retries are far cheaper than the
    ~40-50 s recompile they avoid.
    """
    from jax._src import compiler as _compiler
    from jax._src import compilation_cache as _cc
    from jax._src import config as _config

    if getattr(_compiler._cache_read, "_pod_compare_retry", False):
        return

    def _cache_read_with_retry(
        module_name, cache_key, compile_options, backend, executable_devices
    ):
        last_exc = None
        for attempt in range(attempts):
            try:
                # Returns (None, None) on a genuine miss — no retry then.
                out = _cc.get_executable_and_time(
                    cache_key, compile_options, backend, executable_devices
                )
                if out[0] is not None:
                    # Cache file names ARE the keys: record the hit so
                    # sync_warm_cache's LRU knows this entry is still live.
                    _HIT_KEYS.add(cache_key)
                return out
            except Exception as ex:  # transient read/deserialize failure
                last_exc = ex
                if attempt + 1 < attempts:
                    time.sleep(base_delay_s * (2 ** attempt))
        if _config.raise_persistent_cache_errors.value:
            raise last_exc
        _READ_FALLBACKS.append((module_name, f"{type(last_exc).__name__}: {last_exc}"))
        warnings.warn(
            f"Error reading persistent compilation cache entry for "
            f"'{module_name}' ({attempts} attempts): "
            f"{type(last_exc).__name__}: {last_exc}"
        )
        return None, None

    _cache_read_with_retry._pod_compare_retry = True
    _compiler._cache_read = _cache_read_with_retry


def _install_write_recorder():
    """Record the cache keys WRITTEN (freshly compiled) this session.

    Together with the read wrapper's hit record this defines the
    session's LIVE set — exactly the executables a driver bench run
    touches — which is what sync_warm_cache's byte cap protects. Without
    it, any entry merely PRESENT in the shared live-cache dir (probe
    runs, test-suite CPU programs, superseded revisions) looked as fresh
    as the bench's own programs and was exempt from eviction, which is
    how the round-5 seed blew through its cap (568 MB vs 150)."""
    from jax._src import compilation_cache as _cc

    if getattr(_cc.put_executable_and_time, "_pod_compare_record", False):
        return
    orig = _cc.put_executable_and_time

    def recording_put(cache_key, *args, **kwargs):
        _WRITTEN_KEYS.add(cache_key)
        return orig(cache_key, *args, **kwargs)

    recording_put._pod_compare_record = True
    _cc.put_executable_and_time = recording_put


def _copy_if_absent(src_dir: str, dst_dir: str, min_bytes: int = 0) -> int:
    """Copy cache entries >= min_bytes from src to dst when absent there.

    Hard-links when possible (same filesystem) to avoid duplicating tens
    of MB; entries are content-addressed by name so same-name == same
    content and existing files are never touched.
    """
    copied = 0
    if not os.path.isdir(src_dir):
        return 0
    os.makedirs(dst_dir, exist_ok=True)
    for name in os.listdir(src_dir):
        if name == _MANIFEST_NAME:
            continue  # seed-dir bookkeeping, not a cache entry
        src = os.path.join(src_dir, name)
        dst = os.path.join(dst_dir, name)
        if not os.path.isfile(src) or os.path.exists(dst):
            continue
        if os.path.getsize(src) < min_bytes:
            continue
        try:
            os.link(src, dst)
        except OSError:
            shutil.copyfile(src, dst)
        copied += 1
    return copied


def seed_dir() -> str:
    """Repo-resident warm-seed directory (override: POD_COMPARE_WARM_CACHE)."""
    return os.environ.get("POD_COMPARE_WARM_CACHE", _DEFAULT_SEED_DIR)


def sync_warm_cache(min_bytes: int = SEED_MIN_BYTES, log=None,
                    prune_stale: bool = True,
                    cap_bytes: int = None,
                    hit_keys=None) -> int:
    """Copy live-cache executables into the repo warm-seed dir.

    Called by bench.py after its legs so the expensive TPU programs it
    just compiled survive the next container rebuild. Reads from the
    cache dir activated by enable_persistent_cache() (falling back to
    the default when it was never called). Maintenance on top of the
    copy (VERDICT r4 #7 / ADVICE r4):

    * generation pruning with grace: entries tagged by a jax/jaxlib
      generation that hasn't been the syncing toolchain for
      `_GENERATION_GRACE` consecutive syncs are deleted (their keys can
      never match that environment again). The grace window keeps two
      toolchains alternating against the same seed (version-matrix CI)
      from churning each other's entries every run.
    * HARD LRU byte cap (`cap_bytes`, default SEED_CAP_BYTES = 200 MB):
      only entries OBSERVED LIVE this session — actually hit by the
      persistent cache or freshly written by a compile (`hit_keys`,
      default: the read/write wrappers' records, matched against file
      names by key stem — jax names files "{key}-cache") — refresh
      their "seen" ordinal; entries merely PRESENT in the shared
      live-cache dir (probe runs, test suites, superseded revisions)
      enter at seen=0. Over the cap, eviction is (seen ascending, then
      largest first): never-live leftovers go first, older live
      cohorts (e.g. the TPU bench set during a CPU gate sync) survive
      as long as the cap allows, and this session's live set is shed
      last, largest first — the long tail of small programs is the
      expensive part of a cold start (~9 min vs ~1-3 min for the big
      pipelines, round-4 measurement). The cap holds unconditionally
      (round-5 postmortem: a fresh-entry exemption let 5k probe/test
      leftovers balloon the seed to 568 MB).

    Returns the number of entries newly copied.
    """
    cache = _ACTIVE_CACHE_DIR if _ACTIVE_CACHE_DIR is not None else _DEFAULT_CACHE_DIR
    if not cache:
        return 0
    if cap_bytes is None:
        cap_bytes = SEED_CAP_BYTES
    if hit_keys is None:
        hit_keys = _HIT_KEYS | _WRITTEN_KEYS
    sdir = seed_dir()
    n = _copy_if_absent(cache, sdir, min_bytes=min_bytes)
    tag = _version_tag()
    manifest = _load_manifest(sdir)
    manifest["syncs"] = now = int(manifest.get("syncs", 0)) + 1
    gens = manifest["generations"]
    gens[tag] = now
    entries = manifest["entries"]
    pruned = 0
    names = [
        name for name in (os.listdir(sdir) if os.path.isdir(sdir) else [])
        if name != _MANIFEST_NAME
        and os.path.isfile(os.path.join(sdir, name))
    ]

    def _remove(name):
        try:
            os.remove(os.path.join(sdir, name))
        except OSError:
            return False
        entries.pop(name, None)
        return True

    def _is_live(name):
        return name in hit_keys or _key_stem(name) in hit_keys

    for name in names:
        rec = entries.get(name)
        live = _is_live(name)
        if rec is None:
            # New this sync, or pre-manifest: tagged current generation.
            # Only entries observed live get this sync's ordinal —
            # leftovers merely present in the shared live-cache dir
            # (probe runs, test suites) enter at seen=0, first in the
            # eviction order.
            entries[name] = {"gen": tag, "seen": now if live else 0}
        elif live:
            rec["seen"] = now
            rec["gen"] = tag
        elif (
            prune_stale
            and rec["gen"] != tag
            and now - int(gens.get(rec["gen"], 0)) >= _GENERATION_GRACE
        ):
            pruned += _remove(name)
    # Drop manifest rows whose files are gone (e.g. manual deletion),
    # and generations with no remaining entries (except the current).
    name_set = {
        name for name in (os.listdir(sdir) if os.path.isdir(sdir) else [])
        if name != _MANIFEST_NAME
    }
    manifest["entries"] = entries = {
        k: v for k, v in entries.items() if k in name_set
    }
    live_gens = {v["gen"] for v in entries.values()} | {tag}
    manifest["generations"] = {
        g: s for g, s in gens.items() if g in live_gens
    }

    # HARD LRU byte cap: evict (oldest seen cohort, largest first) until
    # under the cap — never-live leftovers (seen=0) first, older live
    # cohorts next, this session's live set last (see docstring).
    evicted = 0
    sizes = {}
    for name in entries:
        try:
            sizes[name] = os.path.getsize(os.path.join(sdir, name))
        except OSError:
            sizes[name] = 0
    total = sum(sizes.values())
    if total > cap_bytes:
        for name in sorted(
            entries, key=lambda n: (entries[n]["seen"], -sizes[n])
        ):
            if total <= cap_bytes:
                break
            if _remove(name):
                total -= sizes[name]
                evicted += 1

    if name_set or entries:
        _save_manifest(sdir, manifest)
    if log is not None and (n or pruned or evicted):
        log(f"warm_cache: synced {n} new executables into {sdir}"
            + (f"; pruned {pruned} stale-generation entries" if pruned else "")
            + (f"; evicted {evicted} LRU entries over the "
               f"{cap_bytes / 1e6:.0f} MB cap" if evicted else ""))
    return n


def enable_persistent_cache(cache_dir: str = None) -> str:
    """Turn on JAX's persistent compilation cache (idempotent).

    Set POD_COMPARE_COMPILATION_CACHE="" to disable entirely.

    Returns the cache directory in use ("" when disabled).
    """
    global _COUNTER, _ACTIVE_CACHE_DIR
    cache_dir = _DEFAULT_CACHE_DIR if cache_dir is None else cache_dir
    _ACTIVE_CACHE_DIR = cache_dir
    if not cache_dir:
        return ""
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    # Seed from the repo-resident warm cache (survives container
    # rebuilds; see module docstring). Entries are content-addressed so
    # stale seeds are harmless — wrong-version keys simply never match.
    seeded = _copy_if_absent(seed_dir(), cache_dir)
    if seeded:
        logging.getLogger(__name__).info(
            "seeded %d warm-cache entries from %s", seeded, seed_dir()
        )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything: the default thresholds skip small/fast programs,
    # but the per-image vmapped pipelines are exactly the ones re-hit by
    # every CLI run.
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    _install_read_retry()
    _install_write_recorder()
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
