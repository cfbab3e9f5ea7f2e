"""bench.py configuration safety: the mc_iid batch default must follow
the pipeline layout — batch 24 is only proven safe for the SPLIT form;
the fused form kernel-faults the v5e worker at b17+ (round-5 review
finding; DESIGN.md §5d)."""

import subprocess
import sys

_SNIPPET = "import bench; print(bench.MC_IID_SPLIT, bench.MC_IID_BATCH)"


def _probe(env_extra):
    import os

    env = dict(os.environ)
    env.pop("BENCH_MC_IID_BATCH", None)
    env.pop("BENCH_MC_IID_SPLIT", None)
    env.update(env_extra)
    out = subprocess.run(
        [sys.executable, "-c", _SNIPPET],
        capture_output=True, text=True, env=env, check=True,
        cwd=__file__.rsplit("/tests/", 1)[0],
    )
    split, batch = out.stdout.split()
    return split == "True", int(batch)


def test_default_is_split_at_24():
    assert _probe({}) == (True, 24)


def test_disabling_split_drops_batch_to_proven_fused_boundary():
    assert _probe({"BENCH_MC_IID_SPLIT": "0"}) == (False, 16)


def test_explicit_batch_override_still_wins():
    assert _probe(
        {"BENCH_MC_IID_SPLIT": "0", "BENCH_MC_IID_BATCH": "8"}
    ) == (False, 8)
