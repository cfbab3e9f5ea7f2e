"""Utility tests: table renderer, event storage, section timer."""

import json
import os

from pod_compare_tpu.utils.events import EventStorage
from pod_compare_tpu.utils.profiling import SectionTimer
from pod_compare_tpu.utils.table import Table


def test_table_renders():
    t = Table(["A", "BB", "CCC"])
    t.add_row([1, 2.5, "x"])
    t.add_row(["long-value", "y", "z"])
    out = str(t)
    lines = out.splitlines()
    assert lines[0].startswith("+") and lines[0].endswith("+")
    assert "A" in lines[1] and "BB" in lines[1]
    assert "long-value" in out
    # all rows equal width
    assert len({len(l) for l in lines}) == 1


def test_table_rejects_bad_row():
    t = Table(["A", "B"])
    try:
        t.add_row([1])
        assert False
    except ValueError:
        pass


def test_event_storage_roundtrip(tmp_path):
    s = EventStorage(str(tmp_path))
    s.iter = 3
    s.put_scalars(loss=1.5, lr=0.01)
    s.write()
    s.iter = 4
    s.put_scalar("loss", 1.0)
    s.write()
    s.close()
    with open(tmp_path / "metrics.jsonl") as f:
        recs = [json.loads(l) for l in f]
    assert recs[0]["loss"] == 1.5 and recs[0]["iteration"] == 3
    assert recs[1]["loss"] == 1.0
    assert s.median("loss") in (1.0, 1.5)


def test_section_timer():
    timer = SectionTimer()
    with timer.section("a"):
        sum(range(1000))
    with timer.section("a"):
        pass
    rep = timer.report()
    assert "a:" in rep and "2 calls" in rep


def test_runtime_safe_batch_cap_mc_iid():
    """mc_iid pipelines get the empirical batch cap (a v5e runtime fault
    at b>=20 that compile-time HBM analysis provably cannot see —
    utils/hbm_guard.py); analytic pipelines trust the compile guard."""
    from pod_compare_tpu.config import get_cfg
    from pod_compare_tpu.utils.hbm_guard import (
        MC_IID_PROVEN_SAFE_BATCH,
        runtime_safe_batch_cap,
    )

    cfg = get_cfg()
    assert runtime_safe_batch_cap(cfg) is None  # analytic default
    cfg.PROBABILISTIC_INFERENCE.BOX_SAMPLING = "mc_iid"
    assert runtime_safe_batch_cap(cfg) == MC_IID_PROVEN_SAFE_BATCH
    cfg.PROBABILISTIC_INFERENCE.BOX_SAMPLING = "analytic"
    cfg.PROBABILISTIC_INFERENCE.CLS_SAMPLING = "mc_iid"
    assert runtime_safe_batch_cap(cfg) == MC_IID_PROVEN_SAFE_BATCH
