"""TensorBoard event-file writer (first-party, utils/tb_events.py).

The reference installs TensorBoard writers via detectron2's default_setup
(core/setup.py:195); this environment has no tensorboard package, so the
format (TFRecord framing + Event proto + masked CRC-32C) is emitted and
verified directly.
"""

import glob
import os
import struct

import numpy as np
import pytest

from pod_compare_tpu.utils.tb_events import (
    TBEventWriter,
    _crc32c,
    _masked_crc,
    read_events,
)


def test_crc32c_known_vectors():
    """CRC-32C (Castagnoli) against published test vectors (RFC 3720)."""
    assert _crc32c(b"") == 0x0
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA


def test_writer_roundtrip(tmp_path):
    w = TBEventWriter(str(tmp_path))
    w.add_scalars(1, {"loss": 2.5, "lr": 1e-3})
    w.add_scalars(7, {"loss": 1.25})
    w.close()

    files = glob.glob(os.path.join(str(tmp_path), "events.out.tfevents.*"))
    assert len(files) == 1
    events = list(read_events(files[0]))
    assert events[0][0] == 1
    np.testing.assert_allclose(events[0][1]["loss"], 2.5)
    np.testing.assert_allclose(events[0][1]["lr"], 1e-3, rtol=1e-6)
    assert events[1] == (7, {"loss": 1.25})


def test_file_version_header_framing(tmp_path):
    """First record is the brain.Event:2 header with valid TFRecord
    framing (lengths + both masked CRCs) — the exact bytes tensorboard's
    loader checks before reading anything else."""
    w = TBEventWriter(str(tmp_path))
    w.close()
    data = open(w.path, "rb").read()
    (length,) = struct.unpack("<Q", data[:8])
    (hcrc,) = struct.unpack("<I", data[8:12])
    assert hcrc == _masked_crc(data[:8])
    payload = data[12:12 + length]
    (pcrc,) = struct.unpack("<I", data[12 + length:16 + length])
    assert pcrc == _masked_crc(payload)
    assert b"brain.Event:2" in payload


def test_event_storage_writes_tb(tmp_path):
    from pod_compare_tpu.utils.events import EventStorage

    storage = EventStorage(str(tmp_path))
    storage.put_scalars(total_loss=3.0, lr=0.01)
    storage.step()
    storage.write()
    storage.close()

    files = glob.glob(os.path.join(str(tmp_path), "events.out.tfevents.*"))
    assert len(files) == 1
    events = list(read_events(files[0]))
    assert events[-1][0] == 1
    np.testing.assert_allclose(events[-1][1]["total_loss"], 3.0)
