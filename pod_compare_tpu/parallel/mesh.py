"""Device mesh construction and sharding helpers.

TPU-native replacement for the reference's process-spawn + NCCL DDP stack
(reference: detectron2.engine.launch at train_net.py:91-98; SURVEY.md §2.4):
a single-controller `jax.sharding.Mesh` with a data axis; gradient reduction
becomes XLA `psum` over ICI inserted automatically by jit+shardings. A
separate optional member axis serves vmapped ensembles.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(num_devices: int = -1, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` local devices."""
    devices = jax.devices()
    if num_devices == -1:
        num_devices = len(devices)
    assert num_devices <= len(devices), (
        f"requested {num_devices} devices, have {len(devices)}"
    )
    return Mesh(np.array(devices[:num_devices]), (axis_name,))


def create_ensemble_mesh(
    num_members: int, data_devices: int = -1
) -> Mesh:
    """2-D ('member', 'data') mesh for sharded ensemble inference: each
    member's replica runs on its own mesh slice (SURVEY.md §2.3 — the
    honest multi-chip analog of "ensemble parallelism")."""
    devices = jax.devices()
    if data_devices == -1:
        data_devices = len(devices) // num_members
    need = num_members * data_devices
    assert need <= len(devices), (need, len(devices))
    return Mesh(
        np.array(devices[:need]).reshape(num_members, data_devices),
        ("member", "data"),
    )


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Optional[Mesh], axis_name: str = "data") -> dict:
    """Device-put a host batch with the leading axis sharded."""
    if mesh is None:
        return batch
    sharding = data_sharding(mesh, axis_name)
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def gather_process_results(results: list) -> list:
    """All-gather per-process JSON-serializable result lists across a
    multi-controller run; returns the concatenation in process order on
    every process.

    TPU-native analog of the reference's COCOEvaluator rank gather
    (detectron2.utils.comm.gather, exercised from train_net.py:73-75;
    SURVEY.md §2.4). Host-side and off the hot path: each process's
    results are serialized to a uint8 payload, padded to the global max
    length, and exchanged with `process_allgather` (which rides the same
    distributed runtime the gradient all-reduce uses). No-op on a single
    process."""
    import json

    import jax

    if jax.process_count() == 1:
        return results
    from jax.experimental import multihost_utils

    payload = np.frombuffer(
        json.dumps(results).encode("utf-8"), dtype=np.uint8
    )
    lengths = multihost_utils.process_allgather(
        np.asarray(payload.size, np.int64)
    ).ravel()
    padded = np.zeros((int(lengths.max()),), np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    merged = []
    for row, n in zip(np.asarray(gathered), lengths):
        merged.extend(json.loads(bytes(row[: int(n)]).decode("utf-8")))
    return merged


def is_main_process() -> bool:
    """Rank-0 gate for writers (reference: comm.is_main_process(),
    train_net.py:74)."""
    import jax

    return jax.process_index() == 0


def maybe_initialize_distributed() -> bool:
    """Initialize multi-host JAX when launched under a multi-process
    coordinator (replaces detectron2's `launch` --num-machines/--machine-rank
    path, SURVEY.md §2.4). Controlled by standard JAX env vars
    (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID) or cloud
    auto-detection; no-op on a single host."""
    import os

    import jax

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if not addr:
        return False
    kwargs = {"coordinator_address": addr}
    # Explicit env overrides beat cluster auto-detection — mirrors the
    # reference launcher's --num-machines/--machine-rank flags
    # (train_net.py:91-98).
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    return True
