"""Multi-host smoke test (VERDICT round-1 item #6).

Spawns TWO separate CPU processes that rendezvous through
`maybe_initialize_distributed` (parallel/mesh.py) — the replacement for the
reference's multi-machine `launch(--num-machines/--machine-rank)` path
(reference: train_net.py:91-98) — build a global mesh spanning both
processes' devices, and run a jitted gradient whose all-reduce crosses the
process boundary.
"""

import os
import socket
import subprocess
import sys

CHILD = r"""
import os, sys
port, pid = sys.argv[1], sys.argv[2]
# sitecustomize pins JAX_PLATFORMS to the TPU plugin at interpreter start;
# re-pin to CPU post-import (tests/conftest.py recipe).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2"
    ).strip()
os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
os.environ["JAX_NUM_PROCESSES"] = "2"
os.environ["JAX_PROCESS_ID"] = pid

import jax
jax.config.update("jax_platforms", "cpu")

from pod_compare_tpu.parallel.mesh import (
    create_mesh, data_sharding, maybe_initialize_distributed, replicated,
)

assert maybe_initialize_distributed(), "distributed init did not trigger"
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()      # 2 procs x 2 cpu devices
assert len(jax.local_devices()) == 2

import numpy as np
import jax.numpy as jnp

mesh = create_mesh()  # 1-D data mesh over all 4 global devices
shard = data_sharding(mesh)
rep = replicated(mesh)

# Global batch 4 (1 row/device), rows valued 0..3; this process owns 2.
rank = int(pid)
local_rows = (np.arange(2, dtype=np.float32) + 2 * rank)[:, None] * np.ones(
    (1, 8), np.float32
)
x = jax.make_array_from_process_local_data(shard, local_rows)
w = jnp.ones((8,), jnp.float32)

@jax.jit
def grad_fn(w, x):
    # d/dw sum((x @ w)^2) = 2 x^T (x w): reduces over the sharded batch
    # axis -> XLA inserts a cross-process all-reduce (the DDP analog).
    return jax.grad(lambda w: jnp.sum((x @ w) ** 2))(w)

g = jax.jit(grad_fn, in_shardings=(rep, shard), out_shardings=rep)(w, x)
# rows r_i = i * ones(8): grad = 2 * sum_i i*ones(8) * 8i = 16 * sum(i^2)
expected = 16.0 * sum(i * i for i in range(4))
np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-6)
print(f"MULTIHOST_OK rank={rank} grad={float(g[0]):.1f}")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_train_axis(tmp_path):
    script = tmp_path / "child.py"
    script.write_text(CHILD)
    port = _free_port()

    env = dict(os.environ)
    # children build their own platform/device config; scrub the parent
    # test-session pins so they start clean
    env.pop("XLA_FLAGS", None)
    # the child script lives in tmp — put the repo root on its path
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(port), str(rank)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, text=True,
        )
        for rank in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"
        assert f"MULTIHOST_OK rank={rank}" in out, out[-4000:]
