"""REAL multi-process validation of the multi-host input pipeline.

Spawns 2 OS processes that form a JAX CPU cluster (jax.distributed), each
with 2 virtual devices -> a 4-device global mesh. Each process assembles
only its own rows via process_local_rows + SlateBatcher(local_rows=...),
the DevicePrefetcher stitches global arrays with
jax.make_array_from_process_local_data, and a jitted global reduction
proves every slate is consumed exactly once per epoch with correct
content (sum over the global batch equals the host-side truth).

This is the test the virtual single-process mesh cannot provide: it
exercises the actual multi-process sharding semantics of device_put /
make_array that silently dropped (P-1)/P of the data in the round-1
implementation.
"""

import os
import socket
import subprocess
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))

_WORKER = r"""
import os, sys
import numpy as np

proc_id = int(sys.argv[1])
n_procs = int(sys.argv[2])
coord = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=coord,
                           num_processes=n_procs, process_id=proc_id)
assert jax.process_count() == n_procs
assert jax.device_count() == 2 * n_procs

from allrank_tpu.config import ParallelConfig
from allrank_tpu.data.batching import DevicePrefetcher, SlateBatcher
from allrank_tpu.data.dataset import SlateDataset
from allrank_tpu.parallel import batch_shardings, make_mesh, process_local_rows

# identifiable dataset: feature0 = slate id (same on every process)
n_slates, docs, F = 11, 6, 3
X = np.zeros((n_slates * docs, F), dtype=np.float32)
X[:, 0] = np.repeat(np.arange(n_slates, dtype=np.float32), docs)
y = np.tile(np.arange(docs, dtype=np.float32) % 3, n_slates)
qids = np.repeat(np.arange(n_slates), docs)
ds = SlateDataset(X, y, qids)

mesh = make_mesh(ParallelConfig(data=-1))  # 4-way data parallel
G = 4
local_rows = process_local_rows(G, mesh)
assert len(local_rows) == G // n_procs, (local_rows, G, n_procs)

batcher = SlateBatcher(ds, 5, G, shuffle=True, seed=3, local_rows=local_rows)
batcher.set_epoch(1)

import jax.numpy as jnp

@jax.jit
def slate_id_sum(batch):
    # sum of feature0 of doc 0 over real slates of the GLOBAL batch
    return jnp.sum(jnp.where(batch.slate_mask, batch.x[:, 0, 0], 0.0)), \
           jnp.sum(batch.slate_mask.astype(jnp.int32))

total = 0.0
count = 0
with mesh:
    for gb in DevicePrefetcher(batcher, shardings=batch_shardings(mesh)):
        s, c = slate_id_sum(gb)
        total += float(s)
        count += int(c)

expected_sum = float(np.arange(n_slates).sum())
assert count == n_slates, f"consumed {count} slates, expected {n_slates}"
assert abs(total - expected_sum) < 1e-6, (total, expected_sum)
print(f"proc {proc_id}: OK count={count} sum={total}")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_pipeline_consumes_each_slate_once(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = (
        _REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", coord],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=_REPO_ROOT,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert "OK count=11" in out, out
