"""Shared mesh-gate helpers (ops/soft_sort.per_shard_batch /
dispatch_batch_sharded) — the availability/execution halves of every
batch-sharded Pallas kernel dispatcher. Semantics checked with a plain jnp
function on the 8-device CPU mesh (hardware equality of the real kernels
under these helpers is covered by tools/tpu_kernel_checks.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from allrank_tpu.ops.soft_sort import dispatch_batch_sharded, per_shard_batch
from allrank_tpu.config import ParallelConfig
from allrank_tpu.parallel.mesh import make_mesh


def test_per_shard_batch_no_mesh_multi_device():
    # 8 CPU devices, no ambient mesh: no legal dispatch
    assert jax.device_count() == 8
    assert per_shard_batch(64) is None


def test_per_shard_batch_under_mesh():
    mesh = make_mesh(ParallelConfig(data=8))
    with mesh:
        assert per_shard_batch(64) == 8  # 64 / 8 data shards
        # batch 7 doesn't divide the data axis, but the size-1 model/sequence
        # axes always accept it: dispatch stays legal (replicated over data),
        # each kernel invocation sees the full batch
        assert per_shard_batch(7) == 7


def test_per_shard_batch_multi_axis_mesh():
    mesh = make_mesh(ParallelConfig(data=2, model=2, sequence=2))
    with mesh:
        # greedy data -> model -> sequence claims all three divisible axes
        assert per_shard_batch(16) == 2
        # batch 2: only the data axis (size 2) divides
        assert per_shard_batch(2) == 1


def test_dispatch_matches_direct_and_shards():
    x = np.arange(64 * 5, dtype=np.float32).reshape(64, 5)
    w = np.linspace(0.0, 1.0, 5, dtype=np.float32)

    def fn(a, b):
        # per-row math only — batch-sharded kernels never reduce across rows
        return a * 2.0 + b, a @ jnp.broadcast_to(w, b.shape[-1:])

    direct = fn(jnp.asarray(x), jnp.asarray(x))
    mesh = make_mesh(ParallelConfig(data=8))
    with mesh:
        sharded = jax.jit(
            lambda a, b: dispatch_batch_sharded(fn, (a, b), n_out=2)
        )(x, x)
    for d, s in zip(direct, sharded):
        np.testing.assert_allclose(np.asarray(d), np.asarray(s), rtol=1e-6)


def test_dispatch_without_mesh_runs_direct():
    x = np.ones((4, 3), dtype=np.float32)
    out = dispatch_batch_sharded(lambda a: a + 1.0, (jnp.asarray(x),))
    np.testing.assert_array_equal(np.asarray(out), x + 1.0)
