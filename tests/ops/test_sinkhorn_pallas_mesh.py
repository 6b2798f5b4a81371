"""Fused Sinkhorn under a device mesh: the kernel runs per-shard through
shard_map (interpreter mode on the 8-virtual-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from allrank_tpu.config import ParallelConfig
from allrank_tpu.ops.soft_sort import sinkhorn_scaling
from allrank_tpu.parallel import make_mesh


def test_pallas_backend_under_mesh_matches_xla():
    mesh = make_mesh(ParallelConfig(data=4, model=1))
    rng = np.random.RandomState(0)
    m = jnp.asarray((np.abs(rng.randn(8, 48, 48)) + 0.1).astype(np.float32))
    mask = jnp.asarray(
        np.arange(48)[None, :] >= np.tile([48, 30], 4)[:, None]
    )
    ref = sinkhorn_scaling(m, mask=mask, backend="xla", tol=0.0)
    with mesh, pltpu.force_tpu_interpret_mode():
        out = jax.jit(
            lambda m: sinkhorn_scaling(m, mask=mask, backend="pallas")
        )(m)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_pallas_backend_under_mesh_gradients():
    mesh = make_mesh(ParallelConfig(data=2, model=1))
    rng = np.random.RandomState(1)
    m = jnp.asarray((np.abs(rng.randn(4, 32, 32)) + 0.1).astype(np.float32))

    def loss(backend):
        return lambda m: jnp.sum(
            jnp.sin(sinkhorn_scaling(m, backend=backend, tol=0.0, max_iter=20))
        )

    g_ref = jax.grad(loss("xla"))(m)
    with mesh, pltpu.force_tpu_interpret_mode():
        g = jax.jit(jax.grad(loss("pallas")))(m)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-6)
