"""Sequence-parallel Sinkhorn on the 8-virtual-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from allrank_tpu.config import ParallelConfig
from allrank_tpu.ops.soft_sort import sinkhorn_scaling, sinkhorn_scaling_sp
from allrank_tpu.parallel import make_mesh


def _mats(n=4, l=64, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray((np.abs(rng.randn(n, l, l)) + 0.1).astype(np.float32))


def test_sp_matches_unsharded():
    mesh = make_mesh(ParallelConfig(data=1, model=4))
    m = _mats()
    with mesh:
        out_sp = jax.jit(lambda m: sinkhorn_scaling_sp(m, mesh, "model"))(m)
    ref = sinkhorn_scaling(m, backend="xla", tol=0.0)
    np.testing.assert_allclose(np.asarray(out_sp), np.asarray(ref), atol=2e-6)


def test_sp_with_mask_matches_unsharded():
    mesh = make_mesh(ParallelConfig(data=1, model=8))
    m = _mats(n=3, l=64, seed=1)
    mask = jnp.asarray(np.arange(64)[None, :] >= np.array([64, 40, 16])[:, None])
    with mesh:
        out_sp = jax.jit(
            lambda m: sinkhorn_scaling_sp(m, mesh, "model", mask=mask)
        )(m)
    ref = sinkhorn_scaling(m, mask=mask, backend="xla", tol=0.0)
    np.testing.assert_allclose(np.asarray(out_sp), np.asarray(ref), atol=2e-6)


def test_sp_is_differentiable():
    mesh = make_mesh(ParallelConfig(data=1, model=4))
    m = _mats(n=2, l=32)

    def loss_sp(m):
        return jnp.sum(jnp.sin(sinkhorn_scaling_sp(m, mesh, "model",
                                                   max_iter=20)))

    def loss_ref(m):
        return jnp.sum(jnp.sin(sinkhorn_scaling(m, backend="xla", tol=0.0,
                                                max_iter=20)))

    with mesh:
        g_sp = jax.jit(jax.grad(loss_sp))(m)
    g_ref = jax.grad(loss_ref)(m)
    np.testing.assert_allclose(np.asarray(g_sp), np.asarray(g_ref), atol=1e-6)
