"""Sequence-parallel NeuralNDCG: the slate-axis sharded soft-sort path
(parallel.sequence mesh axis) must match the replicated path in value AND
gradient at long slate lengths (L >= 1024) on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from allrank_tpu.config import ParallelConfig
from allrank_tpu.losses.neuralndcg import neuralNDCG, neuralNDCG_transposed
from allrank_tpu.parallel import make_mesh

L = 1024
B = 2


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(0)
    y_pred = rng.randn(B, L).astype(np.float32)
    y_true = rng.randint(0, 5, size=(B, L)).astype(np.float32)
    y_true[1, L // 2:] = -1.0  # second slate half padded
    return jnp.asarray(y_pred), jnp.asarray(y_true)


@pytest.fixture(scope="module")
def sp_mesh():
    return make_mesh(ParallelConfig(data=1, model=1, sequence=8))


def _value_and_grad(fn, y_pred, y_true, **kw):
    val, grad = jax.value_and_grad(lambda p: fn(p, y_true, **kw))(y_pred)
    return np.asarray(val), np.asarray(grad)


@pytest.mark.parametrize("loss_fn", [neuralNDCG, neuralNDCG_transposed])
def test_sp_matches_replicated_deterministic(batch, sp_mesh, loss_fn):
    y_pred, y_true = batch
    ref_v, ref_g = _value_and_grad(loss_fn, y_pred, y_true, temperature=1.0)
    with sp_mesh:
        sp_v, sp_g = _value_and_grad(loss_fn, y_pred, y_true, temperature=1.0)
    np.testing.assert_allclose(sp_v, ref_v, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(sp_g, ref_g, rtol=1e-3, atol=1e-6)


def test_sp_matches_replicated_stochastic(batch, sp_mesh):
    y_pred, y_true = batch
    key = jax.random.PRNGKey(7)
    kw = dict(temperature=1.0, stochastic=True, n_samples=2, rng=key)
    ref_v, ref_g = _value_and_grad(neuralNDCG, y_pred, y_true, **kw)
    with sp_mesh:
        sp_v, sp_g = _value_and_grad(neuralNDCG, y_pred, y_true, **kw)
    np.testing.assert_allclose(sp_v, ref_v, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(sp_g, ref_g, rtol=1e-3, atol=1e-6)


def test_sp_inactive_when_length_not_divisible(batch, sp_mesh):
    """L % sequence != 0 falls back to the replicated path (still correct)."""
    y_pred, y_true = batch
    yp, yt = y_pred[:, : L - 3], y_true[:, : L - 3]
    ref = float(neuralNDCG(yp, yt, temperature=1.0))
    with sp_mesh:
        got = float(neuralNDCG(yp, yt, temperature=1.0))
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_sp_under_jit_with_data_axis(batch):
    """SP composes with data parallelism: ('data' 2, 'sequence' 4) mesh,
    jitted loss over a data-sharded batch."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    y_pred, y_true = batch
    mesh = make_mesh(ParallelConfig(data=2, model=1, sequence=4))
    ref = float(neuralNDCG(y_pred, y_true, temperature=1.0))
    with mesh:
        s = NamedSharding(mesh, P("data"))
        yp = jax.device_put(y_pred, s)
        yt = jax.device_put(y_true, s)
        got = float(
            jax.jit(lambda p, t: neuralNDCG(p, t, temperature=1.0))(yp, yt)
        )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)
