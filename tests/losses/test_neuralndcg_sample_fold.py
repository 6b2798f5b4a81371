"""Sample-axis folding for stochastic NeuralNDCG: under a mesh whose model
axis is otherwise idle during the loss, the flattened [S*B] Sinkhorn batch
shards over data AND model, so n_samples rides extra shards instead of
replicating. Value/grad must match the meshless path."""

import jax
import jax.numpy as jnp
import numpy as np

from allrank_tpu.config import ParallelConfig
from allrank_tpu.losses.neuralndcg import neuralNDCG
from allrank_tpu.parallel import make_mesh


def _batch(B=4, L=64, seed=0):
    rng = np.random.RandomState(seed)
    y_pred = jnp.asarray(rng.randn(B, L).astype(np.float32))
    y_true = rng.randint(0, 5, size=(B, L)).astype(np.float32)
    y_true[1, L // 2:] = -1.0
    return y_pred, jnp.asarray(y_true)


def test_stochastic_matches_meshless_under_sample_folding():
    y_pred, y_true = _batch()
    key = jax.random.PRNGKey(3)
    kw = dict(temperature=1.0, stochastic=True, n_samples=8, rng=key)

    def loss(p, t):
        return neuralNDCG(p, t, **kw)

    ref_v, ref_g = jax.value_and_grad(loss)(y_pred, y_true), None
    ref_v, ref_g = ref_v  # (value, grad)

    mesh = make_mesh(ParallelConfig(data=2, model=4))
    with mesh:
        from jax.sharding import NamedSharding, PartitionSpec as P

        s = NamedSharding(mesh, P("data"))
        yp = jax.device_put(y_pred, s)
        yt = jax.device_put(y_true, s)
        v, g = jax.jit(jax.value_and_grad(loss))(yp, yt)
    np.testing.assert_allclose(float(v), float(ref_v), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref_g),
                               rtol=1e-3, atol=1e-6)


def test_sample_batch_is_sharded_over_model_axis():
    """The Sinkhorn input's sharding actually spans ('data','model') —
    inspect the constraint via the jitted computation's output sharding of
    an identity probe on the hinted tensor."""
    from allrank_tpu.ops.soft_sort import batch_shard_hint

    mesh = make_mesh(ParallelConfig(data=2, model=4))
    x = jnp.ones((16, 8, 8), jnp.float32)

    with mesh:
        out = jax.jit(batch_shard_hint)(x)
    # 16 rows over data(2) x model(4) = 8 shards of 2 rows
    assert len(out.sharding.device_set) == 8
    shard_rows = {sh.data.shape[0] for sh in out.addressable_shards}
    assert shard_rows == {2}
