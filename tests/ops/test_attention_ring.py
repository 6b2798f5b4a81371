"""Ring attention over the sequence mesh axis vs the unsharded XLA path.

Runs on the virtual 8-device CPU mesh (conftest). The reference is the exact
masked-softmax einsum attention from models/transformer.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import allrank_tpu.models.transformer as T
from allrank_tpu.config import ParallelConfig
from allrank_tpu.constants import NEG_INF_FILL
from allrank_tpu.ops.attention_ring import ring_slate_attention
from allrank_tpu.parallel import make_mesh


def _ref_attention(q, k, v, mask):
    dk = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(dk)
    s = jnp.where(mask[:, None, None, :], NEG_INF_FILL, s)
    return jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1), v)


def _case(b=4, h=2, l=64, dk=16, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(b, h, l, dk).astype(np.float32))
    k = jnp.asarray(rng.randn(b, h, l, dk).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, l, dk).astype(np.float32))
    lengths = np.array([l, l - 5, l // 2, 3][:b] + [l] * max(0, b - 4))
    mask = jnp.asarray(np.arange(l)[None, :] >= lengths[:b, None])
    return q, k, v, mask


@pytest.mark.parametrize("mesh_shape", [dict(sequence=8),
                                        dict(data=2, sequence=4)])
def test_ring_matches_einsum(mesh_shape):
    mesh = make_mesh(ParallelConfig(**mesh_shape))
    q, k, v, mask = _case()
    ref = _ref_attention(q, k, v, mask)
    with mesh:
        out = jax.jit(lambda *a: ring_slate_attention(
            *a, mesh, "sequence"))(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_ring_gradients_match_einsum():
    mesh = make_mesh(ParallelConfig(sequence=8))
    q, k, v, mask = _case()

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(_ref_attention(q, k, v, mask)))

    def loss_ring(q, k, v):
        return jnp.sum(jnp.sin(ring_slate_attention(
            q, k, v, mask, mesh, "sequence")))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    with mesh:
        g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4)


def test_fully_padded_slate_is_finite():
    mesh = make_mesh(ParallelConfig(sequence=8))
    q, k, v, mask = _case()
    mask = mask.at[1, :].set(True)
    ref = _ref_attention(q, k, v, mask)
    with mesh:
        out = jax.jit(lambda *a: ring_slate_attention(
            *a, mesh, "sequence"))(q, k, v, mask)
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_dropout_deterministic_and_mean_preserving():
    mesh = make_mesh(ParallelConfig(sequence=8))
    q, k, v, mask = _case(l=64)
    rng = jax.random.PRNGKey(5)

    def run(key):
        with mesh:
            return np.asarray(jax.jit(lambda *a: ring_slate_attention(
                *a, mesh, "sequence", p_drop=0.1, rng=key))(q, k, v, mask))

    a, b = run(rng), run(rng)
    np.testing.assert_array_equal(a, b)  # deterministic given key
    c = run(jax.random.PRNGKey(6))
    assert np.abs(a - c).max() > 0.0  # varies across keys

    # inverted dropout keeps the expected context ~unchanged
    keys = [jax.random.PRNGKey(i) for i in range(24)]
    mean = np.mean([run(kk) for kk in keys], axis=0)
    ref = _ref_attention(q, k, v, mask)
    valid = ~np.asarray(mask)[:, None, :, None]
    err = np.abs(mean - np.asarray(ref))[np.broadcast_to(valid, mean.shape)]
    scale = np.abs(np.asarray(ref)).max()
    assert err.mean() / scale < 0.06


def test_transformer_dispatches_ring_on_sequence_mesh(monkeypatch):
    """The encoder takes the ring path under a sequence mesh and matches the
    no-mesh XLA path."""
    import allrank_tpu.ops.attention_ring as R

    from allrank_tpu.ops import autotune

    monkeypatch.setitem(autotune.DEFAULTS, "ring_attention_min_len", 0)
    monkeypatch.setattr(R, "RING_ATTENTION_MIN_LEN", 0)
    tdef = T.TransformerDef(N=2, d_model=16, d_ff=32, h=2, dropout=0.0)
    params = T.transformer_init(jax.random.PRNGKey(0), tdef)
    rng = np.random.RandomState(1)
    b, l = 4, 32
    x = jnp.asarray(rng.randn(b, l, 16).astype(np.float32))
    mask = jnp.asarray(np.arange(l)[None, :] >= np.array([l, 20, 9, 32])[:, None])
    indices = jnp.tile(jnp.arange(l)[None, :], (b, 1))

    ref = T.transformer_apply(params, tdef, x, mask, indices)

    calls = []
    orig = R.ring_slate_attention

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(R, "ring_slate_attention", spy)

    mesh = make_mesh(ParallelConfig(sequence=8))
    with mesh:
        out = jax.jit(lambda p, x: T.transformer_apply(
            p, tdef, x, mask, indices))(params, x)
    assert len(calls) == tdef.N  # one ring dispatch per encoder block
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_dropout_decorrelated_across_data_shards():
    """Same-local-index slates on different data shards must draw different
    dropout masks (the replicated rng is folded with the data-shard index)."""
    mesh = make_mesh(ParallelConfig(data=2, sequence=4))
    b, h, l, dk = 4, 2, 64, 16
    rng_np = np.random.RandomState(7)
    # identical content for every slate: any cross-slate output difference
    # can only come from dropout masks
    one = rng_np.randn(1, h, l, dk).astype(np.float32)
    q = jnp.asarray(np.repeat(one, b, axis=0))
    k = jnp.asarray(np.repeat(rng_np.randn(1, h, l, dk).astype(np.float32),
                              b, axis=0))
    v = jnp.asarray(np.repeat(rng_np.randn(1, h, l, dk).astype(np.float32),
                              b, axis=0))
    mask = jnp.zeros((b, l), dtype=bool)

    with mesh:
        out = np.asarray(jax.jit(lambda *a: ring_slate_attention(
            *a, mesh, "sequence", p_drop=0.3,
            rng=jax.random.PRNGKey(3)))(q, k, v, mask))

    # batch rows 0-1 live on data shard 0, rows 2-3 on shard 1. Before the
    # data-index fold both shards drew the SAME local mask block, making
    # row 0 == row 2 and row 1 == row 3 exactly; decorrelated they differ.
    assert np.abs(out[0] - out[2]).max() > 0.0
    assert np.abs(out[1] - out[3]).max() > 0.0
