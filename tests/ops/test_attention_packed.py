"""Packed-layout fused attention kernel vs the XLA einsum path.

Interpreter-mode parity (the on-core PRNG is a zero-stub there; dropout
numerics are validated on hardware by tools/tpu_kernel_checks.py, and the
backward dropout MATH is isolated below with a deterministic mask)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from allrank_tpu.constants import NEG_INF_FILL
from allrank_tpu.ops.attention_packed import packed_slate_attention


def _data(B=3, h=2, L=48, dk=16, seed=0):
    rng = np.random.RandomState(seed)
    qkv = jnp.asarray(rng.randn(B, L, 3 * h * dk).astype(np.float32))
    mask = jnp.asarray(np.arange(L)[None, :] >= np.array([L, 30, 5])[:B, None])
    return qkv, mask, h, dk


def _ref(qkv, mask, h, dk):
    b, l, d3 = qkv.shape
    d = d3 // 3
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, l, h, dk)
    k = k.reshape(b, l, h, dk)
    v = v.reshape(b, l, h, dk)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(dk)
    s = jnp.where(mask[:, None, None, :], NEG_INF_FILL, s)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, l, d)


def test_forward_matches_einsum_attention():
    qkv, mask, h, dk = _data()
    seed = jnp.zeros((), jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        out = packed_slate_attention(qkv, mask, seed, h, 0.0)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref(qkv, mask, h, dk)), atol=1e-5
    )


def test_gradients_match_einsum_attention():
    qkv, mask, h, dk = _data()
    seed = jnp.zeros((), jnp.int32)

    def loss_kernel(a):
        return jnp.sum(jnp.sin(packed_slate_attention(a, mask, seed, h, 0.0)))

    def loss_ref(a):
        return jnp.sum(jnp.sin(_ref(a, mask, h, dk)))

    with pltpu.force_tpu_interpret_mode():
        gk = jax.grad(loss_kernel)(qkv)
    gr = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), atol=1e-5)


def test_fully_padded_rows_produce_finite_output():
    qkv, mask, h, dk = _data()
    mask = jnp.ones_like(mask)
    seed = jnp.zeros((), jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        out = packed_slate_attention(qkv, mask, seed, h, 0.0)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_seed_ignored_without_dropout():
    qkv, mask, h, dk = _data()
    with pltpu.force_tpu_interpret_mode():
        a = packed_slate_attention(qkv, mask, jnp.int32(1), h, 0.0)
        b = packed_slate_attention(qkv, mask, jnp.int32(2), h, 0.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bf16_forward_and_grad_dtypes():
    qkv, mask, h, dk = _data()
    qb = qkv.astype(jnp.bfloat16)
    seed = jnp.zeros((), jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        out_b = packed_slate_attention(qb, mask, seed, h, 0.0)
        out_f = packed_slate_attention(qkv, mask, seed, h, 0.0)

        def loss(a):
            return jnp.sum(
                packed_slate_attention(a, mask, seed, h, 0.0)
                .astype(jnp.float32)
            )

        g = jax.grad(loss)(qb)
    assert out_b.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out_b, dtype=np.float32), np.asarray(out_f), atol=3e-2
    )
    assert g.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(g, dtype=np.float32)).all()


def test_dropout_backward_math_with_deterministic_mask(monkeypatch):
    """Isolate the dropout flow from the PRNG: patch the keep-mask to a
    deterministic checkerboard (fwd and bwd see the same function, exactly
    as the PRNG replay guarantees on hardware) and compare value+grads
    against an XLA rebuild using the identical per-head mask."""
    import allrank_tpu.ops.attention_packed as P

    qkv, mask, h, dk = _data()
    p_drop = 0.5
    inv = 1.0 / (1.0 - p_drop)

    def fake_keep(shape, p):
        rows = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 2)
        cols = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
        return ((rows + cols) % 2) == 0

    monkeypatch.setattr(P, "_keep_mask", fake_keep)

    def ker_loss(a):
        return jnp.sum(jnp.sin(
            P.packed_slate_attention(a, mask, jnp.int32(0), h, p_drop)
        ))

    def xla_loss(a):
        b, l, d3 = a.shape
        d = d3 // 3
        q, k, v = jnp.split(a, 3, axis=-1)
        q = q.reshape(b, l, h, dk)
        k = k.reshape(b, l, h, dk)
        v = v.reshape(b, l, h, dk)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(dk)
        s = jnp.where(mask[:, None, None, :], NEG_INF_FILL, s)
        p = jax.nn.softmax(s, -1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (l, l), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (l, l), 1)
        keep = ((rows + cols) % 2) == 0
        p = jnp.where(keep[None, None], p * inv, 0.0)
        out = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, l, d)
        return jnp.sum(jnp.sin(out))

    with pltpu.force_tpu_interpret_mode():
        val_k = ker_loss(qkv)
        g_k = jax.grad(ker_loss)(qkv)
    val_x = xla_loss(qkv)
    g_x = jax.grad(xla_loss)(qkv)
    np.testing.assert_allclose(float(val_k), float(val_x), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_x), atol=1e-4)
