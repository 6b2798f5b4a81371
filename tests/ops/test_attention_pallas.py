"""Fused slate attention kernel vs the XLA einsum path — interpreter mode."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from allrank_tpu.constants import NEG_INF_FILL
from allrank_tpu.ops.attention_pallas import fused_slate_attention


def _data(B=3, h=2, L=48, dk=16, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, h, L, dk).astype(np.float32))
    k = jnp.asarray(rng.randn(B, h, L, dk).astype(np.float32))
    v = jnp.asarray(rng.randn(B, h, L, dk).astype(np.float32))
    mask = jnp.asarray(np.arange(L)[None, :] >= np.array([L, 30, 5])[:, None])
    return q, k, v, mask


def _ref(q, k, v, mask):
    dk = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(dk)
    scores = jnp.where(mask[:, None, None, :], NEG_INF_FILL, scores)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def test_forward_matches_einsum_attention():
    q, k, v, mask = _data()
    seed = jnp.zeros((), jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        out = fused_slate_attention(q, k, v, mask, seed, 0.0)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref(q, k, v, mask)), atol=1e-5
    )


def test_gradients_match_einsum_attention():
    q, k, v, mask = _data()
    seed = jnp.zeros((), jnp.int32)

    def loss_fused(q, k, v):
        return jnp.sum(jnp.sin(fused_slate_attention(q, k, v, mask, seed, 0.0)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(_ref(q, k, v, mask)))

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fully_padded_rows_produce_finite_output():
    q, k, v, mask = _data()
    mask = jnp.ones_like(mask)  # everything padded
    seed = jnp.zeros((), jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        out = fused_slate_attention(q, k, v, mask, seed, 0.0)
    assert bool(jnp.all(jnp.isfinite(out)))


class TestBf16:
    """bf16 storage dtype: values near the fp32 path, grads in primal dtype
    (a custom_vjp whose tangents don't match primal dtypes fails to trace —
    this was a latent crash for bf16 training at L >= 512)."""

    def test_bf16_forward_and_grad_dtypes(self):
        q, k, v, mask = _data()
        qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
        seed = jnp.zeros((), jnp.int32)
        with pltpu.force_tpu_interpret_mode():
            out_b = fused_slate_attention(qb, kb, vb, mask, seed, 0.0)
            out_f = fused_slate_attention(q, k, v, mask, seed, 0.0)

            def loss(q, k, v):
                return jnp.sum(
                    fused_slate_attention(q, k, v, mask, seed, 0.0)
                    .astype(jnp.float32)
                )

            grads = jax.grad(loss, argnums=(0, 1, 2))(qb, kb, vb)
        assert out_b.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(out_b, dtype=np.float32), np.asarray(out_f),
            atol=3e-2,
        )
        for g in grads:
            assert g.dtype == jnp.bfloat16
            assert np.isfinite(np.asarray(g, dtype=np.float32)).all()
