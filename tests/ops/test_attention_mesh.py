"""Fused attention per-shard through shard_map on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

import allrank_tpu.models.transformer as T
from allrank_tpu.config import ParallelConfig
from allrank_tpu.constants import NEG_INF_FILL
from allrank_tpu.ops.attention_pallas import fused_slate_attention
from allrank_tpu.parallel import make_mesh


def test_sharded_fused_attention_matches_einsum():
    mesh = make_mesh(ParallelConfig(data=4, model=1))
    rng = np.random.RandomState(0)
    B, h, L, dk = 8, 2, 32, 16
    q = jnp.asarray(rng.randn(B, h, L, dk).astype(np.float32))
    k = jnp.asarray(rng.randn(B, h, L, dk).astype(np.float32))
    v = jnp.asarray(rng.randn(B, h, L, dk).astype(np.float32))
    mask = jnp.asarray(np.arange(L)[None, :] >= np.tile([L, 20], 4)[:, None])

    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(dk)
    scores = jnp.where(mask[:, None, None, :], NEG_INF_FILL, scores)
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(scores, -1), v)

    from jax.sharding import PartitionSpec as P

    seed = jnp.zeros((), jnp.int32)
    with mesh, pltpu.force_tpu_interpret_mode():
        out = jax.jit(jax.shard_map(
            lambda q, k, v, m, s: fused_slate_attention(q, k, v, m, s, 0.0),
            mesh=mesh,
            in_specs=(P("data"), P("data"), P("data"), P("data"), P()),
            out_specs=P("data"),
            check_vma=False,
        ))(q, k, v, mask, seed)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_runner_selects_sharded_path_on_mesh(monkeypatch):
    from allrank_tpu.ops import autotune

    monkeypatch.setitem(autotune.DEFAULTS, "fused_attention_min_len", 0)
    monkeypatch.setitem(autotune.DEFAULTS, "fused_attention_bf16_min_len", 0)
    monkeypatch.setattr(T, "FUSED_ATTENTION_MIN_LEN", 0)
    monkeypatch.setattr(T, "FUSED_ATTENTION_BF16_MIN_LEN", 0)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    mesh = make_mesh(ParallelConfig(data=4, model=1))
    with mesh:
        runner = T._fused_attention_runner(slate_length=32, batch=8, p_drop=0.0)
    assert runner is not None
    # indivisible batch -> falls back to XLA
    with mesh:
        assert T._fused_attention_runner(slate_length=32, batch=7, p_drop=0.0) is None
    # no ambient mesh on multi-device -> falls back to XLA
    assert T._fused_attention_runner(slate_length=32, batch=8, p_drop=0.0) is None
