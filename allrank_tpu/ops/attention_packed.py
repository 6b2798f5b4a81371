"""Packed-layout fused slate attention — zero-transpose Pallas TPU kernel.

``fused_slate_attention`` (attention_pallas.py) wins the isolated q/k/v
grad chain at paper scale, but in the full encoder it forces 8 HBM
transposes per sublayer ([B, L, h, dk] <-> [B, h, L, dk] around the custom
call) plus a split/reshape fence between the QKV projection and the kernel
— measured in-situ, the glue costs more than the fusion saves.

This kernel removes the glue entirely by working in the projection's own
layout: it consumes the fused QKV matmul output ``[B, L, 3*d]`` directly
(q | k | v, each with h contiguous dk-lane head blocks), loops the heads
IN-KERNEL via lane slices, and writes context ``[B, L, d]`` straight into
the out-projection's operand layout. The backward emits ``dqkv`` packed the
same way, feeding the projection's weight-gradient matmul with no
rearrangement. Between the two projections, nothing touches HBM but the
[B, L, 3d] activations themselves.

Dropout on attention probabilities runs in-kernel from the on-core PRNG;
the backward replays the identical mask from the same seed (head draw
order matches), so nothing stochastic is stored.
(reference: allrank/models/transformer.py:118-156 — MultiHeadedAttention)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from allrank_tpu.constants import NEG_INF_FILL

F32 = jnp.float32
_SEED_MIX = 1000003  # distinct PRNG stream per grid program


def _dot_qk(q, k):
    """[G, L, dk] x [G, L, dk] -> [G, L, L] (contract dk), fp32 accum."""
    return jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=F32,
    )


def _dot(a, b):
    """[G, L, M] @ [G, M, N] -> [G, L, N], fp32 accumulation."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=F32,
    )


def _dot_t(a, b):
    """a^T @ b: [G, L, M], [G, L, N] -> [G, M, N], fp32 accumulation."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=F32,
    )


def _head_probs(q, k, padded, scale):
    s = _dot_qk(q, k) * scale
    s = jnp.where(padded[:, None, :] > 0.5, NEG_INF_FILL, s)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    # reciprocal-multiply: a broadcast divide of the [G, L, L] tile costs
    # ~10x a multiply per lane; the rowwise reciprocal is only [G, L, 1]
    return e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))


def _keep_mask(shape, p_drop: float):
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return bits >= jnp.uint32(int(p_drop * (2**32 - 1)))


def _fwd_kernel(seed_ref, qkv_ref, mask_ref, o_ref, *,
                h: int, dk: int, scale: float, p_drop: float):
    qkv = qkv_ref[...]          # [bb, L, 3d]
    padded = mask_ref[:, 0]     # [bb, L] (singleton axis keeps the block
                                # shape legal for any bb)
    d = h * dk
    if p_drop > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * _SEED_MIX)
    for i in range(h):
        q = qkv[:, :, i * dk:(i + 1) * dk]
        k = qkv[:, :, d + i * dk:d + (i + 1) * dk]
        v = qkv[:, :, 2 * d + i * dk:2 * d + (i + 1) * dk]
        p = _head_probs(q, k, padded, scale)
        if p_drop > 0.0:
            keep = _keep_mask(p.shape, p_drop)
            p = jnp.where(keep, p / (1.0 - p_drop), 0.0)
        ctx = _dot(p.astype(v.dtype), v)
        o_ref[:, :, i * dk:(i + 1) * dk] = ctx.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, qkv_ref, mask_ref, do_ref, dqkv_ref, *,
                h: int, dk: int, scale: float, p_drop: float):
    qkv = qkv_ref[...]
    padded = mask_ref[:, 0]
    do = do_ref[...]            # [bb, L, d]
    d = h * dk
    if p_drop > 0.0:
        # same per-program seed and same head draw order as the forward:
        # the replayed keep masks are bit-identical
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * _SEED_MIX)
        inv = 1.0 / (1.0 - p_drop)
    for i in range(h):
        q = qkv[:, :, i * dk:(i + 1) * dk]
        k = qkv[:, :, d + i * dk:d + (i + 1) * dk]
        v = qkv[:, :, 2 * d + i * dk:2 * d + (i + 1) * dk]
        do_h = do[:, :, i * dk:(i + 1) * dk]
        p = _head_probs(q, k, padded, scale)
        if p_drop > 0.0:
            keep = _keep_mask(p.shape, p_drop)
            p_dropped = jnp.where(keep, p * inv, 0.0)
        else:
            p_dropped = p
        dv = _dot_t(p_dropped.astype(do_h.dtype), do_h)
        dp = _dot_qk(do_h, v)
        if p_drop > 0.0:
            dp = jnp.where(keep, dp * inv, 0.0)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = jnp.where(padded[:, None, :] > 0.5, 0.0, ds)
        ds = ds.astype(k.dtype)
        dqkv_ref[:, :, i * dk:(i + 1) * dk] = \
            (_dot(ds, k) * scale).astype(dqkv_ref.dtype)
        dqkv_ref[:, :, d + i * dk:d + (i + 1) * dk] = \
            (_dot_t(ds, q) * scale).astype(dqkv_ref.dtype)
        dqkv_ref[:, :, 2 * d + i * dk:2 * d + (i + 1) * dk] = \
            dv.astype(dqkv_ref.dtype)


def _batch_block(b: int, l: int, h: int) -> int:
    """Slates per program: keep the per-head [bb, L, L] fp32 probs tile
    within ~2.5 MB and at most 4 slate-head rows' worth of work per
    program (v5e measurement: many small programs pipeline better)."""
    budget = int(2.5 * 1024 * 1024)
    bb = max(1, min(b, max(1, 4 // h) if h <= 4 else 1,
                    budget // max(1, 4 * l * l)))
    while b % bb:
        bb -= 1
    return bb


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def packed_slate_attention(qkv, key_mask, seed, h: int, p_drop: float = 0.0):
    """Masked multi-head softmax attention in the QKV projection's layout.

    qkv: [B, L, 3*d] (the fused projection output; q | k | v, each d = h*dk
    with head blocks contiguous on lanes); key_mask: [B, L] (True/nonzero =
    padded); seed: int32 scalar for in-kernel dropout; h (static): heads.
    Returns context [B, L, d] in the input dtype, ready for the output
    projection."""
    return _fwd_call(qkv, key_mask, seed, h, p_drop)


def _specs(l, d3, bb):
    qkv = pl.BlockSpec((bb, l, d3), lambda i, *_: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    mask = pl.BlockSpec((bb, 1, l), lambda i, *_: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return qkv, mask


def _fwd_call(qkv, key_mask, seed, h, p_drop):
    b, l, d3 = qkv.shape
    d = d3 // 3
    dk = d // h
    scale = 1.0 / (dk ** 0.5)
    bb = _batch_block(b, l, h)
    qkv_spec, mask_spec = _specs(l, d3, bb)
    out_spec = pl.BlockSpec((bb, l, d), lambda i, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_fwd_kernel, h=h, dk=dk, scale=scale,
                               p_drop=float(p_drop))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bb,),
        in_specs=[qkv_spec, mask_spec],
        out_specs=out_spec,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, l, d), qkv.dtype),
    )(jnp.asarray(seed, dtype=jnp.int32).reshape(1), qkv,
      key_mask.astype(F32)[:, None, :])


def _attention_fwd(qkv, key_mask, seed, h, p_drop):
    out = _fwd_call(qkv, key_mask, seed, h, p_drop)
    return out, (qkv, key_mask, seed)


def _attention_bwd(h, p_drop, residuals, do):
    qkv, key_mask, seed = residuals
    b, l, d3 = qkv.shape
    d = d3 // 3
    dk = d // h
    scale = 1.0 / (dk ** 0.5)
    bb = _batch_block(b, l, h)
    qkv_spec, mask_spec = _specs(l, d3, bb)
    do_spec = pl.BlockSpec((bb, l, d), lambda i, *_: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    kernel = functools.partial(_bwd_kernel, h=h, dk=dk, scale=scale,
                               p_drop=float(p_drop))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bb,),
        in_specs=[qkv_spec, mask_spec, do_spec],
        out_specs=qkv_spec,
    )
    dqkv = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, l, d3), qkv.dtype),
    )(jnp.asarray(seed, dtype=jnp.int32).reshape(1), qkv,
      key_mask.astype(F32)[:, None, :], do.astype(qkv.dtype))
    return dqkv, None, None


packed_slate_attention.defvjp(_attention_fwd, _attention_bwd)
