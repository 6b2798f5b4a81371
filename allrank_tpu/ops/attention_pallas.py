"""Fused masked slate attention — Pallas TPU kernel with custom VJP.

The slate encoder's attention materializes [B, h, L, L] score and probability
tensors in HBM (XLA path in models/transformer.py). At slate lengths where
the whole L x L tile fits VMEM (240x240 fp32 = 230 KB), this kernel fuses
scores -> key-padding mask -> softmax -> (dropout) -> probs @ V without
writing the intermediates — flash-attention style, but single-tile: no
online softmax needed at slate scale.

Blocking: the (batch, head) axes flatten into one grid axis and each program
processes a BLOCK of G_B slates/heads at once (sized to ~5 MB of VMEM probs),
so at paper scale (B=64, h=4, L=240) the grid is ~16 fat programs instead of
64 thin ones — the MXU sees [G_B*L, L] matmuls and per-program overhead
amortizes. Operands keep the tower's storage dtype (bf16 rides the MXU at
full rate); scores/softmax accumulate fp32.

Dropout on the attention probabilities (the reference trains with it,
reference allrank/models/transformer.py:150-156) runs IN-KERNEL from the
on-core PRNG: the backward replays the identical mask from the same seed, so
nothing stochastic is stored.

Backward recomputes the softmax in VMEM (cheap at slate scale) and runs the
standard attention VJP:
    dV = P^T dO;  dP = dO V^T;  dS = P (.) (dP - rowsum(dP (.) P))
    dQ = dS K / sqrt(dk);  dK = dS^T Q / sqrt(dk)
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


def _dot(a, b):
    """batched [G, L, M] @ [G, M, N] -> [G, L, N], fp32 accumulation."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=F32,
    )


def _dot_t(a, b):
    """batched a^T @ b: [G, L, M], [G, L, N] -> [G, M, N], fp32 accumulation."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=F32,
    )


def _probs(q, k, padded, scale):
    """[G, L, dk] x [G, L, dk] + [G, L] key-padded flags -> [G, L, L] fp32
    softmax (operands stay in their storage dtype for full MXU rate)."""
    scores = _dot(q, jnp.swapaxes(k, 1, 2)) * scale
    scores = jnp.where(padded[:, None, :] > 0.5, NEG_INF_FILL, scores)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    # reciprocal-multiply: a broadcast divide of the [G, L, L] tile costs
    # ~10x a multiply per lane; the rowwise reciprocal is only [G, L, 1]
    return e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))


def _dropout_keep(shape, p_drop: float):
    """Deterministic keep-mask from the already-seeded on-core PRNG."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = jnp.uint32(int(p_drop * (2**32 - 1)))
    return bits >= threshold


def _program_seed(seed_ref):
    return seed_ref[0] + pl.program_id(0) * _SEED_MIX


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, *,
                scale: float, p_drop: float):
    # blocks carry a singleton axis 1 so the group dim is not subject to
    # Mosaic's last-two-dims alignment rules; squeeze it here
    q, k, v = q_ref[:, 0], k_ref[:, 0], v_ref[:, 0]
    p = _probs(q, k, mask_ref[:, 0], scale)
    if p_drop > 0.0:
        pltpu.prng_seed(_program_seed(seed_ref))
        keep = _dropout_keep(p.shape, p_drop)
        p = jnp.where(keep, p / (1.0 - p_drop), 0.0)
    o_ref[:, 0] = _dot(p.astype(v.dtype), v).astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float, p_drop: float):
    q, k, v = q_ref[:, 0], k_ref[:, 0], v_ref[:, 0]
    do = do_ref[:, 0]
    padded = mask_ref[:, 0]
    p = _probs(q, k, padded, scale)
    if p_drop > 0.0:
        pltpu.prng_seed(_program_seed(seed_ref))
        keep = _dropout_keep(p.shape, p_drop)
        inv = 1.0 / (1.0 - p_drop)
        p_dropped = jnp.where(keep, p * inv, 0.0)
    else:
        p_dropped = p

    dv_ref[:, 0] = _dot_t(p_dropped.astype(do.dtype), do).astype(dv_ref.dtype)
    dp = _dot(do, jnp.swapaxes(v, 1, 2))
    if p_drop > 0.0:
        dp = jnp.where(keep, dp * inv, 0.0)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = jnp.where(padded[:, None, :] > 0.5, 0.0, ds)
    ds = ds.astype(k.dtype)
    dq_ref[:, 0] = (_dot(ds, k) * scale).astype(dq_ref.dtype)
    dk_ref[:, 0] = (_dot_t(ds, q) * scale).astype(dk_ref.dtype)


def _group_block(g: int, l: int) -> int:
    """Slate-head rows per program: keep the [gb, L, L] fp32 probs tile
    within ~2.5 MB of VMEM (several same-size temporaries live alongside,
    plus double-buffered input blocks), and at most 4 rows per program —
    measured on v5e, many small programs pipeline better than few fat ones
    (L=240: gb=4 0.173 ms vs gb=8 0.191 vs gb=16 0.197 grad-chain)."""
    budget = int(2.5 * 1024 * 1024)
    gb = max(1, min(g, 4, budget // max(1, 4 * l * l)))
    while g % gb:
        gb -= 1
    return gb


def _specs(l, dk, gb):
    qkv = pl.BlockSpec((gb, 1, l, dk), lambda i, *_: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    mask = pl.BlockSpec((gb, 1, l), lambda i, *_: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return qkv, mask


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_slate_attention(q, k, v, key_mask, seed, p_drop: float = 0.0):
    """Masked softmax attention over slates, fused on TPU.

    q, k, v: [B, h, L, d_k] float32 or bfloat16 (bf16 operands keep the MXU
    at full rate; scores/softmax accumulate fp32); key_mask: [B, L]
    (True/nonzero = padded document); seed: int32 scalar array driving
    in-kernel dropout. Returns [B, h, L, d_k] in the input dtype. ``p_drop``
    (static) applies dropout to the attention probabilities during training.
    """
    return _fwd_call(q, k, v, key_mask, p_drop, seed)


def _prep(q, k, v, key_mask):
    """[B, h, L, dk] -> [B*h, 1, L, dk] (storage dtype kept; the singleton
    axis keeps block shapes legal for any group size) + mask [B*h, 1, L]."""
    b, h, l, dk = q.shape

    def flat(x):
        return x.reshape(b * h, 1, l, dk)

    mask = jnp.repeat(key_mask.astype(F32), h, axis=0)[:, None, :]
    return flat(q), flat(k), flat(v), mask


def _fwd_call(q, k, v, key_mask, p_drop, seed):
    b, h, l, dk = q.shape
    scale = 1.0 / (dk ** 0.5)
    g = b * h
    gb = _group_block(g, l)
    qkv_spec, mask_spec = _specs(l, dk, gb)
    kernel = functools.partial(_fwd_kernel, scale=scale, p_drop=float(p_drop))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g // gb,),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, mask_spec],
        out_specs=qkv_spec,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g, 1, l, dk), q.dtype),
    )(jnp.asarray(seed, dtype=jnp.int32).reshape(1), *_prep(q, k, v, key_mask))
    return out.reshape(b, h, l, dk)


def _attention_fwd(q, k, v, key_mask, seed, p_drop):
    out = _fwd_call(q, k, v, key_mask, p_drop, seed)
    return out, (q, k, v, key_mask, seed)


def _attention_bwd(p_drop, residuals, do):
    q, k, v, key_mask, seed = residuals
    b, h, l, dk = q.shape
    scale = 1.0 / (dk ** 0.5)
    g = b * h
    gb = _group_block(g, l)
    qkv_spec, mask_spec = _specs(l, dk, gb)
    kernel = functools.partial(_bwd_kernel, scale=scale, p_drop=float(p_drop))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g // gb,),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, mask_spec, qkv_spec],
        out_specs=[qkv_spec, qkv_spec, qkv_spec],
    )
    dq, dk_, dv = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((g, 1, l, dk), q.dtype),
            jax.ShapeDtypeStruct((g, 1, l, dk), k.dtype),
            jax.ShapeDtypeStruct((g, 1, l, dk), v.dtype),
        ],
    )(jnp.asarray(seed, dtype=jnp.int32).reshape(1), *_prep(q, k, v, key_mask),
      do.astype(q.dtype).reshape(g, 1, l, dk))

    def unflat(x):
        return x.reshape(b, h, l, dk)

    return unflat(dq), unflat(dk_), unflat(dv), None, None


fused_slate_attention.defvjp(_attention_fwd, _attention_bwd)
