"""FFN-sublayer megakernel: LN -> W1 -> ReLU -> dropout -> W2 -> dropout ->
residual, one Pallas TPU program per slate block.

Companion to ops/attention_block.py — once the attention sublayer runs as
an opaque kernel, XLA can no longer hide the FFN's HBM traffic under the
attention matmuls, so the FFN's exposed time grows (measured: the encoder
kept ~1.4 ms of non-attention time after the attention megakernel landed).
Fusing the FFN the same way removes the [B, L, d_ff] hidden round-trips
(the dominant FFN traffic) and the exposed-schedule penalty: weights are
VMEM-resident, the backward recomputes the forward in VMEM, and parameter
gradients accumulate in fp32 across the sequential grid.

Semantics replicated exactly from the XLA path (models/transformer.py
block loop; reference allrank/models/transformer.py:83-116):
    y = x + drop(W2 . drop(relu(W1 . LN(x) + b1)) + b2)
with the same unbiased-std LayerNorm and two independent dropout streams.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from allrank_tpu.ops.attention_block import (
    F32,
    _SEED_MIX,
    _dot_t,
    _keep_mask,
    _layer_norm,
    _mm,
    _mm_t,
    VAR_FLOOR,
)


def ffn_sublayer_fwd_vmem(x, gvec, bvec, w1, b1, w2, b2,
                          seed_hidden, seed_resid, *,
                          p_hidden: float, p_resid: float):
    """The whole FFN sublayer on VMEM values:
    ``x + drop(W2 . drop(relu(W1 . LN(x) + b1)) + b2)``. Shared by the
    standalone kernel below and the whole-encoder kernel
    (ops/encoder_block.py). ``gvec/bvec/b1/b2``: 1-D f32 parameter rows;
    seeds: already program-mixed int32 scalars."""
    dtype = x.dtype
    x32 = x.astype(F32)
    d = x32.shape[-1]
    n_act, _, _, _, _ = _layer_norm(x32, gvec, bvec, d)
    n_act = n_act.astype(dtype)
    hidden = jnp.maximum(_mm(n_act, w1.astype(dtype)) + b1, 0.0)
    if p_hidden > 0.0:
        pltpu.prng_seed(seed_hidden)
        keep = _keep_mask(hidden.shape, p_hidden)
        hidden = jnp.where(keep, hidden / (1.0 - p_hidden), 0.0)
    out = _mm(hidden.astype(dtype), w2.astype(dtype)) + b2
    if p_resid > 0.0:
        pltpu.prng_seed(seed_resid)
        keep_r = _keep_mask(out.shape, p_resid)
        out = jnp.where(keep_r, out / (1.0 - p_resid), 0.0)
    return (x32 + out).astype(dtype)


def _fwd_kernel(seeds_ref, x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref,
                b2_ref, y_ref, *, p_hidden: float, p_resid: float):
    mix = pl.program_id(0) * _SEED_MIX
    y_ref[...] = ffn_sublayer_fwd_vmem(
        x_ref[...], g_ref[0], b_ref[0], w1_ref[...], b1_ref[0],
        w2_ref[...], b2_ref[0], seeds_ref[0] + mix, seeds_ref[1] + mix,
        p_hidden=p_hidden, p_resid=p_resid,
    )


def ffn_sublayer_bwd_vmem(x, gvec, bvec, w1_in, b1, w2_in,
                          seed_hidden, seed_resid, dy, *,
                          p_hidden: float, p_resid: float):
    """Reverse of ``ffn_sublayer_fwd_vmem`` on VMEM values (recomputes the
    forward). Returns ``(dx, (dg, db, dw1, db1, dw2, db2))``."""
    dtype = x.dtype
    x32 = x.astype(F32)
    d = x32.shape[-1]
    dy = dy.astype(F32)

    # ---- recompute forward --------------------------------------------------
    n32, xhat, denom, s, var = _layer_norm(x32, gvec, bvec, d)
    n_act = n32.astype(dtype)
    w1 = w1_in.astype(dtype)
    w2 = w2_in.astype(dtype)
    pre = _mm(n_act, w1) + b1
    relu_gate = (pre > 0.0).astype(F32)
    hidden = jnp.maximum(pre, 0.0)
    if p_hidden > 0.0:
        pltpu.prng_seed(seed_hidden)
        inv_h = 1.0 / (1.0 - p_hidden)
        keep_h = _keep_mask(hidden.shape, p_hidden)
        hidden = jnp.where(keep_h, hidden * inv_h, 0.0)
    hidden = hidden.astype(dtype)

    # ---- residual-output dropout ---------------------------------------------
    dout = dy
    if p_resid > 0.0:
        pltpu.prng_seed(seed_resid)
        keep_r = _keep_mask(dout.shape, p_resid)
        dout = jnp.where(keep_r, dout * (1.0 / (1.0 - p_resid)), 0.0)
    dout = dout.astype(dtype)

    # ---- W2 --------------------------------------------------------------------
    dw2_c = jnp.sum(_dot_t(hidden, dout), axis=0)          # [d_ff, d]
    db2_c = jnp.sum(dout.astype(F32), axis=(0, 1))[None, :]
    dh = _mm_t(dout, w2)                                    # [bb, L, d_ff] f32
    if p_hidden > 0.0:
        dh = jnp.where(keep_h, dh * inv_h, 0.0)
    dh = (dh * relu_gate).astype(dtype)

    # ---- W1 ---------------------------------------------------------------------
    dw1_c = jnp.sum(_dot_t(n_act, dh), axis=0)              # [d, d_ff]
    db1_c = jnp.sum(dh.astype(F32), axis=(0, 1))[None, :]
    dn = _mm_t(dh, w1)                                      # [bb, L, d] f32

    # ---- LayerNorm backward ----------------------------------------------------
    dg_c = jnp.sum(dn * xhat, axis=(0, 1))[None, :]
    db_c = jnp.sum(dn, axis=(0, 1))[None, :]
    dxhat = dn * gvec
    c = xhat * denom
    proj = jnp.sum(dxhat * c, axis=-1, keepdims=True)
    gate = (var > VAR_FLOOR).astype(F32)
    dc = dxhat / denom - gate * c * proj / ((d - 1) * s * denom * denom)
    dx_ln = dc - jnp.mean(dc, axis=-1, keepdims=True)
    dx = (dy + dx_ln).astype(dtype)
    return dx, (dg_c, db_c, dw1_c, db1_c, dw2_c, db2_c)


def _bwd_kernel(seeds_ref, x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref,
                b2_ref, dy_ref, dx_ref, dg_ref, db_ref, dw1_ref, db1_ref,
                dw2_ref, db2_ref, *, p_hidden: float, p_resid: float):
    from allrank_tpu.ops.attention_block import accumulate_param_grads

    mix = pl.program_id(0) * _SEED_MIX
    dx, grads = ffn_sublayer_bwd_vmem(
        x_ref[...], g_ref[0], b_ref[0], w1_ref[...], b1_ref[0],
        w2_ref[...], seeds_ref[0] + mix, seeds_ref[1] + mix, dy_ref[...],
        p_hidden=p_hidden, p_resid=p_resid,
    )
    dx_ref[...] = dx
    accumulate_param_grads(
        grads, (dg_ref, db_ref, dw1_ref, db1_ref, dw2_ref, db2_ref)
    )


def _batch_block(b: int, l: int, d_ff: int) -> int:
    """The hidden tile [bb, L, d_ff] is the big tenant here (no [L, L]
    tiles); keep a handful of them under ~6 MB."""
    budget = int(6 * 1024 * 1024)
    per = max(1, 4 * l * d_ff)
    bb = max(1, min(b, 4, budget // per))
    while b % bb:
        bb -= 1
    return bb


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def ffn_sublayer(x, ln_scale, ln_bias, w1, b1, w2, b2, seeds,
                 p_hidden: float = 0.0, p_resid: float = 0.0):
    """x + drop(W2 . drop(relu(W1 . LN(x)))) in one TPU kernel.

    x: [B, L, d]; w1: [d, d_ff]; w2: [d_ff, d]; seeds: int32 [2]
    (hidden-dropout stream, residual-dropout stream)."""
    return _fwd_call(x, ln_scale, ln_bias, w1, b1, w2, b2, seeds,
                     p_hidden, p_resid)


def _param_inputs(ln_scale, ln_bias, w1, b1, w2, b2):
    return (ln_scale.astype(F32)[None, :], ln_bias.astype(F32)[None, :],
            w1, b1.astype(F32)[None, :], w2, b2.astype(F32)[None, :])


def _specs(l, d, d_ff, bb):
    blk = pl.BlockSpec((bb, l, d), lambda i, *_: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    vec = lambda n: pl.BlockSpec((1, n), lambda i, *_: (0, 0),  # noqa: E731
                                 memory_space=pltpu.VMEM)
    mat = lambda m, n: pl.BlockSpec((m, n), lambda i, *_: (0, 0),  # noqa: E731
                                    memory_space=pltpu.VMEM)
    return blk, vec, mat


def _fwd_call(x, ln_scale, ln_bias, w1, b1, w2, b2, seeds, p_hidden,
              p_resid):
    b, l, d = x.shape
    d_ff = w1.shape[1]
    bb = _batch_block(b, l, d_ff)
    blk, vec, mat = _specs(l, d, d_ff, bb)
    kernel = functools.partial(_fwd_kernel, p_hidden=float(p_hidden),
                               p_resid=float(p_resid))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bb,),
        in_specs=[blk, vec(d), vec(d), mat(d, d_ff), vec(d_ff),
                  mat(d_ff, d), vec(d)],
        out_specs=blk,
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, l, d), x.dtype),
    )(jnp.asarray(seeds, dtype=jnp.int32).reshape(2), x,
      *_param_inputs(ln_scale, ln_bias, w1, b1, w2, b2))


def _sub_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, seeds, p_hidden, p_resid):
    out = _fwd_call(x, ln_scale, ln_bias, w1, b1, w2, b2, seeds, p_hidden,
                    p_resid)
    return out, (x, ln_scale, ln_bias, w1, b1, w2, b2, seeds)


def _sub_bwd(p_hidden, p_resid, residuals, dy):
    x, ln_scale, ln_bias, w1, b1, w2, b2, seeds = residuals
    b, l, d = x.shape
    d_ff = w1.shape[1]
    bb = _batch_block(b, l, d_ff)
    blk, vec, mat = _specs(l, d, d_ff, bb)
    kernel = functools.partial(_bwd_kernel, p_hidden=float(p_hidden),
                               p_resid=float(p_resid))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bb,),
        in_specs=[blk, vec(d), vec(d), mat(d, d_ff), vec(d_ff),
                  mat(d_ff, d), vec(d), blk],
        out_specs=[blk, vec(d), vec(d), mat(d, d_ff), vec(d_ff),
                   mat(d_ff, d), vec(d)],
    )
    dx, dg, db, dw1, db1, dw2, db2 = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, l, d), x.dtype),
            jax.ShapeDtypeStruct((1, d), F32),
            jax.ShapeDtypeStruct((1, d), F32),
            jax.ShapeDtypeStruct((d, d_ff), F32),
            jax.ShapeDtypeStruct((1, d_ff), F32),
            jax.ShapeDtypeStruct((d_ff, d), F32),
            jax.ShapeDtypeStruct((1, d), F32),
        ],
    )(jnp.asarray(seeds, dtype=jnp.int32).reshape(2), x,
      *_param_inputs(ln_scale, ln_bias, w1, b1, w2, b2), dy.astype(x.dtype))

    def like(g, ref):
        return g.reshape(ref.shape).astype(ref.dtype)

    return (dx, like(dg, ln_scale), like(db, ln_bias), like(dw1, w1),
            like(db1, b1), like(dw2, w2), like(db2, b2), None)


ffn_sublayer.defvjp(_sub_fwd, _sub_bwd)
