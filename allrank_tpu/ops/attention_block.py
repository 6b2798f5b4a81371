"""Whole-attention-sublayer megakernel: LN -> QKV -> MHA -> out-proj ->
dropout -> residual, one Pallas TPU program per slate block.

Why a megakernel: at paper scale (L=240, d=128) neither a bare attention
kernel nor XLA wins — XLA hides the softmax's VPU work under the adjacent
projection matmuls, which an opaque custom call cannot overlap, so a
kernel that fuses only the attention core ties at best (measured; see
BENCHMARKS.md round-3 attention study). The whole sublayer, however, fits
VMEM at this width: weights are 260 KB total (resident per program), a
4-slate activation block is ~1 MB, and the per-head [bb, L, L] probability
tile is transient. Fusing the full chain removes every intermediate HBM
round-trip — the only traffic is x in, y out (plus the [d, 3d]-sized weight
gradients, accumulated in fp32 across the sequential TPU grid).

Semantics replicated exactly from the XLA path:
  * LayerNorm: a*(x-mean)/(unbiased_std+eps)+b with the 1e-24 variance
    floor (models/core.py:79-92; reference allrank/models/transformer.py:59-81)
  * attention: fused-QKV multi-head softmax with NEG_INF_FILL key masking
    (models/transformer.py `_attention`)
  * dropout on attention probabilities and on the sublayer output, from
    two independent on-core PRNG streams; the backward replays both masks
    bit-identically from the same seeds (draw order per head fixed).

Backward recomputes the forward in VMEM (nothing but x is saved) and emits
dx plus all six parameter gradients; dW accumulate across the grid in fp32
output blocks (TPU Pallas grids execute sequentially on a core, so
read-modify-write accumulation is race-free).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from allrank_tpu.constants import NEG_INF_FILL

# one source of truth for the PRNG->keep-mask threshold semantics across
# every dropout-capable kernel (ffn_block imports it from here too)
from allrank_tpu.ops.attention_pallas import _dropout_keep as _keep_mask

F32 = jnp.float32
_SEED_MIX = 1000003
LN_EPS = 1e-6
VAR_FLOOR = 1e-24


def _dot_qk(q, k):
    return jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=F32,
    )


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=F32,
    )


def _dot_t(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=F32,
    )


def _mm(x, w):
    """[bb, L, m] @ [m, n] -> [bb, L, n], fp32 accumulation."""
    return jax.lax.dot_general(
        x, w, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=F32,
    )


def _mm_t(x, w):
    """[bb, L, n] @ [m, n]^T -> [bb, L, m], fp32 accumulation."""
    return jax.lax.dot_general(
        x, w, dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=F32,
    )


def _layer_norm(x32, scale, bias, n: int):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    c = x32 - mean
    var = jnp.sum(c * c, axis=-1, keepdims=True) / max(n - 1, 1)
    s = jnp.sqrt(jnp.maximum(var, VAR_FLOOR))
    denom = s + LN_EPS
    xhat = c * (1.0 / denom)
    return xhat * scale + bias, xhat, denom, s, var


def _head_probs(q, k, padded, scale):
    sc = _dot_qk(q, k) * scale
    sc = jnp.where(padded[:, None, :] > 0.5, NEG_INF_FILL, sc)
    m = jnp.max(sc, axis=-1, keepdims=True)
    e = jnp.exp(sc - m)
    return e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))


def _attn_ctx(qkv, padded, h, dk, scale, dtype, p_attn):
    """Forward attention over all heads; returns ctx [bb, L, d] (dtype)."""
    d = h * dk
    parts = []
    for i in range(h):
        q = qkv[:, :, i * dk:(i + 1) * dk]
        k = qkv[:, :, d + i * dk:d + (i + 1) * dk]
        v = qkv[:, :, 2 * d + i * dk:2 * d + (i + 1) * dk]
        p = _head_probs(q, k, padded, scale)
        if p_attn > 0.0:
            keep = _keep_mask(p.shape, p_attn)
            p = jnp.where(keep, p / (1.0 - p_attn), 0.0)
        parts.append(_dot(p.astype(dtype), v.astype(dtype)))
    return jnp.concatenate(parts, axis=-1).astype(dtype)


def attn_sublayer_fwd_vmem(x, padded, gvec, bvec, wqkv, bqkv, wout, bout,
                           seed_attn, seed_resid, *,
                           h: int, dk: int, p_attn: float, p_resid: float):
    """The whole attention sublayer on VMEM values:
    ``x + drop(W_out . MHA(LN(x) . W_qkv))``. Shared by the standalone
    sublayer kernel below and the whole-encoder kernel
    (ops/encoder_block.py). ``gvec/bvec/bqkv/bout``: 1-D f32 parameter
    rows; ``seed_attn/seed_resid``: already program-mixed int32 scalars."""
    d = h * dk
    dtype = x.dtype
    x32 = x.astype(F32)
    n_act, _, _, _, _ = _layer_norm(x32, gvec, bvec, d)
    n_act = n_act.astype(dtype)
    qkv = (_mm(n_act, wqkv.astype(dtype)) + bqkv.astype(F32)).astype(dtype)
    if p_attn > 0.0:
        pltpu.prng_seed(seed_attn)
    ctx = _attn_ctx(qkv, padded, h, dk, 1.0 / (dk ** 0.5), dtype, p_attn)
    a = _mm(ctx, wout.astype(dtype)) + bout.astype(F32)
    if p_resid > 0.0:
        pltpu.prng_seed(seed_resid)
        keep = _keep_mask(a.shape, p_resid)
        a = jnp.where(keep, a / (1.0 - p_resid), 0.0)
    return (x32 + a).astype(dtype)


def _fwd_kernel(seeds_ref, x_ref, mask_ref, g_ref, b_ref, wqkv_ref, bqkv_ref,
                wout_ref, bout_ref, y_ref, *,
                h: int, dk: int, p_attn: float, p_resid: float):
    mix = pl.program_id(0) * _SEED_MIX
    y_ref[...] = attn_sublayer_fwd_vmem(
        x_ref[...], mask_ref[:, 0], g_ref[0], b_ref[0], wqkv_ref[...],
        bqkv_ref[0], wout_ref[...], bout_ref[0],
        seeds_ref[0] + mix, seeds_ref[1] + mix,
        h=h, dk=dk, p_attn=p_attn, p_resid=p_resid,
    )


def attn_sublayer_bwd_vmem(x, padded, gvec, bvec, wqkv_in, bqkv, wout,
                           seed_attn, seed_resid, dy, *,
                           h: int, dk: int, p_attn: float, p_resid: float):
    """Reverse of ``attn_sublayer_fwd_vmem`` on VMEM values (recomputes the
    forward internals; nothing was saved). Returns
    ``(dx, (dg, db, dwqkv, dbqkv, dwout, dbout))`` — dx in x.dtype, the
    parameter grads as fp32 rows/mats shaped like the kernel accumulators."""
    d = h * dk
    dtype = x.dtype
    dy = dy.astype(F32)
    scale = 1.0 / (dk ** 0.5)

    # ---- recompute forward ------------------------------------------------
    x32 = x.astype(F32)
    n32, xhat, denom, s, var = _layer_norm(x32, gvec, bvec, d)
    n_act = n32.astype(dtype)
    wqkv = wqkv_in.astype(dtype)
    qkv = (_mm(n_act, wqkv) + bqkv.astype(F32)).astype(dtype)
    if p_attn > 0.0:
        pltpu.prng_seed(seed_attn)
        inv_a = 1.0 / (1.0 - p_attn)

    # ---- sublayer-output dropout (independent stream; da needs no ctx) ----
    da = dy
    if p_resid > 0.0:
        pltpu.prng_seed(seed_resid)
        if p_attn > 0.0:
            # the attention stream must continue from the forward's state:
            # re-seed it after using the residual stream, replaying the
            # same per-head draw order below
            keep_r = _keep_mask(da.shape, p_resid)
            pltpu.prng_seed(seed_attn)
        else:
            keep_r = _keep_mask(da.shape, p_resid)
        da = jnp.where(keep_r, da * (1.0 / (1.0 - p_resid)), 0.0)
    da = da.astype(dtype)

    # ---- single pass over heads: forward recompute + full backward.
    # Nothing outlives one iteration but the [bb, L, dk]-sized grad slices,
    # so VMEM holds at most ~4 transient [bb, L, L] tiles regardless of h.
    dwout_rows = []
    dqkv_parts_q, dqkv_parts_k, dqkv_parts_v = [], [], []
    for i in range(h):
        q = qkv[:, :, i * dk:(i + 1) * dk]
        k = qkv[:, :, d + i * dk:d + (i + 1) * dk]
        v = qkv[:, :, 2 * d + i * dk:2 * d + (i + 1) * dk]
        p = _head_probs(q, k, padded, scale)
        if p_attn > 0.0:
            keep = _keep_mask(p.shape, p_attn)
            pd = jnp.where(keep, p * inv_a, 0.0)
        else:
            pd = p
        ctx_h = _dot(pd.astype(dtype), v.astype(dtype)).astype(dtype)
        # dwout rows for this head's dk block: ctx_h^T @ da
        dwout_rows.append(jnp.sum(_dot_t(ctx_h, da), axis=0))
        # dctx for this head: da @ wout[head rows]^T
        do_h = _mm_t(da, wout[i * dk:(i + 1) * dk, :].astype(dtype)) \
            .astype(dtype)
        dv = _dot_t(pd.astype(dtype), do_h)
        dp = _dot_qk(do_h, v)
        if p_attn > 0.0:
            dp = jnp.where(keep, dp * inv_a, 0.0)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = jnp.where(padded[:, None, :] > 0.5, 0.0, ds).astype(dtype)
        dqkv_parts_q.append((_dot(ds, k.astype(dtype)) * scale))
        dqkv_parts_k.append((_dot_t(ds, q.astype(dtype)) * scale))
        dqkv_parts_v.append(dv)
    dwout_c = jnp.concatenate(dwout_rows, axis=0)       # [d, d] fp32
    dbout_c = jnp.sum(da.astype(F32), axis=(0, 1))[None, :]
    dqkv = jnp.concatenate(
        [jnp.concatenate(dqkv_parts_q, axis=-1),
         jnp.concatenate(dqkv_parts_k, axis=-1),
         jnp.concatenate(dqkv_parts_v, axis=-1)], axis=-1,
    ).astype(dtype)                                     # [bb, L, 3d]

    # ---- QKV projection ------------------------------------------------------
    dn = _mm_t(dqkv, wqkv.astype(dtype))                # [bb, L, d] fp32
    dwqkv_c = jnp.sum(_dot_t(n_act, dqkv), axis=0)      # [d, 3d] fp32
    dbqkv_c = jnp.sum(dqkv.astype(F32), axis=(0, 1))[None, :]

    # ---- LayerNorm backward ---------------------------------------------------
    dg_c = jnp.sum(dn * xhat, axis=(0, 1))[None, :]
    db_c = jnp.sum(dn, axis=(0, 1))[None, :]
    dxhat = dn * gvec
    # xhat = c/denom, denom = sqrt(max(var, floor)) + eps,
    # var = sum(c^2)/(n-1); d s/d c = c/((n-1) s) gated by the floor
    n_feat = d
    c = xhat * denom
    proj = jnp.sum(dxhat * c, axis=-1, keepdims=True)
    gate = (var > VAR_FLOOR).astype(F32)
    dc = dxhat / denom - gate * c * proj / (
        (n_feat - 1) * s * denom * denom
    )
    dx_ln = dc - jnp.mean(dc, axis=-1, keepdims=True)
    dx = (dy + dx_ln).astype(dtype)
    return dx, (dg_c, db_c, dwqkv_c, dbqkv_c, dwout_c, dbout_c)


def accumulate_param_grads(grads, refs):
    """fp32 read-modify-write accumulation of per-program parameter grads
    across the sequential TPU grid (zero-initialized by program 0)."""
    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in refs:
            r[...] = jnp.zeros_like(r)

    for g, r in zip(grads, refs):
        r[...] += g


def _bwd_kernel(seeds_ref, x_ref, mask_ref, g_ref, b_ref, wqkv_ref, bqkv_ref,
                wout_ref, bout_ref, dy_ref,
                dx_ref, dg_ref, db_ref, dwqkv_ref, dbqkv_ref, dwout_ref,
                dbout_ref, *, h: int, dk: int, p_attn: float, p_resid: float):
    mix = pl.program_id(0) * _SEED_MIX
    dx, grads = attn_sublayer_bwd_vmem(
        x_ref[...], mask_ref[:, 0], g_ref[0], b_ref[0], wqkv_ref[...],
        bqkv_ref[0], wout_ref[...],
        seeds_ref[0] + mix, seeds_ref[1] + mix, dy_ref[...],
        h=h, dk=dk, p_attn=p_attn, p_resid=p_resid,
    )
    dx_ref[...] = dx
    accumulate_param_grads(
        grads,
        (dg_ref, db_ref, dwqkv_ref, dbqkv_ref, dwout_ref, dbout_ref),
    )


def _batch_block(b: int, l: int) -> int:
    """Slates per program: the bwd holds h per-head [bb, L, L] fp32 tiles
    plus the activation set — keep the probability tiles within ~4 MB."""
    budget = int(4 * 1024 * 1024)
    bb = max(1, min(b, 4, budget // max(1, 4 * l * l)))
    while b % bb:
        bb -= 1
    return bb


def _param_inputs(ln_scale, ln_bias, wqkv, bqkv, wout, bout):
    return (ln_scale.astype(F32)[None, :], ln_bias.astype(F32)[None, :],
            wqkv, bqkv.astype(F32)[None, :], wout,
            bout.astype(F32)[None, :])


def _common_specs(l, d, bb):
    blk = pl.BlockSpec((bb, l, d), lambda i, *_: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    mask = pl.BlockSpec((bb, 1, l), lambda i, *_: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    vec = lambda n: pl.BlockSpec((1, n), lambda i, *_: (0, 0),  # noqa: E731
                                 memory_space=pltpu.VMEM)
    mat = lambda m, n: pl.BlockSpec((m, n), lambda i, *_: (0, 0),  # noqa: E731
                                    memory_space=pltpu.VMEM)
    return blk, mask, vec, mat


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def attention_sublayer(x, key_mask, ln_scale, ln_bias, wqkv, bqkv, wout,
                       bout, seeds, h: int, p_attn: float = 0.0,
                       p_resid: float = 0.0):
    """x + dropout(W_out . MHA(LN(x) . W_qkv)) in one TPU kernel.

    x: [B, L, d]; key_mask: [B, L] (True = padded); seeds: int32 [2]
    (attention-probs stream, residual-dropout stream); h static heads.
    Weight layouts match models/transformer.py `_layer_init`."""
    return _fwd_call(x, key_mask, ln_scale, ln_bias, wqkv, bqkv, wout, bout,
                     seeds, h, p_attn, p_resid)


def _fwd_call(x, key_mask, ln_scale, ln_bias, wqkv, bqkv, wout, bout, seeds,
              h, p_attn, p_resid):
    b, l, d = x.shape
    dk = d // h
    bb = _batch_block(b, l)
    blk, mask, vec, mat = _common_specs(l, d, bb)
    kernel = functools.partial(_fwd_kernel, h=h, dk=dk,
                               p_attn=float(p_attn), p_resid=float(p_resid))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bb,),
        in_specs=[blk, mask, vec(d), vec(d), mat(d, 3 * d), vec(3 * d),
                  mat(d, d), vec(d)],
        out_specs=blk,
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, l, d), x.dtype),
    )(jnp.asarray(seeds, dtype=jnp.int32).reshape(2),
      x, key_mask.astype(F32)[:, None, :],
      *_param_inputs(ln_scale, ln_bias, wqkv, bqkv, wout, bout))


def _sub_fwd(x, key_mask, ln_scale, ln_bias, wqkv, bqkv, wout, bout, seeds,
             h, p_attn, p_resid):
    out = _fwd_call(x, key_mask, ln_scale, ln_bias, wqkv, bqkv, wout, bout,
                    seeds, h, p_attn, p_resid)
    return out, (x, key_mask, ln_scale, ln_bias, wqkv, bqkv, wout, bout,
                 seeds)


def _sub_bwd(h, p_attn, p_resid, residuals, dy):
    (x, key_mask, ln_scale, ln_bias, wqkv, bqkv, wout, bout, seeds) = residuals
    b, l, d = x.shape
    dk = d // h
    bb = _batch_block(b, l)
    blk, mask, vec, mat = _common_specs(l, d, bb)
    kernel = functools.partial(_bwd_kernel, h=h, dk=dk,
                               p_attn=float(p_attn), p_resid=float(p_resid))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bb,),
        in_specs=[blk, mask, vec(d), vec(d), mat(d, 3 * d), vec(3 * d),
                  mat(d, d), vec(d), blk],
        out_specs=[blk, vec(d), vec(d), mat(d, 3 * d), vec(3 * d),
                   mat(d, d), vec(d)],
    )
    dx, dg, db, dwqkv, dbqkv, dwout, dbout = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, l, d), x.dtype),
            jax.ShapeDtypeStruct((1, d), F32),
            jax.ShapeDtypeStruct((1, d), F32),
            jax.ShapeDtypeStruct((d, 3 * d), F32),
            jax.ShapeDtypeStruct((1, 3 * d), F32),
            jax.ShapeDtypeStruct((d, d), F32),
            jax.ShapeDtypeStruct((1, d), F32),
        ],
    )(jnp.asarray(seeds, dtype=jnp.int32).reshape(2),
      x, key_mask.astype(F32)[:, None, :],
      *_param_inputs(ln_scale, ln_bias, wqkv, bqkv, wout, bout),
      dy.astype(x.dtype))

    def like(g, ref):
        return g.reshape(ref.shape).astype(ref.dtype)

    return (dx, None, like(dg, ln_scale), like(db, ln_bias),
            like(dwqkv, wqkv), like(dbqkv, bqkv), like(dwout, wout),
            like(dbout, bout), None)


attention_sublayer.defvjp(_sub_fwd, _sub_bwd)
