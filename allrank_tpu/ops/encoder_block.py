"""Whole-encoder megakernel: N x (attention sublayer -> FFN sublayer) plus
the final LayerNorm, in ONE Pallas TPU program per slate block — one kernel
launch for the entire encoder forward and one for the entire backward.

Why: with the per-sublayer megakernels (ops/attention_block.py,
ops/ffn_block.py) the flagship step issues 16 chained kernel launches
(8 fwd + 8 bwd); measured on hardware, every chained-launch boundary costs
~35 us over the kernels' isolated times (pipeline drain + the dependent
HBM round-trip of the [B, L, d] residual stream between kernels;
tools/exp_step_budget.py). At B=64, L=240, d=128 that is ~0.5 ms of a
2.4 ms step. This kernel keeps the residual stream in VMEM across all
N blocks: the forward touches HBM once in (x) and once out (y); the
backward reads x & dy and writes dx plus the parameter grads.

Structure: per-block weights arrive STACKED on a leading [N] axis and the
kernel iterates blocks with ``lax.fori_loop`` — the body is traced once,
so Mosaic allocates one block's transients regardless of N (a python
unroll kept every block's [bb, L, L] tiles live simultaneously and
overflowed scoped VMEM 2.4x at flagship scale). Dynamic indexing stays on
leading axes everywhere: weight loads ``w[b]``, saved-activation scratch
``xs[2b]``, and parameter-grad accumulation ``dw[b] += g``.

The per-sublayer math is shared with (not copied from) the standalone
kernels: attn_sublayer_fwd_vmem / attn_sublayer_bwd_vmem and
ffn_sublayer_fwd_vmem / ffn_sublayer_bwd_vmem operate on VMEM values.
The backward saves nothing in the forward; it replays the block chain
once in VMEM (parking the 2N [bb, L, d] sublayer inputs in scratch —
~2 MB at flagship scale), then runs the reverse sweep, recomputing each
sublayer's internals exactly as the standalone backward kernels do.
Parameter grads accumulate in fp32 across the sequential TPU grid.

Semantics are identical to the XLA path (models/transformer.py block loop +
final std-LayerNorm; reference allrank/models/transformer.py:83-116), with
4 independent dropout streams per block (attention probs, attention
residual, FFN hidden, FFN residual) seeded per (block, stream, program).
Forward and backward use ONE shared batch-block so the backward replays
exactly the forward's draws at every shape; whenever the chained
attention kernel's block size binds (it does at the parity-test shapes)
the draws also equal the per-sublayer kernels' (parity-tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from allrank_tpu.ops.attention_block import (
    _SEED_MIX,
    F32,
    VAR_FLOOR,
    _layer_norm,
    attn_sublayer_bwd_vmem,
    attn_sublayer_fwd_vmem,
)
from allrank_tpu.ops.ffn_block import (
    ffn_sublayer_bwd_vmem,
    ffn_sublayer_fwd_vmem,
)

# stacked weight operands, in call order: ln1_s [N,d], ln1_b [N,d],
# wqkv [N,d,3d], bqkv [N,3d], wout [N,d,d], bout [N,d], ln2_s [N,d],
# ln2_b [N,d], w1 [N,d,dff], b1 [N,dff], w2 [N,dff,d], b2 [N,d]
STACKED_PER_BLOCK = 12


def _attn_fwd_at(b, x, padded, w, seeds_ref, mix, h, dk, p_drop):
    (g1s, b1s, wqkvs, bqkvs, wouts, bouts, *_rest) = w
    return attn_sublayer_fwd_vmem(
        x, padded, g1s[b], b1s[b], wqkvs[b], bqkvs[b], wouts[b], bouts[b],
        seeds_ref[4 * b] + mix, seeds_ref[4 * b + 1] + mix,
        h=h, dk=dk, p_attn=p_drop, p_resid=p_drop,
    )


def _ffn_fwd_at(b, x, w, seeds_ref, mix, p_drop):
    (*_skip, g2s, b2s, w1s, b1fs, w2s, b2fs) = w
    return ffn_sublayer_fwd_vmem(
        x, g2s[b], b2s[b], w1s[b], b1fs[b], w2s[b], b2fs[b],
        seeds_ref[4 * b + 2] + mix, seeds_ref[4 * b + 3] + mix,
        p_hidden=p_drop, p_resid=p_drop,
    )


def _fwd_kernel(seeds_ref, x_ref, mask_ref, *refs,
                n_blocks: int, h: int, dk: int, p_drop: float):
    *w, fs_ref, fb_ref, y_ref = refs
    d = h * dk
    padded = mask_ref[:, 0]
    mix = pl.program_id(0) * _SEED_MIX

    def body(b, x):
        x = _attn_fwd_at(b, x, padded, w, seeds_ref, mix, h, dk, p_drop)
        return _ffn_fwd_at(b, x, w, seeds_ref, mix, p_drop)

    x = jax.lax.fori_loop(0, n_blocks, body, x_ref[...])
    out, *_ = _layer_norm(x.astype(F32), fs_ref[0], fb_ref[0], d)
    y_ref[...] = out.astype(x_ref.dtype)


def _final_ln_bwd(z, fs, fb, dy, d):
    """Backward of the (non-residual) final LayerNorm on VMEM values.
    Returns (dz in z.dtype, dscale row, dbias row)."""
    z32 = z.astype(F32)
    dy32 = dy.astype(F32)
    _, xhat, denom, s, var = _layer_norm(z32, fs, fb, d)
    dg = jnp.sum(dy32 * xhat, axis=(0, 1))[None, :]
    db = jnp.sum(dy32, axis=(0, 1))[None, :]
    dxhat = dy32 * fs
    c = xhat * denom
    proj = jnp.sum(dxhat * c, axis=-1, keepdims=True)
    gate = (var > VAR_FLOOR).astype(F32)
    dc = dxhat / denom - gate * c * proj / ((d - 1) * s * denom * denom)
    dz = dc - jnp.mean(dc, axis=-1, keepdims=True)
    return dz.astype(z.dtype), dg, db


def _bwd_kernel(seeds_ref, x_ref, mask_ref, *refs,
                n_blocks: int, h: int, dk: int, p_drop: float):
    w = refs[:STACKED_PER_BLOCK]
    fs_ref, fb_ref, dy_ref, dx_ref = refs[STACKED_PER_BLOCK:
                                          STACKED_PER_BLOCK + 4]
    dw = refs[STACKED_PER_BLOCK + 4:STACKED_PER_BLOCK * 2 + 4]
    dfs_ref, dfb_ref = refs[STACKED_PER_BLOCK * 2 + 4:
                            STACKED_PER_BLOCK * 2 + 6]
    xs = refs[-1]  # scratch [2N, bb, L, d]: attn inputs at 2b, ffn at 2b+1
    (g1s, b1s, wqkvs, bqkvs, wouts, bouts,
     g2s, b2s, w1s, b1fs, w2s, b2fs) = w
    d = h * dk
    padded = mask_ref[:, 0]
    mix = pl.program_id(0) * _SEED_MIX

    # ---- replay the forward chain, parking sublayer inputs in scratch ----
    def fwd_body(b, x):
        xs[2 * b] = x
        x = _attn_fwd_at(b, x, padded, w, seeds_ref, mix, h, dk, p_drop)
        xs[2 * b + 1] = x
        return _ffn_fwd_at(b, x, w, seeds_ref, mix, p_drop)

    z = jax.lax.fori_loop(0, n_blocks, fwd_body, x_ref[...])

    # ---- final LayerNorm backward ----------------------------------------
    dz, dgF, dbF = _final_ln_bwd(z, fs_ref[0], fb_ref[0], dy_ref[...], d)
    # canonicalize the reverse-loop carry layout: a fori_loop carry inherits
    # its entry value's layout, and this reduction-produced dz would force a
    # relayout every block iteration (see ops/sinkhorn_pallas.py, measured
    # 6x there); round-trip through the dx output block (rewritten at the
    # end — the xs scratch slots are all still live here)
    dx_ref[...] = dz
    dz = dx_ref[...]

    # ---- zero the fp32 accumulators once (sequential TPU grid) -----------
    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in dw + (dfs_ref, dfb_ref):
            r[...] = jnp.zeros_like(r)

    dfs_ref[...] += dgF
    dfb_ref[...] += dbF

    # ---- reverse sweep over blocks ----------------------------------------
    (dg1s, db1s, dwqkvs, dbqkvs, dwouts, dbouts,
     dg2s, db2s, dw1s, db1fs, dw2s, db2fs) = dw

    def bwd_body(t, dz):
        b = n_blocks - 1 - t
        dz, fg = ffn_sublayer_bwd_vmem(
            xs[2 * b + 1], g2s[b], b2s[b], w1s[b], b1fs[b], w2s[b],
            seeds_ref[4 * b + 2] + mix, seeds_ref[4 * b + 3] + mix, dz,
            p_hidden=p_drop, p_resid=p_drop,
        )
        dg2, db2, dw1, db1f, dw2, db2f = fg
        dg2s[b] += dg2[0]
        db2s[b] += db2[0]
        dw1s[b] += dw1
        db1fs[b] += db1f[0]
        dw2s[b] += dw2
        db2fs[b] += db2f[0]

        dz, ag = attn_sublayer_bwd_vmem(
            xs[2 * b], padded, g1s[b], b1s[b], wqkvs[b], bqkvs[b], wouts[b],
            seeds_ref[4 * b] + mix, seeds_ref[4 * b + 1] + mix, dz,
            h=h, dk=dk, p_attn=p_drop, p_resid=p_drop,
        )
        dg1, db1, dwqkv, dbqkv, dwout, dbout = ag
        dg1s[b] += dg1[0]
        db1s[b] += db1[0]
        dwqkvs[b] += dwqkv
        dbqkvs[b] += dbqkv[0]
        dwouts[b] += dwout
        dbouts[b] += dbout[0]
        return dz

    dx_ref[...] = jax.lax.fori_loop(0, n_blocks, bwd_body, dz)


def _batch_block(b: int, l: int, d: int, d_ff: int, n_blocks: int,
                 itemsize: int) -> int:
    """Slates per program for the whole-encoder backward (the tight one).
    With the fori_loop body traced once, the live set is ONE block's
    transients (~4 [bb, L, L] fp32 attention tiles + a [bb, L, d_ff]
    hidden pair) plus the [2N, bb, L, d] saved-input scratch; weights and
    the fp32 grad stacks are block-size independent (~5 MB at flagship
    scale), leaving ~8 MB of the 16 MB scoped budget for per-slate state."""
    budget = int(12 * 1024 * 1024)
    per_slate = (4 * l * l * 4
                 + 2 * l * d_ff * 4
                 + 2 * n_blocks * l * d * itemsize)
    bb = max(1, min(b, 4, budget // max(1, per_slate)))
    while b % bb:
        bb -= 1
    return bb


def vmem_ok(l: int, d: int, d_ff: int, n_blocks: int,
            itemsize: int = 2) -> bool:
    """Whether the backward fits scoped VMEM at bb=1: resident weights +
    fp32 grad stacks + one slate's transients + saves under ~13 MB."""
    weights = n_blocks * (3 * d * d + 2 * d * d_ff) * itemsize
    grads = n_blocks * (3 * d * d + 2 * d * d_ff) * 4
    per_slate = (4 * l * l * 4 + 2 * l * d_ff * 4
                 + 2 * n_blocks * l * d * itemsize)
    return weights + grads + per_slate < 13 * 1024 * 1024


def _stacked_inputs(ws):
    """Stacked vectors -> f32, stacked matrices passed through; the two
    final-LN vectors -> [1, d] f32 rows."""
    *blocks, fs, fb = ws
    out = tuple(w if w.ndim == 3 else w.astype(F32) for w in blocks)
    return out + (fs.astype(F32)[None, :], fb.astype(F32)[None, :])


def _weight_specs(n, d, d_ff, vecs, mats, vec):
    return [vecs(n, d), vecs(n, d), mats(n, d, 3 * d), vecs(n, 3 * d),
            mats(n, d, d), vecs(n, d), vecs(n, d), vecs(n, d),
            mats(n, d, d_ff), vecs(n, d_ff), mats(n, d_ff, d), vecs(n, d),
            vec(d), vec(d)]


def _grad_shapes(n, d, d_ff):
    shapes = [(n, d), (n, d), (n, d, 3 * d), (n, 3 * d), (n, d, d), (n, d),
              (n, d), (n, d), (n, d, d_ff), (n, d_ff), (n, d_ff, d), (n, d),
              (1, d), (1, d)]
    return [jax.ShapeDtypeStruct(s, F32) for s in shapes]


def _common_specs(l, d, bb):
    blk = pl.BlockSpec((bb, l, d), lambda i, *_: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    mask = pl.BlockSpec((bb, 1, l), lambda i, *_: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    vec = lambda n: pl.BlockSpec((1, n), lambda i, *_: (0, 0),  # noqa: E731
                                 memory_space=pltpu.VMEM)
    vecs = lambda n, m: pl.BlockSpec(  # noqa: E731
        (n, m), lambda i, *_: (0, 0), memory_space=pltpu.VMEM)
    mats = lambda n, m, k: pl.BlockSpec(  # noqa: E731
        (n, m, k), lambda i, *_: (0, 0, 0), memory_space=pltpu.VMEM)
    return blk, mask, vec, vecs, mats


@functools.lru_cache(maxsize=16)
def _make_encoder(n_blocks: int, h: int, p_drop: float, d_ff: int):
    """custom_vjp'd whole-encoder callable over STACKED weights:
    enc(x, key_mask, seeds, *stacked) with stacked = the 12 [N, ...] block
    arrays (STACKED_PER_BLOCK order) + final LN (scale, bias).
    seeds: int32 [4 * n_blocks]."""

    def _shared_bb(b, l, d, itemsize):
        """ONE batch-block for both directions: the dropout streams are
        seeded per (block, stream, program), so the slate->program mapping
        must be identical in the forward and the backward replay or the
        backward regenerates different masks than the forward applied.
        Take the tighter of the chained-attention-kernel block (keeps the
        draws equal to the per-sublayer kernels whenever it binds — the
        parity test's regime) and the whole-encoder backward's VMEM-bound
        block."""
        from allrank_tpu.ops.attention_block import (
            _batch_block as attn_bb,
        )

        return min(attn_bb(b, l),
                   _batch_block(b, l, d, d_ff, n_blocks, itemsize))

    def fwd_call(x, key_mask, seeds, ws):
        b, l, d = x.shape
        dk = d // h
        bb = _shared_bb(b, l, d, x.dtype.itemsize)
        blk, mask, vec, vecs, mats = _common_specs(l, d, bb)
        kernel = functools.partial(_fwd_kernel, n_blocks=n_blocks, h=h,
                                   dk=dk, p_drop=float(p_drop))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b // bb,),
            in_specs=[blk, mask] + _weight_specs(n_blocks, d, d_ff, vecs,
                                                 mats, vec),
            out_specs=blk,
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b, l, d), x.dtype),
        )(jnp.asarray(seeds, dtype=jnp.int32).reshape(4 * n_blocks),
          x, key_mask.astype(F32)[:, None, :], *_stacked_inputs(ws))

    @jax.custom_vjp
    def enc(x, key_mask, seeds, *ws):
        return fwd_call(x, key_mask, seeds, ws)

    def fwd(x, key_mask, seeds, *ws):
        return fwd_call(x, key_mask, seeds, ws), (x, key_mask, seeds, ws)

    def bwd(res, dy):
        x, key_mask, seeds, ws = res
        b, l, d = x.shape
        dk = d // h
        bb = _shared_bb(b, l, d, x.dtype.itemsize)
        blk, mask, vec, vecs, mats = _common_specs(l, d, bb)
        kernel = functools.partial(_bwd_kernel, n_blocks=n_blocks, h=h,
                                   dk=dk, p_drop=float(p_drop))
        wspecs = _weight_specs(n_blocks, d, d_ff, vecs, mats, vec)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b // bb,),
            in_specs=[blk, mask] + wspecs + [blk],
            out_specs=[blk] + wspecs,
            scratch_shapes=[
                pltpu.VMEM((2 * n_blocks, bb, l, d), x.dtype),
            ],
        )
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=([jax.ShapeDtypeStruct((b, l, d), x.dtype)]
                       + _grad_shapes(n_blocks, d, d_ff)),
        )(jnp.asarray(seeds, dtype=jnp.int32).reshape(4 * n_blocks),
          x, key_mask.astype(F32)[:, None, :], *_stacked_inputs(ws),
          dy.astype(x.dtype))
        dx, dws = out[0], out[1:]
        dws = tuple(g.reshape(w.shape).astype(w.dtype)
                    for g, w in zip(dws, ws))
        return (dx, None, None) + dws

    enc.defvjp(fwd, bwd)
    return enc


def encoder_forward(x, key_mask, seeds, block_weights, final_scale,
                    final_bias, *, h: int, p_drop: float = 0.0):
    """N-block transformer encoder + final LayerNorm in one kernel pair.

    x: [B, L, d]; key_mask: [B, L] (True = padded); seeds: int32 [4N]
    (per block: attention-probs, attention-residual, FFN-hidden,
    FFN-residual streams); block_weights: 12 STACKED arrays in
    STACKED_PER_BLOCK order (ln1 scale/bias [N, d], qkv w [N, d, 3d] /
    b [N, 3d], out w [N, d, d] / b [N, d], ln2 scale/bias [N, d],
    ff1 w [N, d, dff] / b [N, dff], ff2 w [N, dff, d] / b [N, d]).
    """
    n_blocks = block_weights[0].shape[0]
    d_ff = block_weights[8].shape[2]
    enc = _make_encoder(n_blocks, h, float(p_drop), d_ff)
    return enc(x, key_mask, seeds, *(tuple(block_weights)
                                     + (final_scale, final_bias)))
