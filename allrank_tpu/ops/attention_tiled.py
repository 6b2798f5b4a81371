"""K-tiled masked slate attention for long slates — online-softmax Pallas
kernel with custom VJP.

The single-tile kernel (ops/attention_pallas.py) holds a full [L, L]
probability tile in VMEM, capping slate length around ~1200. This variant
keeps the QUERY rows fully resident (q/o are only [L, d_k]) and streams
KEY/VALUE tiles through the grid with the online-softmax recurrence, so the
[L, L] matrix never materializes:

    forward   grid (B*h, nK):  m, l, acc updated per k-tile; the final step
              normalizes and writes O and the row logsumexp.
    backward  grid (B*h, nK):  probs for the k-tile are reconstructed exactly
              from the stored logsumexp; dv/dk written per tile, dq
              accumulated across tiles in scratch. The softmax-backward
              rowterm D_i = rowsum(dP (.) P) equals rowsum(dO (.) O) and is
              precomputed in XLA, so each tile's dS is local.

Handles slate lengths to ~8k (VMEM: q + o + dq [L, d_k] rows + one
[L, Tk] probability block).

Attention-probability dropout (the reference trains with it, reference
allrank/models/transformer.py:150-156) runs IN-KERNEL: each (program, k-tile)
seeds the on-core PRNG from ``seed + flat_tile_id``, the keep-mask multiplies
only the accumulator contribution (the softmax denominator stays undropped,
so O = drop(P) @ V exactly), and the backward replays the identical mask from
the same per-tile seed — nothing stochastic is stored.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from allrank_tpu.constants import NEG_INF_FILL

F32 = jnp.float32
TILE_K = 256
_SEED_MIX = 1000003  # distinct PRNG stream per (program, k-tile)


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=F32,
    )


def _tile_keep(seed_ref, shape, p_drop: float):
    """Per-(program, k-tile) deterministic keep mask — the backward replays
    the exact mask by reseeding with the same flat tile id."""
    flat_id = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    pltpu.prng_seed(seed_ref[0] + flat_id * _SEED_MIX)
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = jnp.uint32(int(p_drop * (2**32 - 1)))
    return bits >= threshold


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr, *, scale: float, n_k: int,
                p_drop: float):
    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]            # [L, dk]
    k = k_ref[0]            # [Tk, dk]
    v = v_ref[0]
    padded = mask_ref[0, 0]  # [Tk]

    s = _dot(q, k.T) * scale                      # [L, Tk]
    s = jnp.where(padded[None, :] > 0.5, NEG_INF_FILL, s)

    m_prev = m_scr[0]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new[:, None])               # [L, Tk]
    # the denominator uses UNDROPPED sums: dropout acts on the normalized
    # probabilities P = e/l, so O = drop(P) @ V = (keep . e) @ V / (l(1-p))
    l_new = l_scr[0] * alpha + jnp.sum(p, axis=1)
    if p_drop > 0.0:
        p_acc = jnp.where(_tile_keep(seed_ref, p.shape, p_drop), p, 0.0)
    else:
        p_acc = p
    acc_scr[:] = acc_scr[:] * alpha[:, None] + _dot(p_acc.astype(v.dtype), v)
    m_scr[0] = m_new
    l_scr[0] = l_new

    @pl.when(kt == n_k - 1)
    def _finalize():
        denom = jnp.maximum(l_scr[0], 1e-30)
        inv = 1.0 / (1.0 - p_drop) if p_drop > 0.0 else 1.0
        o_ref[0] = (acc_scr[:] * (inv / denom[:, None])).astype(o_ref.dtype)
        lse_ref[0, 0] = m_scr[0] + jnp.log(denom)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref,
                delta_ref, dq_ref, dk_ref, dv_ref, dq_scr, *, scale: float,
                n_k: int, p_drop: float):
    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0]     # [L]
    delta = delta_ref[0, 0]  # [L] = rowsum(dO * O) (holds with dropout too:
    # O already carries the keep/scale factors)
    padded = mask_ref[0, 0]

    s = _dot(q, k.T) * scale
    s = jnp.where(padded[None, :] > 0.5, NEG_INF_FILL, s)
    p = jnp.exp(s - lse[:, None])                 # exact probs [L, Tk]

    dp = _dot(do, v.T)                            # [L, Tk]
    if p_drop > 0.0:
        keep = _tile_keep(seed_ref, p.shape, p_drop)
        inv = 1.0 / (1.0 - p_drop)
        p_dropped = jnp.where(keep, p * inv, 0.0)
        dp = jnp.where(keep, dp * inv, 0.0)
    else:
        p_dropped = p
    dv_ref[0] = _dot(p_dropped.astype(do.dtype).T, do).astype(dv_ref.dtype)
    ds = p * (dp - delta[:, None])
    ds = jnp.where(padded[None, :] > 0.5, 0.0, ds)
    ds = ds.astype(q.dtype)
    dk_ref[0] = (_dot(ds.T, q) * scale).astype(dk_ref.dtype)
    dq_scr[:] = dq_scr[:] + _dot(ds, k) * scale

    @pl.when(kt == n_k - 1)
    def _done():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _tile_k(l: int) -> int:
    """K-tile width for slate length ``l``: the backward holds ~4 live
    [Lp, Tk] fp32 blocks (P, dP, keep mask, dS) on the kernel stack, and
    the scoped-vmem limit is 16 MB — keep Lp*Tk under ~768K elements
    (measured: Lp=4096 @ Tk=256 needs 18.3 MB and is rejected; Tk=128
    fits). Tk must stay a lane multiple (128)."""
    tk = TILE_K
    while tk > 128 and (-(-l // tk) * tk) * tk > 768 * 1024:
        tk //= 2
    return tk


def _pad_len(l: int, tk: int) -> int:
    return -(-l // tk) * tk


def _flatten(q, k, v, key_mask, tk):
    """[B, h, L, dk] -> [B*h, Lp, dk] (storage dtype kept — bf16 operands
    ride the MXU at full rate) with K-side padding masked out."""
    b, h, l, dk = q.shape
    lp = _pad_len(l, tk)
    pad = lp - l

    def flat(x):
        x = x.reshape(b * h, l, dk)
        return jnp.pad(x, ((0, 0), (0, pad), (0, 0)))

    mask = jnp.repeat(key_mask.astype(F32), h, axis=0)  # [B*h, L]
    mask = jnp.pad(mask, ((0, 0), (0, pad)), constant_values=1.0)
    return flat(q), flat(k), flat(v), mask[:, None, :], b, h, l, lp, dk


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def tiled_slate_attention(q, k, v, key_mask, seed=None, p_drop: float = 0.0):
    """Masked softmax attention, K-streamed for long slates.

    q, k, v: [B, h, L, d_k] float32 or bfloat16 (fp32 accumulation either
    way); key_mask: [B, L] (True/nonzero = padded); seed: int32 scalar
    driving in-kernel attention dropout (ignored when ``p_drop == 0``).
    Returns [B, h, L, d_k] in the input dtype. Same signature as
    ops.attention_pallas.fused_slate_attention."""
    out, _ = _fwd_call(q, k, v, key_mask, seed, p_drop)
    return out


def _specs(lp, dk, tk):
    row = pl.BlockSpec((1, lp, dk), lambda g, t, *_: (g, 0, 0),
                       memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((1, tk, dk), lambda g, t, *_: (g, t, 0),
                        memory_space=pltpu.VMEM)
    mtile = pl.BlockSpec((1, 1, tk), lambda g, t, *_: (g, 0, t),
                         memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, 1, lp), lambda g, t, *_: (g, 0, 0),
                       memory_space=pltpu.VMEM)
    return row, tile, mtile, vec


def _seed_arr(seed):
    if seed is None:
        seed = 0
    return jnp.asarray(seed, dtype=jnp.int32).reshape(1)


def _fwd_call(q, k, v, key_mask, seed, p_drop):
    tk = _tile_k(q.shape[2])
    qf, kf, vf, mf, b, h, l, lp, dk = _flatten(q, k, v, key_mask, tk)
    n_k = lp // tk
    row, tile, mtile, vec = _specs(lp, dk, tk)
    kernel = functools.partial(
        _fwd_kernel, scale=1.0 / (dk ** 0.5), n_k=n_k, p_drop=float(p_drop)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * h, n_k),
        in_specs=[row, tile, tile, mtile],
        out_specs=[row, vec],
        scratch_shapes=[
            pltpu.VMEM((1, lp), F32),
            pltpu.VMEM((1, lp), F32),
            pltpu.VMEM((lp, dk), F32),
        ],
    )
    o, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b * h, lp, dk), q.dtype),
            jax.ShapeDtypeStruct((b * h, 1, lp), F32),
        ],
    )(_seed_arr(seed), qf, kf, vf, mf)
    out = o[:, :l, :].reshape(b, h, l, dk)
    return out, (q, k, v, key_mask, seed, lse, out)


def _attention_fwd(q, k, v, key_mask, seed, p_drop):
    return _fwd_call(q, k, v, key_mask, seed, p_drop)


def _attention_bwd(p_drop, residuals, do):
    q, k, v, key_mask, seed, lse, out = residuals
    tk = _tile_k(q.shape[2])  # same width as fwd: dropout masks replay
    qf, kf, vf, mf, b, h, l, lp, dk = _flatten(q, k, v, key_mask, tk)
    n_k = lp // tk
    dof = jnp.pad(do.astype(q.dtype).reshape(b * h, l, dk),
                  ((0, 0), (0, lp - l), (0, 0)))
    # softmax-backward row term: D_i = rowsum(dP (.) P) = rowsum(dO (.) O)
    delta = jnp.sum(do.astype(F32) * out.astype(F32), axis=-1).reshape(b * h, 1, l)
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, lp - l)))
    row, tile, mtile, vec = _specs(lp, dk, tk)
    kernel = functools.partial(
        _bwd_kernel, scale=1.0 / (dk ** 0.5), n_k=n_k, p_drop=float(p_drop)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * h, n_k),
        in_specs=[row, tile, tile, mtile, row, vec, vec],
        out_specs=[row, tile, tile],
        scratch_shapes=[pltpu.VMEM((lp, dk), F32)],
    )
    dq, dk_, dv = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b * h, lp, dk), q.dtype),
            jax.ShapeDtypeStruct((b * h, lp, dk), k.dtype),
            jax.ShapeDtypeStruct((b * h, lp, dk), v.dtype),
        ],
    )(_seed_arr(seed), qf, kf, vf, mf, dof, lse, delta)

    def unflat(x):
        return x[:, :l, :].reshape(b, h, l, dk)

    return unflat(dq), unflat(dk_), unflat(dv), None, None


tiled_slate_attention.defvjp(_attention_fwd, _attention_bwd)
