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
[L, Tk] probability block). No dropout support — the train path uses it only
when p_drop == 0; with dropout the XLA path runs (long-slate training with
attention dropout is rare; extend with pltpu.prng per-tile replay if needed).
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


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=F32,
    )


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr, *, scale: float, n_k: int):
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
    l_new = l_scr[0] * alpha + jnp.sum(p, axis=1)
    acc_scr[:] = acc_scr[:] * alpha[:, None] + _dot(p, v)
    m_scr[0] = m_new
    l_scr[0] = l_new

    @pl.when(kt == n_k - 1)
    def _finalize():
        denom = jnp.maximum(l_scr[0], 1e-30)
        o_ref[0] = acc_scr[:] / denom[:, None]
        lse_ref[0, 0] = m_scr[0] + jnp.log(denom)


def _bwd_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, delta_ref,
                dq_ref, dk_ref, dv_ref, dq_scr, *, scale: float, n_k: int):
    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0]     # [L]
    delta = delta_ref[0, 0]  # [L] = rowsum(dO * O)
    padded = mask_ref[0, 0]

    s = _dot(q, k.T) * scale
    s = jnp.where(padded[None, :] > 0.5, NEG_INF_FILL, s)
    p = jnp.exp(s - lse[:, None])                 # exact probs [L, Tk]

    dv_ref[0] = _dot(p.T, do)
    dp = _dot(do, v.T)                            # [L, Tk]
    ds = p * (dp - delta[:, None])
    ds = jnp.where(padded[None, :] > 0.5, 0.0, ds)
    dk_ref[0] = _dot(ds.T, q) * scale
    dq_scr[:] = dq_scr[:] + _dot(ds, k) * scale

    @pl.when(kt == n_k - 1)
    def _done():
        dq_ref[0] = dq_scr[:]


def _pad_len(l: int) -> int:
    return -(-l // TILE_K) * TILE_K


def _flatten(q, k, v, key_mask):
    """[B, h, L, dk] -> [B*h, Lp, dk] fp32 with K-side padding masked out."""
    b, h, l, dk = q.shape
    lp = _pad_len(l)
    pad = lp - l

    def flat(x):
        x = x.reshape(b * h, l, dk).astype(F32)
        return jnp.pad(x, ((0, 0), (0, pad), (0, 0)))

    mask = jnp.repeat(key_mask.astype(F32), h, axis=0)  # [B*h, L]
    mask = jnp.pad(mask, ((0, 0), (0, pad)), constant_values=1.0)
    return flat(q), flat(k), flat(v), mask[:, None, :], b, h, l, lp, dk


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def tiled_slate_attention(q, k, v, key_mask):
    """Masked softmax attention, K-streamed for long slates.

    q, k, v: [B, h, L, d_k]; key_mask: [B, L] (True/nonzero = padded).
    Returns [B, h, L, d_k] fp32."""
    out, _ = _fwd_call(q, k, v, key_mask)
    return out


def _specs(lp, dk):
    row = pl.BlockSpec((1, lp, dk), lambda g, t: (g, 0, 0),
                       memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((1, TILE_K, dk), lambda g, t: (g, t, 0),
                        memory_space=pltpu.VMEM)
    mtile = pl.BlockSpec((1, 1, TILE_K), lambda g, t: (g, 0, t),
                         memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, 1, lp), lambda g, t: (g, 0, 0),
                       memory_space=pltpu.VMEM)
    return row, tile, mtile, vec


def _fwd_call(q, k, v, key_mask):
    qf, kf, vf, mf, b, h, l, lp, dk = _flatten(q, k, v, key_mask)
    n_k = lp // TILE_K
    row, tile, mtile, vec = _specs(lp, dk)
    kernel = functools.partial(_fwd_kernel, scale=1.0 / (dk ** 0.5), n_k=n_k)
    o, lse = pl.pallas_call(
        kernel,
        grid=(b * h, n_k),
        in_specs=[row, tile, tile, mtile],
        out_specs=[row, vec],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, lp, dk), F32),
            jax.ShapeDtypeStruct((b * h, 1, lp), F32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, lp), F32),
            pltpu.VMEM((1, lp), F32),
            pltpu.VMEM((lp, dk), F32),
        ],
    )(qf, kf, vf, mf)
    out = o[:, :l, :].reshape(b, h, l, dk)
    return out, (q, k, v, key_mask, lse, out)


def _attention_fwd(q, k, v, key_mask):
    return _fwd_call(q, k, v, key_mask)


def _attention_bwd(residuals, do):
    q, k, v, key_mask, lse, out = residuals
    qf, kf, vf, mf, b, h, l, lp, dk = _flatten(q, k, v, key_mask)
    n_k = lp // TILE_K
    dof = jnp.pad(do.astype(F32).reshape(b * h, l, dk),
                  ((0, 0), (0, lp - l), (0, 0)))
    # softmax-backward row term: D_i = rowsum(dP (.) P) = rowsum(dO (.) O)
    delta = jnp.sum(do.astype(F32) * out, axis=-1).reshape(b * h, 1, l)
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, lp - l)))
    row, tile, mtile, vec = _specs(lp, dk)
    kernel = functools.partial(_bwd_kernel, scale=1.0 / (dk ** 0.5), n_k=n_k)
    dq, dk_, dv = pl.pallas_call(
        kernel,
        grid=(b * h, n_k),
        in_specs=[row, tile, tile, mtile, row, vec, vec],
        out_specs=[row, tile, tile],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, lp, dk), F32),
            jax.ShapeDtypeStruct((b * h, lp, dk), F32),
            jax.ShapeDtypeStruct((b * h, lp, dk), F32),
        ],
        scratch_shapes=[pltpu.VMEM((lp, dk), F32)],
    )(qf, kf, vf, mf, dof, lse, delta)

    def unflat(x):
        return x[:, :l, :].reshape(b, h, l, dk)

    return unflat(dq), unflat(dk_), unflat(dv), None


tiled_slate_attention.defvjp(_attention_fwd, _attention_bwd)
