"""Fused approxNDCG rank-sum — Pallas TPU kernel with custom VJP.

ApproxNDCG's only O(L²) work (losses/approxndcg.py; reference:
allrank/models/losses/approxNDCG.py:40-49) is the approximate-position sum

    pos_sum_i = Σ_j  m_ij · max(sigmoid(-α (s_i − s_j)), eps)

over valid off-diagonal pairs; everything after it is an O(L) chain that
XLA fuses and differentiates fine. XLA materializes the [B, L, L] diffs,
sigmoid, clamp and mask tensors in HBM between fusion boundaries; this
kernel computes the row sums per slate-block inside VMEM and the backward
reduces the pair cotangents analytically to row/column sums — nothing
[L, L]-shaped ever leaves the core.

Gradient (matches jax.grad of the XLA chain, including the max(., eps)
clamp whose subgradient picks the sigmoid branch iff t > eps and the
``where(mask, diffs, 0)`` that zeroes masked-pair gradients):

    t_ij = sigmoid(-α (s_i − s_j))   on valid pairs
    ∂pos_sum_i/∂d_ij = m_ij · [t_ij > eps] · (−α) t_ij (1 − t_ij)
    ds_k = Σ_j c_kj − Σ_i c_ik,  c_ij = u_i · m_ij · [t>eps] · (−α) t (1−t)

(``u`` is the [B, L] cotangent of pos_sum from the outer XLA chain.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from allrank_tpu.ops.lambda_pallas import _block

F32 = jnp.float32


def _pair_chain(s, valid, *, alpha):
    """(t, pv) on VMEM values; s/valid: [bb, L] (valid: 1=real doc)."""
    bb, L = s.shape
    pv = (valid[:, :, None] > 0.5) & (valid[:, None, :] > 0.5)
    rows = jax.lax.broadcasted_iota(jnp.int32, (bb, L, L), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bb, L, L), 2)
    pv = pv & (rows != cols)
    d = jnp.where(pv, s[:, :, None] - s[:, None, :], 0.0)
    t = jax.nn.sigmoid(-alpha * d)
    return t, pv


def _fwd_kernel(s_ref, valid_ref, out_ref, *, alpha, eps):
    t, pv = _pair_chain(s_ref[...], valid_ref[...], alpha=alpha)
    out_ref[...] = jnp.sum(
        pv.astype(F32) * jnp.maximum(t, eps), axis=2
    )


def _bwd_kernel(s_ref, valid_ref, u_ref, ds_ref, *, alpha, eps):
    t, pv = _pair_chain(s_ref[...], valid_ref[...], alpha=alpha)
    tprime = jnp.where(t > eps, -alpha * t * (1.0 - t), 0.0)
    c = u_ref[...][:, :, None] * pv.astype(F32) * tprime
    ds_ref[...] = jnp.sum(c, axis=2) - jnp.sum(c, axis=1)


@functools.lru_cache(maxsize=32)
def _make_fused(alpha, eps, slate_length):
    kw = dict(alpha=alpha, eps=eps)
    L = slate_length

    def vec(bb):
        return pl.BlockSpec((bb, L), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    @jax.custom_vjp
    def fused(s, valid):
        b = s.shape[0]
        bb = _block(b, L)
        return pl.pallas_call(
            functools.partial(_fwd_kernel, **kw),
            grid=(b // bb,),
            in_specs=[vec(bb), vec(bb)],
            out_specs=vec(bb),
            out_shape=jax.ShapeDtypeStruct((b, L), F32),
        )(s, valid)

    def fwd(s, valid):
        return fused(s, valid), (s, valid)

    def bwd(res, u):
        s, valid = res
        b = s.shape[0]
        bb = _block(b, L)
        ds = pl.pallas_call(
            functools.partial(_bwd_kernel, **kw),
            grid=(b // bb,),
            in_specs=[vec(bb), vec(bb), vec(bb)],
            out_specs=vec(bb),
            out_shape=jax.ShapeDtypeStruct((b, L), F32),
        )(s, valid, u.astype(F32))
        return ds, jnp.zeros_like(valid)

    fused.defvjp(fwd, bwd)
    return fused


def fused_approx_pos(
    y_pred_sorted: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    alpha: float,
    eps: float,
) -> jnp.ndarray:
    """Masked sigmoid rank sums [B, L], fused in VMEM. Inputs [B, L] fp32
    (``valid`` as 0/1 floats); gradients flow to ``y_pred_sorted`` only."""
    f = _make_fused(float(alpha), float(eps), int(y_pred_sorted.shape[1]))
    return f(y_pred_sorted.astype(F32), valid.astype(F32))


def approx_pos_available(slate_length: int, batch: int) -> bool:
    """True when the fused kernel (direct or via mesh shard_map) can run;
    same gate structure as ops/lambda_pallas.lambda_pairs_available."""
    from allrank_tpu.ops.lambda_pallas import MAX_FUSED_LENGTH

    if jax.default_backend() != "tpu" or slate_length > MAX_FUSED_LENGTH:
        return False
    from allrank_tpu.ops.soft_sort import per_shard_batch

    b = per_shard_batch(batch)
    return b is not None and _block(b, slate_length) is not None


def approx_pos(yp_sorted, valid, *, alpha, eps):
    """Mesh-aware dispatch: per-shard via shard_map over every mesh axis
    that divides the batch (the pod code path), direct on a single chip."""
    from allrank_tpu.ops.soft_sort import dispatch_batch_sharded

    kw = dict(alpha=alpha, eps=eps)
    return dispatch_batch_sharded(
        lambda *a: fused_approx_pos(*a, **kw), (yp_sorted, valid)
    )
