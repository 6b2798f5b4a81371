"""Fully-fused NeuralNDCG soft-sort kernel: neural-sort → Sinkhorn → contract.

The NeuralNDCG loss (losses/neuralndcg.py; reference:
allrank/models/losses/neuralNDCG.py:10-136) only ever consumes the [L, L]
relaxed permutation matrix through a single vector contraction — soft-sorted
gains ``P @ gains`` (or expected discounts ``P^T @ discounts`` in the
transposed variant). The XLA pipeline still materializes the full chain in
HBM: p_max → softmax(p_hat) → masked M0 → Sinkhorn P → masked P, i.e. ~5
[B, L, L] round-trips forward and as many again for their cotangents —
~100 MB of traffic per step at B=64, L=240 for a result that is [B, L].

This kernel computes the ENTIRE chain per slate-block inside VMEM and emits
only the contracted [L] vector (plus the two O(max_iter · L) Sinkhorn scaling
trajectories the backward needs). The backward recomputes the neural-sort
chain in VMEM, reuses the shared in-kernel Sinkhorn reverse pass
(ops/sinkhorn_pallas.sinkhorn_bwd_core), and pushes the cotangent through
softmax and the |s_i − s_j| row sums analytically — nothing [L, L]-shaped
ever leaves the core in either direction.

Math being differentiated (identical to ops/soft_sort.py's XLA chain):

    s_f = where(pad, -1e8, s);  s_z = where(pad, 0, s)
    rs[j]     = Σ_k |s_f[j] − s_f[k]|  over valid pairs
    pm[i, j]  = scaling[i] · s_z[j] − rs[j]   (−inf / 1.0 pad fills)
    P_hat     = softmax(pm / τ)
    M0        = pad-prefilled P_hat;  P = sinkhorn(M0)  (fixed trip)
    out       = (P ⊙ ¬pad) @ vec        [or (P ⊙ ¬pad)^T @ vec]

Gradients flow to ``s`` only: ``scaling`` and the pad masks depend on the
mask alone, and ``vec`` (gains / discounts) is a function of y_true.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from allrank_tpu.ops.sinkhorn_pallas import (
    sinkhorn_bwd_core,
    sinkhorn_loop,
)

F32 = jnp.float32
_NEG_FILL = -1e8


def _chain(s, pad_f, *, tau):
    """Neural-sort chain on VMEM values. s, pad_f: [S, L] (pad_f: 1=padded).

    Returns (m0, p_hat, pair_pad_f, valid_f, s_filled, scaling) — everything
    the backward needs to replay the chain without any HBM reads."""
    _, l = s.shape
    valid_f = 1.0 - pad_f
    s_filled = jnp.where(pad_f > 0.5, _NEG_FILL, s)
    s_zeroed = s * valid_f

    pair_valid = valid_f[:, :, None] * valid_f[:, None, :]
    pair_pad_f = 1.0 - pair_valid
    both_pad = pad_f[:, :, None] * pad_f[:, None, :]

    diffs = jnp.abs(s_filled[:, :, None] - s_filled[:, None, :]) * pair_valid
    row_sums = jnp.sum(diffs, axis=2)  # [S, L], indexed by original item j

    valid_n = jnp.sum(valid_f, axis=1, keepdims=True)  # [S, 1]
    j_rank = jax.lax.broadcasted_iota(jnp.int32, (1, l), 1).astype(F32) + 1.0
    scaling = jnp.where(j_rank <= valid_n, valid_n + 1.0 - 2.0 * j_rank, 0.0)

    p_max = scaling[:, :, None] * s_zeroed[:, None, :] - row_sums[:, None, :]
    p_max = jnp.where(pair_pad_f > 0.5, -jnp.inf, p_max)
    p_max = jnp.where(both_pad > 0.5, 1.0, p_max)

    z = p_max / tau
    z_max = jnp.max(z, axis=2, keepdims=True)
    e = jnp.exp(z - z_max)
    p_hat = e / jnp.sum(e, axis=2, keepdims=True)

    # Sinkhorn pre-fill (reference loss_utils.py:27-29 semantics)
    m0 = jnp.where(pair_pad_f > 0.5, 0.0, p_hat)
    m0 = jnp.where(both_pad > 0.5, 1.0, m0)
    return m0, p_hat, pair_pad_f, valid_f, s_filled, scaling


def _contract(p, vec, transpose):
    if transpose:
        return jnp.sum(p * vec[:, :, None], axis=1)  # out[j] = Σ_i P[i,j] v[i]
    return jnp.sum(p * vec[:, None, :], axis=2)      # out[i] = Σ_j P[i,j] v[j]


def _fwd_kernel(s_ref, pad_ref, vec_ref, out_ref, a_hist_ref, b_hist_ref,
                a_it, b_it, m0_s, m0t_s, *, tau, max_iter, transpose):
    s = s_ref[:, 0, :]
    m0, _, pair_pad_f, *_ = _chain(s, pad_ref[:, 0, :], tau=tau)
    # pin the chain-produced m0 in scratch: the loop must read a REF, or
    # Mosaic may rematerialize the whole neural-sort chain per iteration
    m0_s[...] = m0
    a, b = sinkhorn_loop(m0_s, a_it, b_it, m0t_s, max_iter=max_iter)
    p = a[:, :, None] * m0_s[...] * b[:, None, :]
    p = jnp.where(pair_pad_f > 0.5, 0.0, p)
    out_ref[:, 0, :] = _contract(p, vec_ref[:, 0, :], transpose)
    # one relayout per program to the slate-major HBM history layout
    a_hist_ref[...] = jnp.transpose(a_it[:], (1, 0, 2))
    b_hist_ref[...] = jnp.transpose(b_it[:], (1, 0, 2))


def _bwd_kernel(s_ref, pad_ref, vec_ref, a_hist_ref, b_hist_ref, dout_ref,
                ds_ref, a_it, b_it, u_scratch, v_scratch, m0_s, m0t_s,
                *, tau, max_iter, transpose):
    s = s_ref[:, 0, :]
    m0, p_hat, pair_pad_f, valid_f, s_filled, scaling = _chain(
        s, pad_ref[:, 0, :], tau=tau
    )
    vec = vec_ref[:, 0, :]
    dout = dout_ref[:, 0, :]

    # cotangent of the contraction, gated by the post-Sinkhorn mask
    if transpose:
        dp = dout[:, None, :] * vec[:, :, None]
    else:
        dp = dout[:, :, None] * vec[:, None, :]
    pair_valid = 1.0 - pair_pad_f
    dp = dp * pair_valid

    a_it[...] = jnp.transpose(a_hist_ref[:], (1, 0, 2))
    b_it[...] = jnp.transpose(b_hist_ref[:], (1, 0, 2))
    m0_s[...] = m0  # pin: loop operands must be refs (see _fwd_kernel)
    dm0 = sinkhorn_bwd_core(m0_s, a_it, b_it, a_hist_ref, b_hist_ref, dp,
                            u_scratch, v_scratch, m0t_s, max_iter=max_iter)

    # pre-fill gate: m0 = where(pair_pad, 0/1 consts, p_hat)
    dphat = dm0 * pair_valid
    # softmax over the last axis, z = p_max / tau; the −inf/1.0 pad fills
    # pass zero gradient (gated by pair_valid below)
    inner = jnp.sum(dphat * p_hat, axis=2, keepdims=True)
    dpm = ((dphat - inner) * p_hat / tau) * pair_valid

    # pm[i, j] = scaling[i] · s_z[j] − rs[j]
    ds_zero = jnp.sum(dpm * scaling[:, :, None], axis=1)  # [S, L] (over i)
    drs = -jnp.sum(dpm, axis=1)                           # [S, L] (j axis)

    # rs[j] = Σ_k |s_f[j] − s_f[k]| · pair_valid[j, k]
    sgn = jnp.sign(s_filled[:, :, None] - s_filled[:, None, :]) * pair_valid
    ds_abs = drs * jnp.sum(sgn, axis=2) - jnp.sum(drs[:, :, None] * sgn,
                                                  axis=1)

    ds_ref[:, 0, :] = (ds_zero + ds_abs) * valid_f


def _block(n: int, l: int, n_mats: int, max_iter: int, largest: int = 8):
    """Slates per grid program under a ~10 MB VMEM budget (``n_mats`` live
    [S, L, L] tiles + the two [S, T+1, L] histories). Blocks carry a
    singleton middle axis so any size is Mosaic-layout-legal."""
    budget = 10 * 1024 * 1024
    per_slate = n_mats * l * l * 4 + 2 * (max_iter + 1) * l * 4
    cap = max(1, min(largest, budget // max(1, per_slate)))
    for s in range(cap, 0, -1):
        if n % s == 0:
            return s
    return 1


@functools.lru_cache(maxsize=32)
def _make_fused(tau, max_iter, transpose, slate_length):
    kw = dict(tau=tau, max_iter=max_iter, transpose=transpose)
    L = slate_length

    def specs(bb):
        vec = pl.BlockSpec((bb, 1, L), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
        hist = pl.BlockSpec((bb, max_iter + 1, L), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
        return vec, hist

    @jax.custom_vjp
    def fused(s, pad, vec):
        out, _, _ = fwd_call(s, pad, vec)
        return out

    def fwd_call(s, pad, vec):
        n = s.shape[0]
        bb = _block(n, L, n_mats=6, max_iter=max_iter)
        vspec, hspec = specs(bb)
        out, a_hist, b_hist = pl.pallas_call(
            functools.partial(_fwd_kernel, **kw),
            grid=(n // bb,),
            in_specs=[vspec, vspec, vspec],
            out_specs=[vspec, hspec, hspec],
            out_shape=[
                jax.ShapeDtypeStruct((n, 1, L), F32),
                jax.ShapeDtypeStruct((n, max_iter + 1, L), F32),
                jax.ShapeDtypeStruct((n, max_iter + 1, L), F32),
            ],
            scratch_shapes=[
                pltpu.VMEM((max_iter + 1, bb, L), F32),
                pltpu.VMEM((max_iter + 1, bb, L), F32),
                pltpu.VMEM((bb, L, L), F32),
                pltpu.VMEM((bb, L, L), F32),
            ],
        )(s[:, None, :], pad[:, None, :], vec[:, None, :])
        return out[:, 0, :], a_hist, b_hist

    def fwd(s, pad, vec):
        out, a_hist, b_hist = fwd_call(s, pad, vec)
        return out, (s, pad, vec, a_hist, b_hist)

    def bwd(res, dout):
        s, pad, vec, a_hist, b_hist = res
        n = s.shape[0]
        bb = _block(n, L, n_mats=9, max_iter=max_iter)
        vspec, hspec = specs(bb)
        ds = pl.pallas_call(
            functools.partial(_bwd_kernel, **kw),
            grid=(n // bb,),
            in_specs=[vspec, vspec, vspec, hspec, hspec, vspec],
            out_specs=vspec,
            out_shape=jax.ShapeDtypeStruct((n, 1, L), F32),
            scratch_shapes=[
                pltpu.VMEM((max_iter + 1, bb, L), F32),
                pltpu.VMEM((max_iter + 1, bb, L), F32),
                pltpu.VMEM((max_iter, bb, L), F32),
                pltpu.VMEM((max_iter, bb, L), F32),
                pltpu.VMEM((bb, L, L), F32),
                pltpu.VMEM((bb, L, L), F32),
            ],
        )(s[:, None, :], pad[:, None, :], vec[:, None, :], a_hist, b_hist,
          dout.astype(F32)[:, None, :])
        zeros = jnp.zeros_like
        return ds[:, 0, :], zeros(pad), zeros(vec)

    fused.defvjp(fwd, bwd)
    return fused


def fused_soft_sort_contract(
    scores: jnp.ndarray,
    pad_mask: jnp.ndarray,
    vec: jnp.ndarray,
    *,
    tau: float,
    max_iter: int = 50,
    transpose: bool = False,
) -> jnp.ndarray:
    """``sinkhorn(neural_sort(scores, τ)) @ vec`` fused in VMEM.

    scores, vec: [N, L] fp32; pad_mask: [N, L] (True/1 = padded position).
    transpose=False contracts rank rows with ``vec`` (soft-sorted gains);
    transpose=True contracts rank columns (expected discounts). Gradients
    flow to ``scores`` only. Fixed-trip Sinkhorn (no tol freeze), matching
    ops/sinkhorn_pallas semantics.
    """
    f = _make_fused(float(tau), int(max_iter), bool(transpose),
                    int(scores.shape[1]))
    return f(scores.astype(F32), pad_mask.astype(F32), vec.astype(F32))


# the backward holds ~8 live [1, L, L] fp32 tiles; past this L even a
# single-slate block exceeds the VMEM budget and the XLA path is used
MAX_FUSED_LENGTH = 512


def soft_sort_available(slate_length: int, n_flat: int) -> bool:
    """True when the fused kernel (direct or via mesh shard_map) can run.
    The length cap reads through the per-device-kind autotune table
    (ops/autotune.py, ``neuralsort_max_fused_len``; shipped default =
    MAX_FUSED_LENGTH above)."""
    from allrank_tpu.ops import autotune

    if (jax.default_backend() != "tpu"
            or slate_length > autotune.get("neuralsort_max_fused_len")):
        return False
    from allrank_tpu.ops.soft_sort import per_shard_batch

    return per_shard_batch(n_flat) is not None


def soft_sort_contract(scores, pad_mask, vec, *, tau, max_iter=50,
                       transpose=False):
    """Mesh-aware dispatch: per-shard via shard_map over every mesh axis that
    divides the flattened batch (stochastic samples ride idle shards), direct
    on a single chip."""
    from allrank_tpu.ops.soft_sort import dispatch_batch_sharded

    kw = dict(tau=tau, max_iter=max_iter, transpose=transpose)
    return dispatch_batch_sharded(
        lambda *a: fused_soft_sort_contract(*a, **kw), (scores, pad_mask, vec)
    )
