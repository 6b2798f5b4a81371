"""Sequence-parallel lambdaLoss pair chain: row-blocks over the mesh.

At very long slates the O(L²) pair block is the loss's whole cost; the
single-device kernels (ops/lambda_pallas.py ≤384, ops/lambda_tiled.py
≤4096) keep it per-chip. This path shards the PAIR MATRIX's row axis over
the mesh's ``sequence`` shards — shard s computes the [B, L/P, L] slab of
pairs whose row index it owns and the per-slate loss-sum/count reduce with
one psum — mirroring the SP soft-sort gate (ops/soft_sort.py
``soft_sort_contract_sp``). The sort preamble stays replicated (O(B·L));
only the O(L²) work divides.

Math is the lambdaLoss XLA pair path verbatim (losses/lambdaloss.py:
181-219): the log-space weighted-probability chain with position tables
computed from index arithmetic in-body (the ndcgLoss2 delta table is a
function of |i-j| — no [L, L] constant is materialized). Pure XLA, so the
shard_map runs with ``check_vma=True`` and gradients flow through the
psums via shard_map's autodiff.

The reference's only answer to slates this long is subsampling
(reference: allrank/data/dataset_loading.py:61-79).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

F32 = jnp.float32
_LN2 = float(np.log(2.0))


def _row_block_weights(scheme, g_i, g, ts_i, ts, dinv_i, dinv,
                       deltas_blk, mu):
    """Scheme weights for the [B, rb, L] row block. ``*_i``: this shard's
    row slices; bare names: the full (replicated) column vectors. Mirrors
    losses/lambdaloss.WEIGHING_SCHEMES restricted to the block."""
    if scheme is None or scheme == "rankNet_scheme":
        return None
    if scheme == "ndcgLoss1_scheme":
        return (g_i * dinv_i[None, :])[:, :, None]
    if scheme == "rankNetWeightedByGTDiff_scheme":
        return jnp.abs(ts_i[:, :, None] - ts[:, None, :])
    if scheme == "rankNetWeightedByGTDiffPowed_scheme":
        return jnp.abs(ts_i[:, :, None] ** 2 - ts[:, None, :] ** 2)
    gdiff = jnp.abs(g_i[:, :, None] - g[:, None, :])
    if scheme == "ndcgLoss2_scheme":
        return deltas_blk * gdiff
    lrank = jnp.abs(dinv_i[None, :, None] - dinv[None, None, :]) * gdiff
    if scheme == "lambdaRank_scheme":
        return lrank
    if scheme == "ndcgLoss2PP_scheme":
        return mu * (deltas_blk * gdiff) + lrank
    raise ValueError(f"unknown scheme {scheme}")


def lambda_pairs_sp(y_pred_sorted, true_sorted, gains, valid, mesh, axis,
                    *, scheme, k_eff, sigma, mu, log_base, eps):
    """(per-slate loss sums [B], selected-pair counts [B]) with the pair
    rows sharded over ``mesh[axis]``. Same contract as
    ops/lambda_tiled.tiled_lambda_pairs; inputs are the k_eff-sliced
    prediction-sorted arrays [B, L]. L must divide by the axis size (the
    dispatcher pads)."""
    n_shards = mesh.shape[axis]
    L = int(y_pred_sorted.shape[1])
    if L % n_shards:
        raise ValueError(f"L={L} not divisible by {n_shards} shards")
    rb = L // n_shards
    yp = y_pred_sorted.astype(F32)
    ts = true_sorted.astype(F32)
    g = gains.astype(F32)
    v = valid.astype(F32)

    # position tables as [L] vectors (host-exact, like the XLA path);
    # the [L, L] delta table is reconstructed per row-block from |i - j|
    dvec = jnp.asarray(np.log2(np.arange(L, dtype=np.float64) + 2.0)
                       .astype(np.float32))
    dinv_full = 1.0 / dvec
    log_eps = float(np.log(eps))
    need_deltas = scheme in ("ndcgLoss2_scheme", "ndcgLoss2PP_scheme")

    def body(yp, ts, g, v):
        me = jax.lax.axis_index(axis)
        r0 = me * rb

        def sl(a):
            return jax.lax.dynamic_slice_in_dim(a, r0, rb, axis=1)

        yp_i, ts_i, g_i, v_i = sl(yp), sl(ts), sl(g), sl(v)
        dinv_i = jax.lax.dynamic_slice_in_dim(dinv_full, r0, rb, axis=0)

        deltas_blk = None
        if need_deltas:
            i_pos = r0 + jnp.arange(rb, dtype=jnp.int32)
            didx = jnp.abs(i_pos[:, None]
                           - jnp.arange(L, dtype=jnp.int32)[None, :])
            prev = jnp.clip(didx - 1, 0, L - 1)
            deltas_blk = jnp.where(
                didx == 0, 0.0,
                jnp.abs(jnp.take(dinv_full, prev)
                        - jnp.take(dinv_full, didx)))[None, :, :]

        pv = (v_i[:, :, None] > 0.5) & (v[:, None, :] > 0.5)
        sel = pv
        if scheme != "ndcgLoss1_scheme":
            sel = sel & ((ts_i[:, :, None] - ts[:, None, :]) > 0)

        w = _row_block_weights(scheme, g_i, g, ts_i, ts, dinv_i, dinv_full,
                               deltas_blk, mu)

        sd = yp_i[:, :, None] - yp[:, None, :]
        sd = jnp.where(pv, sd, 0.0)
        sd = jnp.clip(sd, -1e8, 1e8)
        log_a = jnp.log(jnp.maximum(jax.nn.sigmoid(sigma * sd), eps))
        losses = jnp.maximum((w if w is not None else 1.0) * log_a, log_eps)
        if log_base == "binary":
            losses = losses / _LN2
        sel32 = sel.astype(F32)
        return (jax.lax.psum(jnp.sum(losses * sel32, axis=(1, 2)), axis),
                jax.lax.psum(jnp.sum(sel32, axis=(1, 2)), axis))

    from jax.sharding import PartitionSpec as P

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=True,  # pure XLA body: the checker verifies the psums
    )(yp, ts, g, v)


def sp_lambda_dispatch(k_eff: int, batch: int):
    """A ``kernel(yp, ts, g, v, **kw)`` callable when the sequence-parallel
    path should take this shape — an ambient mesh with a sequence axis > 1
    and ``k_eff`` at or past the autotune threshold — else None. Pads L to
    the axis size (padded cols valid=0: select no pairs)."""
    from allrank_tpu.ops import autotune
    from allrank_tpu.parallel.mesh import SEQUENCE_AXIS, ambient_mesh

    phys = ambient_mesh()
    if phys is None or phys.shape.get(SEQUENCE_AXIS, 1) <= 1:
        return None
    if k_eff < autotune.get("sp_lambda_min_len"):
        return None
    n = phys.shape[SEQUENCE_AXIS]

    def kernel(yp, ts, g, v, *, scheme, k_eff, sigma, mu, log_base, eps):
        L = int(yp.shape[1])
        pad = (-L) % n
        if pad:
            p = ((0, 0), (0, pad))
            yp, ts, g, v = (jnp.pad(a, p) for a in (yp, ts, g, v))
        return lambda_pairs_sp(
            yp, ts, g, v, phys, SEQUENCE_AXIS, scheme=scheme, k_eff=k_eff,
            sigma=sigma, mu=mu, log_base=log_base, eps=eps)

    return kernel
