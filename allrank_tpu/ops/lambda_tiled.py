"""Tiled LambdaLoss pairwise chain for long slates — Pallas TPU kernel.

The square kernel (ops/lambda_pallas.py) holds the whole [bb, L, L] pair
chain in VMEM and caps out at L=384. This variant tiles BOTH pair axes:
grid (batch-blocks, L/Ti, L/Tj), each program computing the [bb, Ti, Tj]
pair tile — so VMEM holds O(Ti·Tj) regardless of L and the chain scales to
WEB30K-eval shapes (L≈1300, padded 1408) and long-slate training (L≤4096),
where the XLA path round-trips several-GB [B, L, L] tensors through HBM.

Reductions over the grid (the standard Mosaic revisited-block pattern —
a reduced dim must be innermost so revisits are consecutive):
- forward loss/count and backward row term Σ_j c_ij reduce over j, the
  innermost grid dim, into [bb, Ti] blocks (init at j==0, += after);
- the backward column term Σ_i c_ij reduces over i (NOT innermost), so each
  (b, i, j) program writes its own (1, bb, Tj) slab of a
  [L/Ti, B, L] auxiliary output and XLA sums axis 0 afterwards. That aux is
  (L/Ti)·B·L·4 bytes — 3.9 MB at (L=1408, B=64) vs the XLA path's 0.5 GB
  [B, L, L] intermediates.

Slate lengths are padded to a lane multiple (128) inside the wrapper;
padded rows/cols carry valid=0 and select no pairs. Math and gradient
derivation are identical to ops/lambda_pallas.py (the log-space
weighted-probability chain with branch-exact clamp subgradients); only the
tiling differs. Gradients flow to ``y_pred_sorted`` only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from allrank_tpu.ops.lambda_pallas import _ndcg2_deltas_np

F32 = jnp.float32
_LN2 = float(np.log(2.0))

# beyond this the dcol auxiliary output ((L/Ti)·B·L fp32) gets heavy and
# XLA's own chunking is competitive; covers WEB30K-eval (1308→1408) and
# long-slate training
MAX_TILED_LENGTH = 4096


def _pair_weights_tiled(scheme, g_i, g_j, ts_i, ts_j, dinv_i, dinv_j,
                        deltas, mu):
    """w [bb, Ti, Tj] for the static scheme. *_i: [bb, Ti]; *_j: [bb, Tj];
    dinv_*: matching 1/D row slices; deltas: [Ti, Tj] tile."""
    if scheme is None or scheme == "rankNet_scheme":
        return None
    if scheme == "ndcgLoss1_scheme":
        # G_i / D_i, constant over j
        return (g_i * dinv_i[None, :])[:, :, None]
    if scheme == "rankNetWeightedByGTDiff_scheme":
        return jnp.abs(ts_i[:, :, None] - ts_j[:, None, :])
    if scheme == "rankNetWeightedByGTDiffPowed_scheme":
        return jnp.abs(ts_i[:, :, None] ** 2 - ts_j[:, None, :] ** 2)
    gdiff = jnp.abs(g_i[:, :, None] - g_j[:, None, :])
    if scheme == "ndcgLoss2_scheme":
        return deltas[None, :, :] * gdiff
    lrank = jnp.abs(dinv_i[None, :, None] - dinv_j[None, None, :]) * gdiff
    if scheme == "lambdaRank_scheme":
        return lrank
    if scheme == "ndcgLoss2PP_scheme":
        return mu * (deltas[None, :, :] * gdiff) + lrank
    raise ValueError(f"unknown scheme {scheme}")


def _chain_tiled(ypi, ypj, tsi, tsj, gi, gj, vi, vj, dinvi, dinvj, deltas,
                 i0, j0, *, scheme, k_eff, sigma, mu, log_base, eps,
                 ti, tj):
    """Shared fwd/bwd tile body — returns (logs, sel, s, a, wlog, w)."""
    bb = ypi.shape[0]
    pv = (vi[:, :, None] > 0.5) & (vj[:, None, :] > 0.5)
    sel = pv
    if scheme != "ndcgLoss1_scheme":
        sel = sel & ((tsi[:, :, None] - tsj[:, None, :]) > 0)
    if k_eff is not None:
        rows = i0 + jax.lax.broadcasted_iota(jnp.int32, (bb, ti, tj), 1)
        cols = j0 + jax.lax.broadcasted_iota(jnp.int32, (bb, ti, tj), 2)
        sel = sel & (rows < k_eff) & (cols < k_eff)

    d = ypi[:, :, None] - ypj[:, None, :]
    d = jnp.where(pv, d, 0.0)
    d = jnp.clip(d, -1e8, 1e8)

    s = jax.nn.sigmoid(sigma * d)
    a = jnp.maximum(s, eps)
    w = _pair_weights_tiled(scheme, gi, gj, tsi, tsj, dinvi, dinvj,
                            deltas, mu)
    log_a = jnp.log(a)
    wlog = log_a if w is None else w * log_a
    logs = jnp.maximum(wlog, float(np.log(eps)))
    if log_base == "binary":
        logs = logs / _LN2
    return logs, sel, s, a, wlog, w


def _tile_origin(ti, tj):
    return pl.program_id(1) * ti, pl.program_id(2) * tj


def _fwd_kernel(ypi_ref, ypj_ref, tsi_ref, tsj_ref, gi_ref, gj_ref,
                vi_ref, vj_ref, dinvi_ref, dinvj_ref, deltas_ref,
                loss_ref, cnt_ref, *, ti, tj, **kw):
    i0, j0 = _tile_origin(ti, tj)
    logs, sel, *_ = _chain_tiled(
        ypi_ref[...], ypj_ref[...], tsi_ref[...], tsj_ref[...],
        gi_ref[...], gj_ref[...], vi_ref[...], vj_ref[...],
        dinvi_ref[0], dinvj_ref[0], deltas_ref[...], i0, j0,
        ti=ti, tj=tj, **kw,
    )
    sel_f = sel.astype(F32)
    loss = jnp.sum(logs * sel_f, axis=2)
    cnt = jnp.sum(sel_f, axis=2)

    # j is the innermost grid dim: the [bb, Ti] output block is revisited
    # consecutively — init on the first j-tile, accumulate after
    @pl.when(pl.program_id(2) == 0)
    def _init():
        loss_ref[...] = loss
        cnt_ref[...] = cnt

    @pl.when(pl.program_id(2) != 0)
    def _acc():
        loss_ref[...] += loss
        cnt_ref[...] += cnt


def _bwd_kernel(ypi_ref, ypj_ref, tsi_ref, tsj_ref, gi_ref, gj_ref,
                vi_ref, vj_ref, dinvi_ref, dinvj_ref, deltas_ref,
                drow_ref, dcol_ref, *, ti, tj, **kw):
    i0, j0 = _tile_origin(ti, tj)
    logs, sel, s, a, wlog, w = _chain_tiled(
        ypi_ref[...], ypj_ref[...], tsi_ref[...], tsj_ref[...],
        gi_ref[...], gj_ref[...], vi_ref[...], vj_ref[...],
        dinvi_ref[0], dinvj_ref[0], deltas_ref[...], i0, j0,
        ti=ti, tj=tj, **kw,
    )
    del logs
    eps = kw["eps"]
    sigma = kw["sigma"]
    ln = _LN2 if kw["log_base"] == "binary" else 1.0
    w_over_a = (1.0 / a) if w is None else (w / a)
    c = sel.astype(F32) * jnp.where(
        wlog > float(np.log(eps)), w_over_a / ln, 0.0
    )
    c = c * jnp.where(s > eps, sigma * s * (1.0 - s), 0.0)

    row = jnp.sum(c, axis=2)  # [bb, Ti], reduce over innermost j

    @pl.when(pl.program_id(2) == 0)
    def _init():
        drow_ref[...] = row

    @pl.when(pl.program_id(2) != 0)
    def _acc():
        drow_ref[...] += row

    # column term reduces over i (not innermost): every program owns its
    # (1, bb, Tj) slab of the [L/Ti, B, L] aux; XLA sums axis 0 outside
    dcol_ref[...] = jnp.sum(c, axis=1)[None]


def _padded_len(l: int) -> int:
    """Kernel-internal slate length: L rounded up to a lane multiple (128).
    Mosaic requires the last block dim be a multiple of 128 or the full
    array dim; padding rows/cols carry valid=0 so they select no pairs."""
    return -(-l // 128) * 128


def _pick_tiles(b: int, l: int, n_mats: int = 6,
                budget: int = 8 * 1024 * 1024):
    """(bb, Ti, Tj) for the padded length ``l`` (a 128-multiple): slates
    per program and pair-tile sizes, with the [bb, Ti, Tj] working set
    (~n_mats live fp32 temporaries) under the VMEM budget. Hardware block
    rules: bb a multiple of 8 or the whole batch; Ti/Tj 128-multiples
    dividing l. None when no legal configuration fits."""
    if l % 128 != 0:
        return None
    bbs = [x for x in (16, 8) if b % x == 0]
    if not bbs:
        bbs = [b]  # block == full dim is always legal
    for bb in bbs:
        for t in (256, 128):
            if l % t == 0 and n_mats * bb * t * t * 4 <= budget:
                return bb, t, t
    return None


@functools.lru_cache(maxsize=64)
def _make_tiled(scheme, k_eff, sigma, mu, log_base, eps, slate_length):
    kw = dict(scheme=scheme, k_eff=k_eff, sigma=sigma, mu=mu,
              log_base=log_base, eps=eps)
    L = slate_length
    need_deltas = scheme in ("ndcgLoss2_scheme", "ndcgLoss2PP_scheme")
    deltas_np = _ndcg2_deltas_np(L) if need_deltas else None
    dinv = (1.0 / np.log2(np.arange(L, dtype=np.float64) + 2.0)).astype(
        np.float32
    )

    def specs(bb, ti, tj):
        itile = pl.BlockSpec((bb, ti), lambda b, i, j: (b, i),
                             memory_space=pltpu.VMEM)
        jtile = pl.BlockSpec((bb, tj), lambda b, i, j: (b, j),
                             memory_space=pltpu.VMEM)
        dinv_i = pl.BlockSpec((1, ti), lambda b, i, j: (0, i),
                              memory_space=pltpu.VMEM)
        dinv_j = pl.BlockSpec((1, tj), lambda b, i, j: (0, j),
                              memory_space=pltpu.VMEM)
        if need_deltas:
            dtab = pl.BlockSpec((ti, tj), lambda b, i, j: (i, j),
                                memory_space=pltpu.VMEM)
        else:
            dtab = pl.BlockSpec((ti, tj), lambda b, i, j: (0, 0),
                                memory_space=pltpu.VMEM)
        return itile, jtile, dinv_i, dinv_j, dtab

    def _tables(ti, tj):
        if need_deltas:
            return jnp.asarray(deltas_np)
        return jnp.zeros((ti, tj), dtype=F32)

    def _args(yp, ts, g, valid, ti, tj):
        return (yp, yp, ts, ts, g, g, valid, valid,
                jnp.asarray(dinv)[None], jnp.asarray(dinv)[None],
                _tables(ti, tj))

    @jax.custom_vjp
    def tiled(yp, ts, g, valid):
        b = yp.shape[0]
        bb, ti, tj = _pick_tiles(b, L)
        itile, jtile, dv_i, dv_j, dtab = specs(bb, ti, tj)
        loss, cnt = pl.pallas_call(
            functools.partial(_fwd_kernel, ti=ti, tj=tj, **kw),
            grid=(b // bb, L // ti, L // tj),
            in_specs=[itile, jtile, itile, jtile, itile, jtile,
                      itile, jtile, dv_i, dv_j, dtab],
            out_specs=[itile, itile],
            out_shape=[
                jax.ShapeDtypeStruct((b, L), F32),
                jax.ShapeDtypeStruct((b, L), F32),
            ],
        )(*_args(yp, ts, g, valid, ti, tj))
        return jnp.sum(loss, axis=1), jnp.sum(cnt, axis=1)

    def fwd(yp, ts, g, valid):
        return tiled(yp, ts, g, valid), (yp, ts, g, valid)

    def bwd(res, cts):
        yp, ts, g, valid = res
        g_loss, _g_cnt = cts
        b = yp.shape[0]
        bb, ti, tj = _pick_tiles(b, L)
        itile, jtile, dv_i, dv_j, dtab = specs(bb, ti, tj)
        dcol_spec = pl.BlockSpec((1, bb, tj), lambda b_, i, j: (i, b_, j),
                                 memory_space=pltpu.VMEM)
        drow, dcol = pl.pallas_call(
            functools.partial(_bwd_kernel, ti=ti, tj=tj, **kw),
            grid=(b // bb, L // ti, L // tj),
            in_specs=[itile, jtile, itile, jtile, itile, jtile,
                      itile, jtile, dv_i, dv_j, dtab],
            out_specs=[itile, dcol_spec],
            out_shape=[
                jax.ShapeDtypeStruct((b, L), F32),
                jax.ShapeDtypeStruct((L // ti, b, L), F32),
            ],
        )(*_args(yp, ts, g, valid, ti, tj))
        dyp = (drow - jnp.sum(dcol, axis=0)) * g_loss.astype(F32)[:, None]
        zeros = jnp.zeros_like
        return dyp, zeros(ts), zeros(g), zeros(valid)

    tiled.defvjp(fwd, bwd)
    return tiled


def tiled_lambda_pairs(
    y_pred_sorted: jnp.ndarray,
    true_sorted: jnp.ndarray,
    gains: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    scheme,
    k_eff: int,
    sigma: float,
    mu: float,
    log_base: str,
    eps: float,
):
    """(per-slate loss sums [B], selected-pair counts [B]) — the lambdaLoss
    pairwise chain, pair-tiled in VMEM for long slates. Same contract as
    ops/lambda_pallas.fused_lambda_pairs."""
    L = int(y_pred_sorted.shape[1])
    Lp = _padded_len(L)
    yp = y_pred_sorted.astype(F32)
    ts = true_sorted.astype(F32)
    g = gains.astype(F32)
    v = valid.astype(F32)
    if Lp != L:
        pad = ((0, 0), (0, Lp - L))
        yp = jnp.pad(yp, pad)
        ts = jnp.pad(ts, pad)
        g = jnp.pad(g, pad)
        v = jnp.pad(v, pad)  # padded cols valid=0: select no pairs
    # k_eff == L means "no truncation"; padded indices are already excluded
    # by valid=0, so only a genuine k < L needs the index mask
    k = int(k_eff) if int(k_eff) < L else None
    f = _make_tiled(scheme, k, float(sigma), float(mu), str(log_base),
                    float(eps), Lp)
    return f(yp, ts, g, v)


def tiled_lambda_preferred(slate_length: int, batch: int) -> bool:
    """Dispatch policy: measured on a v5e (tools/bench_lambda_tiled.py),
    XLA keeps a small edge at B*L^2 below ~32M elements (0.74 vs 0.85 ms at
    B=64 L=512 — both paths VPU-transcendental-bound, XLA fuses the chain
    well) and the kernel wins past it (1.1x at L=768, 1.4x at L=1024,
    1.1-1.2x at L=2048-4096). On top of time, the kernel sidesteps the ~6
    live [B, L, L] fp32 intermediates XLA holds through the grad chain —
    multi-GB at WEB30K-eval shapes — so the threshold leans low. The
    crossover reads through the per-device-kind autotune table
    (ops/autotune.py, ``lambda_pair_crossover_elems``)."""
    from allrank_tpu.ops import autotune

    if (batch * slate_length * slate_length
            < autotune.get("lambda_pair_crossover_elems")):
        return False
    return tiled_lambda_available(slate_length, batch)


def tiled_lambda_available(slate_length: int, batch: int) -> bool:
    """True when the tiled kernel (direct or via mesh shard_map) can run."""
    if jax.default_backend() != "tpu" or slate_length > MAX_TILED_LENGTH:
        return False
    from allrank_tpu.ops.soft_sort import per_shard_batch

    b = per_shard_batch(batch)
    return b is not None and _pick_tiles(b, _padded_len(slate_length)) is not None


def tiled_lambda(yp, ts, g, valid, **kw):
    """Mesh-aware dispatch mirroring ops/lambda_pallas.lambda_pairs."""
    from allrank_tpu.ops.soft_sort import dispatch_batch_sharded

    return dispatch_batch_sharded(
        lambda *a: tiled_lambda_pairs(*a, **kw), (yp, ts, g, valid), n_out=2
    )
