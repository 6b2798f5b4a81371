"""Fused LambdaLoss pairwise chain — Pallas TPU kernel with custom VJP.

After the sort, lambdaLoss is a pure elementwise chain over [B, L, L]
pair tensors: validity/positivity masks -> score diffs -> sigmoid -> weight
power -> log -> masked sum (losses/lambdaloss.py). XLA materializes several
of those L x L intermediates in HBM between fusion boundaries; at the
flagship shape (B=64, L=240) that is ~100+ MB of traffic per step for ~0.1 ms
of VPU math. This kernel computes the whole chain per slate-block inside
VMEM and emits only the per-slate loss sum and selected-pair count; the
backward replays the chain and reduces the pair gradients to the [L]
row/column sums analytically — nothing [L, L]-shaped ever leaves the core.

Gradient derivation (matches jax.grad of the XLA chain, including the
``maximum(.., eps)`` clamps whose subgradient picks the input branch iff
input > eps):

    d = clip(yp_i - yp_j, +-1e8) on valid pairs
    s = sigmoid(sigma d); a = max(s, eps); p = a^w; q = max(p, eps)
    loss_ij = sel_ij * log_base(q);  total = sum_ij loss_ij
    dtotal/dyp_i = sum_j c_ij - sum_j c_ji,  where
    c = sel * [p > eps]/(q ln) * w * a^(w-1) * [s > eps] * sigma * s(1-s)
      = sel * [w log a > log eps] * (w / (a ln)) * [s > eps] * sigma * s(1-s)

(the second form is what the kernel evaluates: on the active branch q = a^w,
so the power cancels and no exp is ever taken — see _chain)

(``ln`` = ln2 for binary log, 1 for natural.) The weighing scheme w never
depends on y_pred except through the (non-differentiable) sort order, so no
other gradient path exists — verified against jax.grad of the XLA version.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
_LN2 = float(np.log(2.0))


def _pair_weights(scheme, g, ts, d_row, deltas, mu):
    """w [bb, L, L] for the static scheme (g/ts: [bb, L]; d_row: [L])."""
    if scheme is None or scheme == "rankNet_scheme":
        return None  # weight 1: power is the identity
    if scheme == "ndcgLoss1_scheme":
        return jnp.broadcast_to(
            (g / d_row[None, :])[:, :, None],
            (g.shape[0], g.shape[1], g.shape[1]),
        )
    if scheme == "rankNetWeightedByGTDiff_scheme":
        return jnp.abs(ts[:, :, None] - ts[:, None, :])
    if scheme == "rankNetWeightedByGTDiffPowed_scheme":
        return jnp.abs(ts[:, :, None] ** 2 - ts[:, None, :] ** 2)
    gdiff = jnp.abs(g[:, :, None] - g[:, None, :])
    if scheme == "ndcgLoss2_scheme":
        return deltas[None, :, :] * gdiff
    inv_d = 1.0 / d_row
    lrank = jnp.abs(inv_d[None, :, None] - inv_d[None, None, :]) * gdiff
    if scheme == "lambdaRank_scheme":
        return lrank
    if scheme == "ndcgLoss2PP_scheme":
        return mu * (deltas[None, :, :] * gdiff) + lrank
    raise ValueError(f"unknown scheme {scheme}")


def _chain(yp, ts, g, valid, d_row, deltas, *, scheme, k_eff, sigma, mu,
           log_base, eps):
    """Shared fwd/bwd body: returns (losses [bb,L,L], sel, s, a, wlog, w).

    The weighted-probability chain runs in LOG SPACE: the XLA reference's
    log(max(a^w, eps)) equals max(w*log a, log eps) (log is monotone), so
    the a^w = exp(w*log a) transcendental never needs to be evaluated —
    only one log and the sigmoid remain, which is what bounds the VPU at
    [L, L] pair scale."""
    bb, L = yp.shape
    pv = (valid[:, :, None] > 0.5) & (valid[:, None, :] > 0.5)
    sel = pv
    if scheme != "ndcgLoss1_scheme":
        sel = sel & ((ts[:, :, None] - ts[:, None, :]) > 0)
    if k_eff < L:
        rows = jax.lax.broadcasted_iota(jnp.int32, (bb, L, L), 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (bb, L, L), 2)
        sel = sel & (rows < k_eff) & (cols < k_eff)

    d = yp[:, :, None] - yp[:, None, :]
    d = jnp.where(pv, d, 0.0)
    d = jnp.clip(d, -1e8, 1e8)

    s = jax.nn.sigmoid(sigma * d)
    a = jnp.maximum(s, eps)
    w = _pair_weights(scheme, g, ts, d_row, deltas, mu)
    log_a = jnp.log(a)
    wlog = log_a if w is None else w * log_a
    logs = jnp.maximum(wlog, float(np.log(eps)))
    if log_base == "binary":
        logs = logs / _LN2
    return logs, sel, s, a, wlog, w


def _fwd_kernel(yp_ref, ts_ref, g_ref, valid_ref, drow_ref, deltas_ref,
                loss_ref, cnt_ref, **kw):
    logs, sel, *_ = _chain(
        yp_ref[...], ts_ref[...], g_ref[...], valid_ref[...],
        drow_ref[0], deltas_ref[...], **kw,
    )
    self_f = sel.astype(F32)
    loss_ref[...] = jnp.sum(logs * self_f, axis=2)
    cnt_ref[...] = jnp.sum(self_f, axis=2)


def _bwd_kernel(yp_ref, ts_ref, g_ref, valid_ref, drow_ref, deltas_ref,
                gout_ref, dyp_ref, **kw):
    yp = yp_ref[...]
    logs, sel, s, a, wlog, w = _chain(
        yp, ts_ref[...], g_ref[...], valid_ref[...], drow_ref[0],
        deltas_ref[...], **kw,
    )
    del logs
    eps = kw["eps"]
    sigma = kw["sigma"]
    ln = _LN2 if kw["log_base"] == "binary" else 1.0
    # on the active branch (p = a^w > eps <=> w*log a > log eps) the XLA
    # chain's  w * a^(w-1) / max(a^w, eps)  collapses to  w / a
    w_over_a = (1.0 / a) if w is None else (w / a)
    c = sel.astype(F32) * jnp.where(
        wlog > float(np.log(eps)), w_over_a / ln, 0.0
    )
    c = c * jnp.where(s > eps, sigma * s * (1.0 - s), 0.0)
    grad = jnp.sum(c, axis=2) - jnp.sum(c, axis=1)  # [bb, L]
    dyp_ref[...] = grad * gout_ref[...]  # gout [bb, 1] broadcasts


def _block(b: int, l: int):
    """Slates per program, or None when no legal block exists. Blocks are
    [bb, L] with L == the full trailing dim, so Mosaic requires bb to be a
    multiple of 8 or the whole batch."""
    budget = 5 * 1024 * 1024
    cand = max(1, min(b, budget // max(1, 8 * l * l)))
    for bb in range(cand, 0, -1):
        if b % bb == 0 and (bb % 8 == 0 or bb == b):
            return bb
    return None


@functools.lru_cache(maxsize=64)
def _make_fused(scheme, k_eff, sigma, mu, log_base, eps, slate_length):
    kw = dict(scheme=scheme, k_eff=k_eff, sigma=sigma, mu=mu,
              log_base=log_base, eps=eps)
    L = slate_length
    deltas = (
        _ndcg2_deltas_np(L)
        if scheme in ("ndcgLoss2_scheme", "ndcgLoss2PP_scheme")
        else np.zeros((L, L), dtype=np.float32)
    )
    d_row = np.log2(np.arange(L, dtype=np.float64) + 2.0).astype(np.float32)

    def specs(bb):
        vec = pl.BlockSpec((bb, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
        row = pl.BlockSpec((1, L), lambda i: (0, 0), memory_space=pltpu.VMEM)
        tab = pl.BlockSpec((L, L), lambda i: (0, 0), memory_space=pltpu.VMEM)
        scal = pl.BlockSpec((bb, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
        return vec, row, tab, scal

    @jax.custom_vjp
    def fused(yp, ts, g, valid):
        b = yp.shape[0]
        bb = _block(b, L)
        vec, row, tab, scal = specs(bb)
        loss, cnt = pl.pallas_call(
            functools.partial(_fwd_kernel, **kw),
            grid=(b // bb,),
            in_specs=[vec, vec, vec, vec, row, tab],
            out_specs=[scal, scal],
            out_shape=[
                jax.ShapeDtypeStruct((b, L), F32),
                jax.ShapeDtypeStruct((b, L), F32),
            ],
        )(yp, ts, g, valid, jnp.asarray(d_row)[None], jnp.asarray(deltas))
        # kernels emit per-row partial sums (2-D outputs keep Mosaic's
        # layout rules happy); collapse to per-slate scalars here
        return jnp.sum(loss, axis=1), jnp.sum(cnt, axis=1)

    def fwd(yp, ts, g, valid):
        return fused(yp, ts, g, valid), (yp, ts, g, valid)

    def bwd(res, cts):
        yp, ts, g, valid = res
        g_loss, _g_cnt = cts  # counts carry no gradient
        b = yp.shape[0]
        bb = _block(b, L)
        vec, row, tab, scal = specs(bb)
        dyp = pl.pallas_call(
            functools.partial(_bwd_kernel, **kw),
            grid=(b // bb,),
            in_specs=[vec, vec, vec, vec, row, tab,
                      pl.BlockSpec((bb, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=vec,
            out_shape=jax.ShapeDtypeStruct((b, L), F32),
        )(yp, ts, g, valid, jnp.asarray(d_row)[None], jnp.asarray(deltas),
          g_loss.astype(F32)[:, None])
        zeros = jnp.zeros_like
        return dyp, zeros(ts), zeros(g), zeros(valid)

    fused.defvjp(fwd, bwd)
    return fused


def _ndcg2_deltas_np(n: int) -> np.ndarray:
    """The ndcgLoss2 delta table — single source of truth lives with the
    XLA loss (safe import: lambdaloss's ops imports are lazy)."""
    from allrank_tpu.losses.lambdaloss import _ndcgLoss2_deltas

    return _ndcgLoss2_deltas(n)


def fused_lambda_pairs(
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
    """(per-slate loss sums [B], selected-pair counts [B]) of the lambdaLoss
    pairwise chain, fused in VMEM. All inputs [B, L] fp32 (``valid`` as
    0/1 floats); gradients flow to ``y_pred_sorted`` only."""
    f = _make_fused(scheme, int(k_eff), float(sigma), float(mu),
                    str(log_base), float(eps), int(y_pred_sorted.shape[1]))
    return f(y_pred_sorted.astype(F32), true_sorted.astype(F32),
             gains.astype(F32), valid.astype(F32))


# one [bb, L, L] chain holds ~8 live f32 tiles; beyond this L even bb=1
# blows the VMEM budget and the XLA path is used
MAX_FUSED_LENGTH = 384


def lambda_pairs_available(slate_length: int, batch: int) -> bool:
    """True when the fused kernel (direct or via mesh shard_map) can run."""
    if jax.default_backend() != "tpu" or slate_length > MAX_FUSED_LENGTH:
        return False
    from allrank_tpu.ops.soft_sort import per_shard_batch

    b = per_shard_batch(batch)  # per-shard batch must block legally
    return b is not None and _block(b, slate_length) is not None


def lambda_pairs(yp, ts, g, valid, **kw):
    """Mesh-aware dispatch: per-shard via shard_map over every mesh axis
    that divides the batch (the pod code path), direct on a single chip."""
    from allrank_tpu.ops.soft_sort import dispatch_batch_sharded

    return dispatch_batch_sharded(
        lambda *a: fused_lambda_pairs(*a, **kw), (yp, ts, g, valid), n_out=2
    )
