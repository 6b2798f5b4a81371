"""LambdaLoss framework with pluggable weighing schemes
(reference: allrank/models/losses/lambdaLoss.py:7-114).

TPU-first notes:
  * The reference's boolean-mask reduction (``losses[pairs_mask & k_mask]``)
    is a dynamic-shape op; here the pair mask weights a dense [B, L, L]
    tensor and "sum"/"mean" reduce over the selected count — identical values,
    static shapes.
  * Position-dependent tables (log2 discounts, ndcgLoss2 deltas) are
    host-precomputed float64 constants for exactness.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from allrank_tpu.constants import DEFAULT_EPS, PADDED_Y_VALUE
from allrank_tpu.losses.common import as_f32, padding_mask


def _log2_positions(n: int) -> np.ndarray:
    """D[i] = log2(2 + i) for positions i = 0..n-1 (host, exact)."""
    return np.log2(np.arange(n, dtype=np.float64) + 2.0).astype(np.float32)


def ndcgLoss1_scheme(G, D, mu, true_sorted):
    return (G / D[None, :])[:, :, None]


def _ndcgLoss2_deltas(n: int) -> np.ndarray:
    """|1/D[|i-j|-1] - 1/D[|i-j|]| with zero diagonal, precomputed on host."""
    D = np.log2(np.arange(n, dtype=np.float64) + 2.0)
    pos = np.arange(1, n + 1)
    delta_idx = np.abs(pos[:, None] - pos[None, :])
    # diagonal (delta 0) maps to D[-1]; it is zeroed below, clamp idx to 0
    idx_prev = np.clip(delta_idx - 1, 0, n - 1)
    deltas = np.abs(1.0 / D[idx_prev] - 1.0 / D[delta_idx])
    np.fill_diagonal(deltas, 0.0)
    return deltas.astype(np.float32)


def ndcgLoss2_scheme(G, D, mu, true_sorted):
    deltas = jnp.asarray(_ndcgLoss2_deltas(G.shape[1]))
    return deltas[None, :, :] * jnp.abs(G[:, :, None] - G[:, None, :])


def lambdaRank_scheme(G, D, mu, true_sorted):
    inv_d = 1.0 / D
    return jnp.abs(inv_d[None, :, None] - inv_d[None, None, :]) * jnp.abs(
        G[:, :, None] - G[:, None, :]
    )


def ndcgLoss2PP_scheme(G, D, mu, true_sorted):
    return mu * ndcgLoss2_scheme(G, D, mu, true_sorted) + lambdaRank_scheme(
        G, D, mu, true_sorted
    )


def rankNet_scheme(G, D, mu, true_sorted):
    return 1.0


def rankNetWeightedByGTDiff_scheme(G, D, mu, true_sorted):
    return jnp.abs(true_sorted[:, :, None] - true_sorted[:, None, :])


def rankNetWeightedByGTDiffPowed_scheme(G, D, mu, true_sorted):
    return jnp.abs(true_sorted[:, :, None] ** 2 - true_sorted[:, None, :] ** 2)


WEIGHING_SCHEMES = {
    "ndcgLoss1_scheme": ndcgLoss1_scheme,
    "ndcgLoss2_scheme": ndcgLoss2_scheme,
    "lambdaRank_scheme": lambdaRank_scheme,
    "ndcgLoss2PP_scheme": ndcgLoss2PP_scheme,
    "rankNet_scheme": rankNet_scheme,
    "rankNetWeightedByGTDiff_scheme": rankNetWeightedByGTDiff_scheme,
    "rankNetWeightedByGTDiffPowed_scheme": rankNetWeightedByGTDiffPowed_scheme,
}


def lambdaLoss(
    y_pred: jnp.ndarray,
    y_true: jnp.ndarray,
    eps: float = DEFAULT_EPS,
    padded_value_indicator: int = PADDED_Y_VALUE,
    weighing_scheme: Optional[str] = None,
    k: Optional[int] = None,
    sigma: float = 1.0,
    mu: float = 10.0,
    reduction: str = "sum",
    reduction_log: str = "binary",
    slate_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Unified LambdaLoss: weighted pairwise sigmoid probabilities over
    prediction-sorted slates, truncated to the top-k x top-k pair block."""
    if reduction_log not in ("natural", "binary"):
        raise ValueError("Reduction logarithm base can be either natural or binary")
    if reduction not in ("sum", "mean"):
        raise ValueError("Reduction method can be either sum or mean")

    y_pred, y_true = as_f32(y_pred, y_true)
    mask = padding_mask(y_true, padded_value_indicator)
    slate_length = y_true.shape[1]

    neg_fill = -jnp.inf
    y_pred_f = jnp.where(mask, neg_fill, y_pred)
    y_true_f = jnp.where(mask, neg_fill, y_true)

    # one variadic sort pass instead of argsort + two gathers: the carried
    # operand rides the same permutation, and TPU sorts are expensive enough
    # (bitonic passes) that this halves the sort preamble (0.36 -> 0.15 ms
    # at B=64, L=240 measured); stable ascending on -y_pred == the
    # reference's stable descending argsort
    neg_sorted, true_sorted_by_preds = jax.lax.sort(
        (-y_pred_f, y_true_f), dimension=-1, num_keys=1, is_stable=True
    )
    y_pred_sorted = -neg_sorted
    y_true_sorted = -jax.lax.sort(-y_true_f, dimension=-1)

    k_eff = slate_length if k is None else min(int(k), slate_length)

    y_true_sorted = jnp.maximum(y_true_sorted, 0.0)
    D = jnp.asarray(_log2_positions(slate_length))
    max_dcgs = jnp.maximum(
        jnp.sum(((jnp.power(2.0, y_true_sorted) - 1.0) / D)[:, :k_eff], axis=-1), eps
    )

    # Every selected pair lives in the top-k x top-k block of the
    # prediction-sorted slate (the reference's ndcg_at_k_mask,
    # allrank/models/losses/lambdaLoss.py:79-80, selects exactly that
    # block), so slice to it BEFORE any [B, *, *] pair tensor exists: all
    # three paths below then do O(k^2) work instead of O(L^2)-masked-to-k^2.
    true_raw_topk = true_sorted_by_preds[:, :k_eff]  # pre-clamp, -inf pads
    y_pred_sorted = y_pred_sorted[:, :k_eff]
    pred_valid = jnp.isfinite(true_raw_topk)
    true_sorted_by_preds = jnp.maximum(true_raw_topk, 0.0)
    G = (jnp.power(2.0, true_sorted_by_preds) - 1.0) / max_dcgs[:, None]
    D = D[:k_eff]

    from allrank_tpu.ops.lambda_pallas import (
        lambda_pairs,
        lambda_pairs_available,
    )
    from allrank_tpu.ops.lambda_tiled import (
        tiled_lambda,
        tiled_lambda_preferred,
    )

    from allrank_tpu.ops.lambda_sp import sp_lambda_dispatch

    # fused VMEM pairwise chain: square kernel (whole [k, k] slab resident,
    # ops/lambda_pallas.py) up to k_eff=384; the pair-tiled kernel
    # (ops/lambda_tiled.py) beyond that once XLA's [B, k, k] intermediates
    # would pressure HBM — same math, none of the pair tensors reach HBM.
    # On a sequence mesh at long k_eff, the pair ROWS shard over the
    # sequence axis instead (ops/lambda_sp.py) — each shard owns O(k^2/P)
    # of the pair block, the slate-axis answer the reference lacks
    kernel = sp_lambda_dispatch(k_eff, y_pred.shape[0])
    if kernel is None and lambda_pairs_available(k_eff, y_pred.shape[0]):
        kernel = lambda_pairs
    elif kernel is None and tiled_lambda_preferred(k_eff, y_pred.shape[0]):
        kernel = tiled_lambda
    if kernel is not None:
        valid_rows = pred_valid
        if slate_mask is not None:
            valid_rows = valid_rows & jnp.asarray(slate_mask, dtype=bool)[:, None]
        loss_sums, counts = kernel(
            jnp.where(pred_valid, y_pred_sorted, 0.0),
            true_sorted_by_preds,
            G,
            valid_rows.astype(jnp.float32),
            scheme=weighing_scheme, k_eff=k_eff, sigma=sigma, mu=mu,
            log_base=reduction_log, eps=eps,
        )
        total = jnp.sum(loss_sums)
        if reduction == "sum":
            return -total
        return -total / jnp.maximum(jnp.sum(counts), 1.0)

    pair_valid = pred_valid[:, :, None] & pred_valid[:, None, :]
    true_diffs = jnp.where(
        pair_valid,
        true_raw_topk[:, :, None] - true_raw_topk[:, None, :],
        0.0,
    )
    padded_pairs_mask = pair_valid
    if weighing_scheme != "ndcgLoss1_scheme":
        padded_pairs_mask = padded_pairs_mask & (true_diffs > 0)
    if slate_mask is not None:
        padded_pairs_mask = padded_pairs_mask & (
            jnp.asarray(slate_mask, dtype=bool)[:, None, None]
        )

    if weighing_scheme is None:
        weights = 1.0
    else:
        weights = WEIGHING_SCHEMES[weighing_scheme](G, D, mu, true_sorted_by_preds)

    scores_diffs = y_pred_sorted[:, :, None] - y_pred_sorted[:, None, :]
    scores_diffs = jnp.where(pair_valid, scores_diffs, 0.0)
    scores_diffs = jnp.clip(scores_diffs, -1e8, 1e8)

    # log-space weighted-probability chain: the reference computes
    # log(max(pow(max(s, eps), w), eps)); since log is monotonic this is
    # EXACTLY max(w*log(max(s, eps)), log(eps)) — same math, one fewer
    # transcendental, and none of fp32 pow's rounding loss (measured vs an
    # fp64 host reference at L=1308: rel 2.4e-3 for the pow form, 2.1e-6
    # in log space). Matches the fused kernels' formulation.
    log_a = jnp.log(jnp.maximum(jax.nn.sigmoid(sigma * scores_diffs), eps))
    losses = jnp.maximum(weights * log_a, float(np.log(eps)))
    if reduction_log == "binary":
        losses = losses / float(np.log(2.0))

    selected = padded_pairs_mask.astype(jnp.float32)
    total = jnp.sum(losses * selected)
    if reduction == "sum":
        return -total
    return -total / jnp.maximum(jnp.sum(selected), 1.0)
