"""ApproxNDCG loss (reference: allrank/models/losses/approxNDCG.py:7-53)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from allrank_tpu.constants import DEFAULT_EPS, PADDED_Y_VALUE
from allrank_tpu.losses.common import (
    as_f32,
    masked_mean_over_slates,
    padding_mask,
    resolve_slate_mask,
)


def approxNDCGLoss(
    y_pred: jnp.ndarray,
    y_true: jnp.ndarray,
    eps: float = DEFAULT_EPS,
    padded_value_indicator: int = PADDED_Y_VALUE,
    alpha: float = 1.0,
    slate_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """NDCG with sigmoid-approximated ranks: rank_i ~ 1 + sum_j sigma(-a(s_i - s_j))."""
    y_pred, y_true = as_f32(y_pred, y_true)
    mask = padding_mask(y_true, padded_value_indicator)
    sw = resolve_slate_mask(y_true, slate_mask)
    slate_length = y_true.shape[1]

    y_pred_f = jnp.where(mask, -jnp.inf, y_pred)
    y_true_f = jnp.where(mask, -jnp.inf, y_true)

    # one variadic sort pass instead of argsort + two gathers (see
    # losses/lambdaloss.py — halves the TPU sort preamble)
    neg_sorted, true_sorted_by_preds = jax.lax.sort(
        (-y_pred_f, y_true_f), dimension=-1, num_keys=1, is_stable=True
    )
    y_pred_sorted = -neg_sorted
    y_true_sorted = -jax.lax.sort(-y_true_f, dimension=-1)

    valid = jnp.isfinite(true_sorted_by_preds)

    true_sorted_by_preds = jnp.maximum(true_sorted_by_preds, 0.0)
    y_true_sorted = jnp.maximum(y_true_sorted, 0.0)

    D = jnp.asarray(
        np.log2(np.arange(slate_length, dtype=np.float64) + 2.0).astype(np.float32)
    )
    max_dcgs = jnp.maximum(
        jnp.sum((jnp.power(2.0, y_true_sorted) - 1.0) / D, axis=-1), eps
    )
    G = (jnp.power(2.0, true_sorted_by_preds) - 1.0) / max_dcgs[:, None]

    from allrank_tpu.ops.approx_pallas import (
        approx_pos as approx_pos_kernel,
        approx_pos_available,
    )

    if approx_pos_available(slate_length, y_pred.shape[0]):
        # fused VMEM rank-sum kernel: the [L, L] diff/sigmoid/clamp chain
        # never reaches HBM (ops/approx_pallas.py); same math + gradient
        approx_pos = 1.0 + approx_pos_kernel(
            y_pred_sorted, valid.astype(jnp.float32), alpha=alpha, eps=eps
        )
    else:
        pair_valid = valid[:, :, None] & valid[:, None, :]
        # exclude the diagonal from the approximate rank sum
        off_diag = ~jnp.eye(slate_length, dtype=bool)
        padded_pairs_mask = pair_valid & off_diag[None, :, :]
        scores_diffs = y_pred_sorted[:, :, None] - y_pred_sorted[:, None, :]
        scores_diffs = jnp.where(padded_pairs_mask, scores_diffs, 0.0)
        approx_pos = 1.0 + jnp.sum(
            padded_pairs_mask.astype(jnp.float32)
            * jnp.maximum(jax.nn.sigmoid(-alpha * scores_diffs), eps),
            axis=-1,
        )
    approx_D = jnp.log2(1.0 + approx_pos)
    approx_ndcg = jnp.sum(G / approx_D, axis=-1)

    return -masked_mean_over_slates(approx_ndcg, sw)
