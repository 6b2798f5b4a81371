"""RankNet pairwise losses (reference: allrank/models/losses/rankNet.py:9-79).

TPU-first formulation: instead of the reference's dynamic boolean-indexed pair
list (itertools.product + mask filtering), all L x L score/label difference
matrices are kept dense and invalid pairs weighted 0 — jit-stable static
shapes. Reduction semantics are identical: BCEWithLogitsLoss-style mean over
the *selected* pair count.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from allrank_tpu.constants import PADDED_Y_VALUE
from allrank_tpu.losses.common import as_f32, bce_with_logits, padding_mask, resolve_slate_mask


def rankNet(
    y_pred: jnp.ndarray,
    y_true: jnp.ndarray,
    padded_value_indicator: int = PADDED_Y_VALUE,
    weight_by_diff: bool = False,
    weight_by_diff_powed: bool = False,
    slate_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Pairwise logistic loss over all (i, j) with y_true_i > y_true_j."""
    y_pred, y_true = as_f32(y_pred, y_true)
    mask = padding_mask(y_true, padded_value_indicator)
    sw = resolve_slate_mask(y_true, slate_mask)

    valid = ~mask
    pair_valid = valid[:, :, None] & valid[:, None, :]

    true_diffs = y_true[:, :, None] - y_true[:, None, :]
    selected = pair_valid & (true_diffs > 0)
    selected = selected & (sw[:, None, None] > 0)
    sel_f = selected.astype(jnp.float32)

    pred_diffs = y_pred[:, :, None] - y_pred[:, None, :]
    pred_diffs = jnp.where(selected, pred_diffs, 0.0)

    if weight_by_diff:
        weight = jnp.abs(true_diffs)
    elif weight_by_diff_powed:
        weight = jnp.abs(y_true[:, :, None] ** 2 - y_true[:, None, :] ** 2)
    else:
        weight = jnp.ones_like(true_diffs)
    weight = jnp.where(selected, weight, 0.0)

    # Selected targets are all 1 (true_diffs > 0), so BCE = softplus(-diff);
    # keep the general form for clarity.
    losses = bce_with_logits(pred_diffs, jnp.ones_like(pred_diffs)) * weight * sel_f

    n_selected = jnp.maximum(jnp.sum(sel_f), 1.0)
    return jnp.sum(losses) / n_selected


def rankNet_weightByGTDiff(
    y_pred, y_true, padded_value_indicator: int = PADDED_Y_VALUE, slate_mask=None
):
    """RankNet weighted by |delta ground truth|."""
    return rankNet(y_pred, y_true, padded_value_indicator, weight_by_diff=True,
                   slate_mask=slate_mask)


def rankNet_weightByGTDiff_pow(
    y_pred, y_true, padded_value_indicator: int = PADDED_Y_VALUE, slate_mask=None
):
    """RankNet weighted by |delta of squared ground truth|."""
    return rankNet(y_pred, y_true, padded_value_indicator, weight_by_diff=False,
                   weight_by_diff_powed=True, slate_mask=slate_mask)
