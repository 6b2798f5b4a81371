"""ListMLE Plackett-Luce likelihood loss (reference: allrank/models/losses/listMLE.py:7-38)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from allrank_tpu.constants import DEFAULT_EPS, PADDED_Y_VALUE
from allrank_tpu.losses.common import as_f32, masked_mean_over_slates, resolve_slate_mask


def listMLE(
    y_pred: jnp.ndarray,
    y_true: jnp.ndarray,
    eps: float = DEFAULT_EPS,
    padded_value_indicator: int = PADDED_Y_VALUE,
    rng: Optional[jax.Array] = None,
    slate_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Plackett-Luce negative log-likelihood of the label-descending order.

    ``rng`` drives the random column permutation used for tie resolution
    (the reference shuffles via torch.randperm each call); with rng=None the
    order is deterministic (stable sort) — loss values are identical whenever
    labels are tie-free.
    """
    y_pred, y_true = as_f32(y_pred, y_true)
    sw = resolve_slate_mask(y_true, slate_mask)

    if rng is not None:
        perm = jax.random.permutation(rng, y_pred.shape[-1])
        y_pred = y_pred[:, perm]
        y_true = y_true[:, perm]

    # one variadic sort pass instead of argsort + two gathers (see
    # losses/lambdaloss.py): y_pred rides the label-descending permutation,
    # and its gradient flows back through the sort's carried operand
    neg_true_sorted, preds_sorted = jax.lax.sort(
        (-y_true, y_pred), dimension=-1, num_keys=1, is_stable=True
    )
    y_true_sorted = -neg_true_sorted
    mask = y_true_sorted == padded_value_indicator

    preds_sorted = jnp.where(mask, -jnp.inf, preds_sorted)

    max_pred = jnp.max(preds_sorted, axis=-1, keepdims=True)
    max_pred = jnp.where(jnp.isfinite(max_pred), max_pred, 0.0)  # all-padded guard
    shifted = preds_sorted - max_pred

    # Reversed cumulative logsumexp: log sum_{j>=i} exp(s_j - max)
    exp_shifted = jnp.where(mask, 0.0, jnp.exp(shifted))
    rev_cumsum = jnp.flip(jnp.cumsum(jnp.flip(exp_shifted, axis=1), axis=1), axis=1)

    observation_loss = jnp.log(rev_cumsum + eps) - jnp.where(mask, 0.0, shifted)
    observation_loss = jnp.where(mask, 0.0, observation_loss)

    per_slate = jnp.sum(observation_loss, axis=1)
    return masked_mean_over_slates(per_slate, sw)
