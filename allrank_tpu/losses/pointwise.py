"""Pointwise RMSE loss (reference: allrank/models/losses/pointwise.py:6-32)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from allrank_tpu.constants import PADDED_Y_VALUE
from allrank_tpu.losses.common import (
    as_f32,
    masked_mean_over_slates,
    padding_mask,
    resolve_slate_mask,
)


def pointwise_rmse(
    y_pred: jnp.ndarray,
    y_true: jnp.ndarray,
    no_of_levels: float,
    padded_value_indicator: int = PADDED_Y_VALUE,
    slate_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Per-slate masked RMSE of (y - no_of_levels * y_pred), averaged over slates."""
    y_pred, y_true = as_f32(y_pred, y_true)
    mask = padding_mask(y_true, padded_value_indicator)
    sw = resolve_slate_mask(y_true, slate_mask)

    valid = (~mask).astype(jnp.float32)
    y_true = jnp.where(mask, 0.0, y_true)
    y_pred = jnp.where(mask, 0.0, y_pred)

    errors = (y_true - no_of_levels * y_pred) ** 2
    mse = jnp.sum(errors, axis=1) / jnp.maximum(jnp.sum(valid, axis=1), 1.0)
    return masked_mean_over_slates(jnp.sqrt(mse), sw)
