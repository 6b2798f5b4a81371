"""ListNet losses (reference: allrank/models/losses/listNet.py:8-30,
allrank/models/losses/binary_listNet.py:8-33)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from allrank_tpu.constants import DEFAULT_EPS, PADDED_Y_VALUE
from allrank_tpu.losses.common import (
    as_f32,
    masked_mean_over_slates,
    padding_mask,
    resolve_slate_mask,
)


def listNet(
    y_pred: jnp.ndarray,
    y_true: jnp.ndarray,
    eps: float = DEFAULT_EPS,
    padded_value_indicator: int = PADDED_Y_VALUE,
    slate_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Masked softmax cross-entropy between softmax(y_true) and softmax(y_pred).

    Padded documents are excluded by a -inf fill on both sides before softmax.
    """
    y_pred, y_true = as_f32(y_pred, y_true)
    mask = padding_mask(y_true, padded_value_indicator)
    sw = resolve_slate_mask(y_true, slate_mask)

    y_pred = jnp.where(mask, -jnp.inf, y_pred)
    y_true = jnp.where(mask, -jnp.inf, y_true)

    preds_smax = jax.nn.softmax(y_pred, axis=1)
    true_smax = jax.nn.softmax(y_true, axis=1)

    preds_log = jnp.log(preds_smax + eps)
    # Guard batch-padding slates (all -inf rows softmax to NaN).
    ce = jnp.where(mask, 0.0, true_smax * preds_log)
    per_slate = -jnp.sum(jnp.where(jnp.isnan(ce), 0.0, ce), axis=1)
    return masked_mean_over_slates(per_slate, sw)


def binary_listNet(
    y_pred: jnp.ndarray,
    y_true: jnp.ndarray,
    eps: float = DEFAULT_EPS,
    padded_value_indicator: int = PADDED_Y_VALUE,
    slate_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """ListNet variant for binary labels: targets are y_true / sum(y_true)
    (zero-safe) instead of a label softmax."""
    y_pred, y_true = as_f32(y_pred, y_true)
    mask = padding_mask(y_true, padded_value_indicator)
    sw = resolve_slate_mask(y_true, slate_mask)

    y_pred = jnp.where(mask, -jnp.inf, y_pred)
    y_true = jnp.where(mask, 0.0, y_true)

    normalizer = jnp.sum(y_true, axis=-1, keepdims=True)
    normalizer = jnp.where(normalizer == 0.0, 1.0, normalizer)
    targets = y_true / normalizer

    preds_smax = jax.nn.softmax(y_pred, axis=1)
    preds_log = jnp.log(preds_smax + eps)
    ce = targets * preds_log
    per_slate = -jnp.sum(jnp.where(jnp.isnan(ce), 0.0, ce), axis=1)
    return masked_mean_over_slates(per_slate, sw)
