"""Ordinal regression loss (reference: allrank/models/losses/ordinal.py:8-50)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from allrank_tpu.constants import PADDED_Y_VALUE
from allrank_tpu.losses.common import as_f32, bce_elementwise


def with_ordinals(y: jnp.ndarray, n: int, padded_value_indicator: int = PADDED_Y_VALUE):
    """Labels -> cumulative one-hot ordinals: out[..., k] = (y >= k+1); padding propagates."""
    y = jnp.asarray(y, dtype=jnp.float32)
    thresholds = jnp.arange(1, n + 1, dtype=jnp.float32)
    expanded = y[..., None]
    ordinals = (expanded >= thresholds).astype(jnp.float32)
    return jnp.where(expanded == padded_value_indicator,
                     float(padded_value_indicator), ordinals)


def ordinal(
    y_pred: jnp.ndarray,
    y_true: jnp.ndarray,
    n: int,
    padded_value_indicator: int = PADDED_Y_VALUE,
    slate_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Masked BCE over n cumulative ordinal targets, normalized by valid doc count.

    ``y_pred`` is [B, L, n] from a sigmoid head (d_output = n).
    """
    y_pred = jnp.asarray(y_pred, dtype=jnp.float32)
    (y_true,) = as_f32(y_true)
    targets = with_ordinals(y_true, n, padded_value_indicator)

    mask = targets == padded_value_indicator
    ls = jnp.where(mask, 0.0, bce_elementwise(y_pred, jnp.where(mask, 0.0, targets)))

    document_loss = jnp.sum(ls, axis=2)
    doc_valid = jnp.any(~mask, axis=2).astype(jnp.float32)
    if slate_mask is not None:
        sw = jnp.asarray(slate_mask, dtype=jnp.float32)
        document_loss = document_loss * sw[:, None]
        doc_valid = doc_valid * sw[:, None]

    return jnp.sum(document_loss) / jnp.maximum(jnp.sum(doc_valid), 1.0)
