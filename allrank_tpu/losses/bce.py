"""Binary cross-entropy loss (reference: allrank/models/losses/bce.py:8-32)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from allrank_tpu.constants import PADDED_Y_VALUE
from allrank_tpu.losses.common import as_f32, bce_elementwise, padding_mask


def bce(
    y_pred: jnp.ndarray,
    y_true: jnp.ndarray,
    padded_value_indicator: int = PADDED_Y_VALUE,
    slate_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Masked elementwise BCE normalized by the number of slates with >= 1 valid doc."""
    y_pred, y_true = as_f32(y_pred, y_true)
    mask = padding_mask(y_true, padded_value_indicator)

    ls = jnp.where(mask, 0.0, bce_elementwise(y_pred, jnp.where(mask, 0.0, y_true)))

    document_loss = jnp.sum(ls, axis=-1)
    slate_has_valid = jnp.any(~mask, axis=-1).astype(jnp.float32)
    if slate_mask is not None:
        sw = jnp.asarray(slate_mask, dtype=jnp.float32)
        document_loss = document_loss * sw
        slate_has_valid = slate_has_valid * sw

    return jnp.sum(document_loss) / jnp.maximum(jnp.sum(slate_has_valid), 1.0)
