"""Shared helpers for the loss zoo."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from allrank_tpu.constants import PADDED_Y_VALUE


def as_f32(*arrays):
    return tuple(jnp.asarray(a, dtype=jnp.float32) for a in arrays)


def padding_mask(y_true: jnp.ndarray, padded_value_indicator: int = PADDED_Y_VALUE):
    """True at padded document positions."""
    return y_true == padded_value_indicator


def resolve_slate_mask(
    y_true: jnp.ndarray,
    slate_mask: Optional[jnp.ndarray],
    padded_value_indicator: int = PADDED_Y_VALUE,
) -> jnp.ndarray:
    """[B] float weights: 1.0 for real slates. With slate_mask=None all slates count."""
    if slate_mask is None:
        return jnp.ones(y_true.shape[0], dtype=jnp.float32)
    return jnp.asarray(slate_mask, dtype=jnp.float32)


def masked_mean_over_slates(per_slate: jnp.ndarray, slate_weights: jnp.ndarray):
    """Mean over slates weighted by validity (== plain mean when all valid)."""
    denom = jnp.maximum(jnp.sum(slate_weights), 1.0)
    return jnp.sum(per_slate * slate_weights) / denom


@jax.custom_jvp
def clamped_log(p: jnp.ndarray) -> jnp.ndarray:
    """log with output clamped to >= -100 (torch BCELoss convention) and a
    bounded backward pass: d/dp = 1/max(p, 1e-12), matching torch's BCE
    gradient eps — a plain max-of-log would yield 0*inf = NaN gradients once
    a sigmoid head saturates to exactly 0 or 1 in fp32."""
    return jnp.maximum(jnp.log(jnp.maximum(p, 0.0)), -100.0)


@clamped_log.defjvp
def _clamped_log_jvp(primals, tangents):
    (p,) = primals
    (t,) = tangents
    return clamped_log(p), t / jnp.maximum(p, 1e-12)


def bce_elementwise(p: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Binary cross-entropy on probabilities with the -100 log clamp."""
    return -(t * clamped_log(p) + (1.0 - t) * clamped_log(1.0 - p))


def bce_with_logits(x: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Numerically stable BCE on logits: max(x,0) - x*z + log(1 + exp(-|x|))."""
    return jnp.maximum(x, 0.0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x)))
