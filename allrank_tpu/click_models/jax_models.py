"""On-device, batch-vectorized click models.

The host click models (base.py / cascade_models.py) process one slate at a
time in numpy — fine for dataset generation, but the north-star pipeline
keeps rank -> click -> metrics entirely on the TPU. These are jittable
batch formulations over ``[B, L]`` label arrays producing {1, 0, -1} click
masks, matching the host models' semantics exactly (the inherently
sequential DiverseClicksModel stays host-side).

``as_device_click_fn`` maps a configured host click-model instance to its
vectorized equivalent when one exists (returns None otherwise), so
``rank_and_click`` can transparently run the supported models on-device.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from allrank_tpu.constants import PADDED_Y_VALUE


def _finalize(clicks: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Clip to {0,1} on real docs, restore -1 at padding."""
    padded = y == PADDED_Y_VALUE
    return jnp.where(padded, PADDED_Y_VALUE, clicks.astype(jnp.int32))


def only_relevant_clicks(rng, y: jnp.ndarray, relevancy_threshold: float):
    """Vectorized OnlyRelevantClickModel (base.py:132-146)."""
    del rng
    return _finalize(y >= relevancy_threshold, y)


def fixed_clicks(rng, y: jnp.ndarray, click_positions):
    """Vectorized FixedClickModel (base.py:49-65). Positions index the
    non-padded prefix (ranked slates keep padding last, so plain positional
    indexing matches the host model applied after padding-stripping)."""
    del rng
    ell = y.shape[-1]
    pos = jnp.zeros((ell,), dtype=bool).at[jnp.asarray(click_positions)].set(True)
    return _finalize(jnp.broadcast_to(pos, y.shape), y)


def base_cascade_clicks(rng, y: jnp.ndarray, eta: float, threshold: float):
    """Vectorized BaseCascadeModel (cascade_models.py:12-32): observe rank r
    with probability (1/r)^eta, click observed docs with y >= threshold.
    Ranks count real (non-padded) positions — ranked slates keep padding
    last, so the rank is just the column index + 1."""
    b, ell = y.shape
    ranks = jnp.arange(1, ell + 1, dtype=jnp.float32)[None, :]
    u = jax.random.uniform(rng, (b, ell))
    observed = (1.0 / ranks**eta) >= u
    return _finalize((y * observed) >= threshold, y)


def random_clicks(rng, y: jnp.ndarray, n_clicks: int):
    """Vectorized RandomClickModel (base.py:29-46): n_clicks uniform draws
    without replacement among each slate's real documents."""
    b, ell = y.shape
    real = y != PADDED_Y_VALUE
    # random scores; padding pushed to the bottom -> top-n_clicks of real docs
    scores = jax.random.uniform(rng, (b, ell))
    scores = jnp.where(real, scores, -1.0)
    order = jnp.argsort(scores, axis=-1, descending=True)
    rank_of = jnp.argsort(order, axis=-1)
    return _finalize((rank_of < n_clicks) & real, y)


def max_clicks(inner: Callable, max_clicks_n: int):
    """Vectorized MaxClicksModel wrapper (base.py:109-129)."""

    def fn(rng, y, **kw):
        clicks = inner(rng, y, **kw)
        pos = jnp.clip(clicks, 0, 1)
        within = jnp.cumsum(pos, axis=-1) <= max_clicks_n
        return _finalize(pos * within, y)

    return fn


def as_device_click_fn(click_model) -> Optional[Callable]:
    """Map a host click-model instance to a jittable (rng, y) -> clicks
    function, or None when the model has no vectorized equivalent."""
    from allrank_tpu.click_models.base import (
        FixedClickModel,
        MaxClicksModel,
        OnlyRelevantClickModel,
        RandomClickModel,
    )
    from allrank_tpu.click_models.cascade_models import BaseCascadeModel

    if isinstance(click_model, OnlyRelevantClickModel):
        thr = click_model.relevancy_threshold
        return lambda rng, y: only_relevant_clicks(rng, y, thr)
    if isinstance(click_model, FixedClickModel):
        pos = click_model.click_positions
        return lambda rng, y: fixed_clicks(rng, y, pos)
    if isinstance(click_model, BaseCascadeModel):
        eta, thr = click_model.eta, click_model.threshold
        return lambda rng, y: base_cascade_clicks(rng, y, eta, thr)
    if isinstance(click_model, RandomClickModel):
        n = click_model.n_clicks
        return lambda rng, y: random_clicks(rng, y, n)
    if isinstance(click_model, MaxClicksModel):
        inner = as_device_click_fn(click_model.inner_click_model)
        if inner is None:
            return None
        n = click_model.max_clicks
        if n is None:
            return inner

        def fn(rng, y):
            clicks = inner(rng, y)
            pos = jnp.clip(clicks, 0, 1)
            within = jnp.cumsum(pos, axis=-1) <= n
            return _finalize(pos * within, y)

        return fn
    return None
