"""On-device, batch-vectorized click models.

The host click models (base.py / cascade_models.py) process one slate at a
time in numpy — fine for dataset generation, but the north-star pipeline
keeps rank -> click -> metrics entirely on the TPU. These are jittable
batch formulations over ``[B, L]`` label arrays producing {1, 0, -1} click
masks, matching the host models' semantics exactly. The greedy
DiverseClicksModel runs as a ``lax.scan`` recurrence; the Multiple /
Conditioned combinators evaluate every inner model and select per slate,
so the whole reference click-model zoo is jittable.

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


def multiple_clicks(rng, y: jnp.ndarray, inner_fns, cumulative, x=None):
    """Vectorized MultipleClickModel (base.py:56-72): each slate draws one
    uniform and runs the inner model whose cumulative-probability bucket it
    falls into. All inner models evaluate (they are cheap, elementwise) and
    a per-slate gather selects the active one — no data-dependent branching
    inside jit."""
    sel_rng, *keys = jax.random.split(rng, len(inner_fns) + 1)
    outs = jnp.stack(
        [fn(k, y, x) for fn, k in zip(inner_fns, keys)]
    )  # [M, B, L]
    cum = jnp.asarray(cumulative, dtype=jnp.float32)
    u = jax.random.uniform(sel_rng, (y.shape[0],))
    # first index i with u < cum[i] == count of cum entries <= u
    idx = jnp.clip(
        jnp.searchsorted(cum, u, side="right"), 0, len(inner_fns) - 1
    )
    sel = jnp.take_along_axis(outs, idx[None, :, None], axis=0)[0]
    return _finalize(jnp.clip(sel, 0, 1), y)


def conditioned_clicks(rng, y: jnp.ndarray, inner_fns, combiner, x=None):
    """Vectorized ConditionedClickModel (base.py:75-89): logical all/any
    reduction of the inner models' click masks over real documents."""
    keys = jax.random.split(rng, len(inner_fns))
    outs = jnp.stack(
        [jnp.clip(fn(k, y, x), 0, 1) for fn, k in zip(inner_fns, keys)]
    )
    return _finalize(combiner(outs, axis=0), y)


def diverse_clicks(rng, y: jnp.ndarray, x: jnp.ndarray, inner_fn,
                   q_percentile: float):
    """Vectorized DiverseClicksModel (cascade_models.py:29-61): keep an inner
    click only when the document sits farther than the q-th percentile of
    pairwise distances from every previously-kept click.

    The host model's greedy left-to-right filter is a linear recurrence, so
    it runs as a ``lax.scan`` over slate positions (state: the kept mask);
    the O(L^2 F) pairwise-distance matrix and the masked quantile are plain
    batched XLA ops. vmapped over the batch."""
    clicks = inner_fn(rng, y, x)
    pos_clicks = jnp.clip(clicks, 0, 1)

    def one_slate(xs, ys, cs):
        ell = ys.shape[0]
        real = ys != PADDED_Y_VALUE
        diff = xs[:, None, :] - xs[None, :, :]
        dist = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))
        # q-quantile (linear interpolation, numpy semantics) of the upper
        # triangle restricted to real-real pairs
        iu = jnp.triu(jnp.ones((ell, ell), dtype=bool), k=1)
        pair_ok = iu & real[:, None] & real[None, :]
        vals = jnp.sort(jnp.where(pair_ok, dist, jnp.inf).reshape(-1))
        m = pair_ok.sum()
        h = jnp.maximum(m - 1, 0).astype(jnp.float32) * q_percentile
        lo = jnp.floor(h).astype(jnp.int32)
        hi = jnp.ceil(h).astype(jnp.int32)
        frac = h - lo.astype(jnp.float32)
        qv = vals[lo] * (1.0 - frac) + vals[hi] * frac
        margin = jnp.where(m > 0, qv, 0.0)

        def body(kept, inputs):
            clicked, d_col = inputs
            j = kept["j"]
            d = jnp.where(kept["mask"], d_col, jnp.inf)
            too_close = kept["any"] & (jnp.min(d) <= margin)
            keep = (clicked == 1) & ~too_close
            mask = kept["mask"].at[j].set(keep)
            return (
                {"mask": mask, "any": kept["any"] | keep, "j": j + 1},
                keep,
            )

        init = {"mask": jnp.zeros((ell,), dtype=bool),
                "any": jnp.asarray(False), "j": jnp.asarray(0)}
        _, keeps = jax.lax.scan(body, init, (cs, dist.T))
        return keeps

    keeps = jax.vmap(one_slate)(x, y, pos_clicks)
    return _finalize(pos_clicks * keeps, y)


def as_device_click_fn(click_model) -> Optional[Callable]:
    """Map a host click-model instance to a jittable
    ``(rng, y, x=None) -> clicks`` function, or None when the model has no
    vectorized equivalent. Functions that require document features set
    ``needs_x = True`` (callers then pass the ranked [B, L, F] features)."""
    from allrank_tpu.click_models.base import (
        ConditionedClickModel,
        FixedClickModel,
        MaxClicksModel,
        MultipleClickModel,
        OnlyRelevantClickModel,
        RandomClickModel,
    )
    from allrank_tpu.click_models.cascade_models import (
        BaseCascadeModel,
        DiverseClicksModel,
    )
    import numpy as np

    if isinstance(click_model, OnlyRelevantClickModel):
        thr = click_model.relevancy_threshold
        return lambda rng, y, x=None: only_relevant_clicks(rng, y, thr)
    if isinstance(click_model, FixedClickModel):
        pos = click_model.click_positions
        return lambda rng, y, x=None: fixed_clicks(rng, y, pos)
    if isinstance(click_model, DiverseClicksModel):
        inner = as_device_click_fn(click_model.inner_click_model)
        if inner is None:
            return None
        q = click_model.q_percentile

        def diverse_fn(rng, y, x=None):
            if x is None:
                raise ValueError(
                    "device DiverseClicksModel needs the ranked features"
                )
            return diverse_clicks(rng, y, x, inner, q)

        diverse_fn.needs_x = True
        return diverse_fn
    if isinstance(click_model, BaseCascadeModel):
        eta, thr = click_model.eta, click_model.threshold
        return lambda rng, y, x=None: base_cascade_clicks(rng, y, eta, thr)
    if isinstance(click_model, RandomClickModel):
        n = click_model.n_clicks
        return lambda rng, y, x=None: random_clicks(rng, y, n)
    if isinstance(click_model, MultipleClickModel):
        inners = [as_device_click_fn(m)
                  for m in click_model.inner_click_models]
        if any(f is None for f in inners):
            return None
        cum = np.asarray(click_model.cumulative, dtype=np.float32)

        def multi_fn(rng, y, x=None):
            return multiple_clicks(rng, y, inners, cum, x)

        multi_fn.needs_x = any(getattr(f, "needs_x", False) for f in inners)
        return multi_fn
    if isinstance(click_model, ConditionedClickModel):
        inners = [as_device_click_fn(m)
                  for m in click_model.inner_click_models]
        if any(f is None for f in inners):
            return None
        combiner = {np.all: jnp.all, np.any: jnp.any}.get(
            click_model.combiner
        )
        if combiner is None:
            return None  # arbitrary host callables stay host-side

        def cond_fn(rng, y, x=None):
            return conditioned_clicks(rng, y, inners, combiner, x)

        cond_fn.needs_x = any(getattr(f, "needs_x", False) for f in inners)
        return cond_fn
    if isinstance(click_model, MaxClicksModel):
        inner = as_device_click_fn(click_model.inner_click_model)
        if inner is None:
            return None
        n = click_model.max_clicks
        if n is None:
            return inner

        def fn(rng, y, x=None):
            clicks = inner(rng, y, x)
            pos = jnp.clip(clicks, 0, 1)
            within = jnp.cumsum(pos, axis=-1) <= n
            return _finalize(pos * within, y)

        fn.needs_x = getattr(inner, "needs_x", False)
        return fn
    return None
