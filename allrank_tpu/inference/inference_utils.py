"""Rank slates with a trained model, fully on-device
(reference: allrank/inference/inference_utils.py:14-82).

The scoring + sort + gather for a whole batch of slates is ONE jitted XLA
program (model forward, -inf masking of padded docs, descending sort of
scores, gather of features and labels into ranked order); the host only
streams fixed-shape batches in and trims batch-padding dummy slates out.
As in the reference, the positional encoding sees ``indices == 1`` at
inference time — true ranks are unknown at serve time
(reference: inference_utils.py:48-50)."""

from __future__ import annotations

from typing import Dict, Generator, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from allrank_tpu.constants import PADDED_Y_VALUE
from allrank_tpu.data.batching import SlateBatcher
from allrank_tpu.models.factory import LTRModelDef, score


def make_rank_step(mdef: LTRModelDef):
    """Jitted (params, x, y) -> (X ranked, y ranked) for one padded batch."""

    def step(params, x, y):
        mask = y == PADDED_Y_VALUE
        indices = jnp.ones_like(y, dtype=jnp.int32)
        scores = score(params, mdef, x, mask, indices, train=False)
        scores = jnp.where(mask, -jnp.inf, scores)
        order = jnp.argsort(scores, axis=-1, descending=True, stable=True)
        x_ranked = jnp.take_along_axis(x, order[..., None], axis=1)
        y_ranked = jnp.take_along_axis(y, order, axis=1)
        return x_ranked, y_ranked

    return jax.jit(step)


def rank_slates_dataset(
    dataset, slate_length: int, params, mdef: LTRModelDef, batch_size: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Rank every slate of a dataset; returns (X [N, L, F], y [N, L]) in
    descending score order (padded docs last)."""
    batcher = SlateBatcher(dataset, slate_length, batch_size, shuffle=False)
    rank_step = make_rank_step(mdef)
    xs, ys = [], []
    for batch in batcher:
        x_ranked, y_ranked = rank_step(params, batch.x, batch.y)
        real = batch.slate_mask
        xs.append(np.asarray(x_ranked)[real])
        ys.append(np.asarray(y_ranked)[real])
    return np.concatenate(xs), np.concatenate(ys)


def rank_slates(
    datasets: Dict[str, Tuple[object, int]], params, mdef: LTRModelDef,
    batch_size: int,
) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """Rank each role's dataset. ``datasets`` maps role ->
    (dataset, effective_slate_length) as produced by ``load_dataset_role``."""
    return {
        role: rank_slates_dataset(ds, slate_len, params, mdef, batch_size)
        for role, (ds, slate_len) in datasets.items()
    }


def _host_dcg(labels_in_order: np.ndarray) -> float:
    """Host-side DCG of labels already in presentation order (padded docs
    have label PADDED_Y_VALUE -> gain 0, matching metrics.dcg semantics)."""
    labels = np.where(labels_in_order == PADDED_Y_VALUE, 0.0,
                      labels_in_order).astype(np.float64)
    gains = np.power(2.0, labels) - 1.0
    discounts = 1.0 / np.log2(np.arange(len(labels)) + 2.0)
    return float(np.sum(gains * discounts))


def _clicked_dcg(ordered_clicks: np.ndarray) -> float:
    """DCG of the clicked ordering: the presented order is the 'prediction',
    clicks are the labels (reference: inference_utils.py:63-71)."""
    return _host_dcg(np.asarray(ordered_clicks))


def _clicked_ndcg(ordered_clicks: np.ndarray) -> float:
    """NDCG of the clicked ordering, IDCG==0 -> 1.0 filler."""
    clicks = np.asarray(ordered_clicks)
    ideal = np.sort(np.where(clicks == PADDED_Y_VALUE, 0, clicks))[::-1]
    idcg = _host_dcg(ideal)
    if idcg == 0.0:
        return 1.0
    return _host_dcg(clicks) / idcg


def metrics_on_clicked_slates(
    clicked_slates: Tuple[Iterable[np.ndarray], Iterable[np.ndarray]],
) -> Generator[Dict[str, float], None, None]:
    """Per-slate stats of the click-through data
    (reference: inference_utils.py:73-82)."""
    Xs, ys = clicked_slates
    for _, y in zip(Xs, ys):
        y = np.asarray(y)
        yield {
            "slate_length": len(y),
            "no_of_clicks": int(np.sum(y > 0)),
            "dcg": _clicked_dcg(y),
            "ndcg": _clicked_ndcg(y),
        }


def make_rank_ids_step(mdef: LTRModelDef, click_fn=None):
    """Index-mode ranking: ONE jitted program gathering features from the
    HBM-resident store and returning only the ranked ROW-ID permutation
    (plus clicks when ``click_fn`` is given).

    The materializing steps above ship [B, L, F] features host->device and
    the ranked [B, L, F] back — at WEB30K-eval shapes that is ~4.5 GB each
    way per split. Here features cross once (the store upload) and each
    batch moves two [B, L] matrices; the host re-materializes ranked rows
    from its own flat feature array ("move indices, not features",
    ARCHITECTURE.md)."""

    def step(params, table, idx, y, rng):
        x = jnp.take(table, idx, axis=0)
        mask = y == PADDED_Y_VALUE
        indices = jnp.ones_like(y, dtype=jnp.int32)
        scores = score(params, mdef, x, mask, indices, train=False)
        scores = jnp.where(mask, -jnp.inf, scores)
        order = jnp.argsort(scores, axis=-1, descending=True, stable=True)
        ids_ranked = jnp.take_along_axis(idx, order, axis=1)
        y_ranked = jnp.take_along_axis(y, order, axis=1)
        if click_fn is None:
            return ids_ranked, y_ranked
        if getattr(click_fn, "needs_x", False):
            x_ranked = jnp.take_along_axis(x, order[..., None], axis=1)
            return ids_ranked, y_ranked, click_fn(rng, y_ranked, x_ranked)
        return ids_ranked, y_ranked, click_fn(rng, y_ranked)

    return jax.jit(step)


def _indexed_rank_loop(
    dataset, slate_length: int, params, mdef: LTRModelDef, batch_size: int,
    click_fn=None, seed: int = 42,
):
    """Shared driver for the index-mode paths: yields per-real-slate
    (X_ranked [L, F], y_or_clicks [L]) with padding conventions identical to
    the materializing steps."""
    from allrank_tpu.data.feature_store import DeviceFeatureStore

    # always fp32 (data.device_cache_dtype deliberately does NOT apply):
    # ranking computes in fp32 like the materializing path, and an fp32
    # table is what keeps index-mode outputs byte-identical to it
    store = DeviceFeatureStore(dataset)
    flat_X = dataset.flat_slate_buffers()[0]
    batcher = SlateBatcher(dataset, slate_length, batch_size, shuffle=False,
                           emit_row_indices=True)
    step = make_rank_ids_step(mdef, click_fn)
    rng = jax.random.PRNGKey(seed)
    n_feat = flat_X.shape[1]
    for i, batch in enumerate(batcher):
        out = step(params, store.table, batch.x, batch.y,
                   jax.random.fold_in(rng, i))
        ids_np = np.asarray(out[0])
        labels_np = np.asarray(out[-1])  # y_ranked, or clicks when click_fn
        for row in np.flatnonzero(batch.slate_mask):
            ids_row = ids_np[row]
            valid = ids_row != store.sentinel
            n = int(valid.sum())
            x_slate = np.zeros((slate_length, n_feat), dtype=np.float32)
            x_slate[:n] = flat_X[ids_row[:n]]
            yield x_slate, labels_np[row]


def rank_slates_dataset_indexed(
    dataset, slate_length: int, params, mdef: LTRModelDef, batch_size: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Index-mode twin of ``rank_slates_dataset`` (same outputs; features
    never round-trip the interconnect)."""
    xs, ys = [], []
    for x_slate, y_slate in _indexed_rank_loop(
        dataset, slate_length, params, mdef, batch_size
    ):
        xs.append(x_slate)
        ys.append(y_slate)
    return np.stack(xs), np.stack(ys)


def rank_and_click_dataset_indexed(
    dataset, slate_length: int, params, mdef: LTRModelDef, batch_size: int,
    click_fn, include_empty: bool = False, seed: int = 42,
):
    """Index-mode twin of ``rank_and_click_dataset``."""
    xs, clicks_out = [], []
    for x_slate, clicks in _indexed_rank_loop(
        dataset, slate_length, params, mdef, batch_size, click_fn, seed
    ):
        if include_empty or (clicks > 0).any():
            xs.append(x_slate)
            clicks_out.append(clicks)
    return xs, clicks_out


def make_rank_and_click_step(mdef: LTRModelDef, click_fn):
    """ONE jitted program: score -> sort -> gather -> simulate clicks.

    ``click_fn(rng, y_ranked) -> clicks`` is a vectorized click model
    (click_models/jax_models.py). The north-star pipeline: click-through
    regeneration never leaves the device."""

    def step(params, x, y, rng):
        mask = y == PADDED_Y_VALUE
        indices = jnp.ones_like(y, dtype=jnp.int32)
        scores = score(params, mdef, x, mask, indices, train=False)
        scores = jnp.where(mask, -jnp.inf, scores)
        order = jnp.argsort(scores, axis=-1, descending=True, stable=True)
        x_ranked = jnp.take_along_axis(x, order[..., None], axis=1)
        y_ranked = jnp.take_along_axis(y, order, axis=1)
        if getattr(click_fn, "needs_x", False):
            return x_ranked, click_fn(rng, y_ranked, x_ranked)
        return x_ranked, click_fn(rng, y_ranked)

    return jax.jit(step)


def rank_and_click_dataset(
    dataset, slate_length: int, params, mdef: LTRModelDef, batch_size: int,
    click_fn, include_empty: bool = False, seed: int = 42,
):
    """On-device rank + click over a whole dataset; returns (X slates,
    click masks) as lists of [L, F] / [L] arrays (host layout matches
    click_models.click_utils.click_on_slates)."""
    batcher = SlateBatcher(dataset, slate_length, batch_size, shuffle=False)
    step = make_rank_and_click_step(mdef, click_fn)
    rng = jax.random.PRNGKey(seed)
    xs, clicks_out = [], []
    for i, batch in enumerate(batcher):
        x_ranked, clicks = step(params, batch.x, batch.y,
                                jax.random.fold_in(rng, i))
        x_np, c_np = np.asarray(x_ranked), np.asarray(clicks)
        for row in np.flatnonzero(batch.slate_mask):
            if include_empty or (c_np[row] > 0).any():
                xs.append(x_np[row])
                clicks_out.append(c_np[row])
    return xs, clicks_out
