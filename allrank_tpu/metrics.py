"""Mask-aware ranking metrics, vectorized over slates and cutoffs.

Behavioral parity with the reference metrics (reference:
allrank/models/metrics.py:7-113), re-expressed as pure jittable JAX:

  * ``ndcg``  — NDCG@k with the IDCG==0 -> filler_value=1.0 convention
                (the XGBoost/LightGBM convention, reference metrics.py:23-24).
  * ``dcg``   — DCG@k via a single descending sort + cumulative sum, with all
                cutoffs read from the same cumsum (vectorized over ``ats``).
  * ``mrr``   — reciprocal rank of the first relevant item. Replicates the
                reference's batch-global zero-relevance handling
                (reference metrics.py:108-109): the zeroing mask is a scalar
                over the whole batch, not per-slate.

All functions take [B, L] arrays and return [B, len(ats)] arrays. Sorting is
XLA's native sort (TPU-efficient); padded items are pushed to the end by a
-inf fill on predictions. ``ats`` must be a static Python sequence (jit
recompiles per distinct cutoff set, which is the desired behavior).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from allrank_tpu.constants import PADDED_Y_VALUE


def position_discounts(slate_length: int) -> np.ndarray:
    """1 / log2(rank + 2) discount table, precomputed on host in float64 for
    exactness (TPU fp32 transcendentals are only ~1e-5 accurate) and embedded
    as a compile-time constant."""
    return (1.0 / np.log2(np.arange(slate_length, dtype=np.float64) + 2.0)).astype(
        np.float32
    )


def pow2_gain(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.power(2.0, x) - 1.0


def identity_gain(x: jnp.ndarray) -> jnp.ndarray:
    return x


def _true_sorted_by_preds(
    y_pred: jnp.ndarray, y_true: jnp.ndarray, padding_indicator: int
) -> jnp.ndarray:
    """Sort true labels by descending prediction; padded docs sort last with gain 0."""
    mask = y_true == padding_indicator
    y_pred = jnp.where(mask, -jnp.inf, y_pred)
    y_true = jnp.where(mask, 0.0, y_true)
    # variadic sort carries the labels through the prediction permutation in
    # one pass (stable ascending on -y_pred == stable descending argsort)
    _, sorted_true = jax.lax.sort(
        (-y_pred, y_true), dimension=-1, num_keys=1, is_stable=True
    )
    return sorted_true


def dcg(
    y_pred: jnp.ndarray,
    y_true: jnp.ndarray,
    ats: Optional[Sequence[int]] = None,
    gain_function: Callable[[jnp.ndarray], jnp.ndarray] = pow2_gain,
    padding_indicator: int = PADDED_Y_VALUE,
) -> jnp.ndarray:
    """DCG at each cutoff in ``ats`` (or at full length if None). Returns [B, len(ats)]."""
    y_pred = jnp.asarray(y_pred, dtype=jnp.float32)
    y_true = jnp.asarray(y_true, dtype=jnp.float32)
    slate_length = y_true.shape[-1]

    if ats is None:
        ats = [slate_length]
    ats = [min(int(at), slate_length) for at in ats]

    true_sorted = _true_sorted_by_preds(y_pred, y_true, padding_indicator)

    discounts = jnp.asarray(position_discounts(slate_length))
    cum_dcg = jnp.cumsum(gain_function(true_sorted) * discounts, axis=-1)

    at_idx = jnp.asarray([at - 1 for at in ats], dtype=jnp.int32)
    return cum_dcg[:, at_idx]


def ndcg(
    y_pred: jnp.ndarray,
    y_true: jnp.ndarray,
    ats: Optional[Sequence[int]] = None,
    gain_function: Callable[[jnp.ndarray], jnp.ndarray] = pow2_gain,
    padding_indicator: int = PADDED_Y_VALUE,
    filler_value: float = 1.0,
) -> jnp.ndarray:
    """NDCG at each cutoff; slates with IDCG == 0 score ``filler_value``."""
    idcg = dcg(y_true, y_true, ats, gain_function, padding_indicator)
    raw = dcg(y_pred, y_true, ats, gain_function, padding_indicator)
    safe_idcg = jnp.where(idcg == 0.0, 1.0, idcg)
    return jnp.where(idcg == 0.0, filler_value, raw / safe_idcg)


def mrr(
    y_pred: jnp.ndarray,
    y_true: jnp.ndarray,
    ats: Optional[Sequence[int]] = None,
    padding_indicator: int = PADDED_Y_VALUE,
    strict: bool = False,
) -> jnp.ndarray:
    """Reciprocal rank of the first maximal true label under the predicted order.

    Note: by default mirrors the reference quirk (reference metrics.py:108-109)
    where the "no relevant docs" zeroing is decided by the *batch-global* sum
    of maximal label values, not per-slate — so it is only correct when the
    whole batch has no relevant docs. ``strict=True`` zeroes per slate.
    """
    y_pred = jnp.asarray(y_pred, dtype=jnp.float32)
    y_true = jnp.asarray(y_true, dtype=jnp.float32)
    slate_length = y_true.shape[-1]

    if ats is None:
        ats = [slate_length]

    true_sorted = _true_sorted_by_preds(y_pred, y_true, padding_indicator)

    values = jnp.max(true_sorted, axis=-1)
    first_best = jnp.argmax(true_sorted, axis=-1).astype(jnp.float32)

    ats_arr = jnp.asarray(list(ats), dtype=jnp.float32)[None, :]
    positions = first_best[:, None]
    within_at = (positions < ats_arr).astype(jnp.float32)

    result = 1.0 / (positions + 1.0)
    if strict:
        result = jnp.where(values[:, None] == 0.0, 0.0, result)
        return result * within_at
    batch_has_no_relevant = jnp.sum(values) == 0.0
    result = jnp.where(batch_has_no_relevant, 0.0, result)
    return result * within_at


def map_(
    y_pred: jnp.ndarray,
    y_true: jnp.ndarray,
    ats: Optional[Sequence[int]] = None,
    padding_indicator: int = PADDED_Y_VALUE,
    relevancy_threshold: float = 1.0,
    filler_value: float = 1.0,
) -> jnp.ndarray:
    """Mean Average Precision at each cutoff (beyond the reference's zoo).

    Graded labels binarize at ``relevancy_threshold`` (relevant iff
    ``y_true >= threshold``; padded docs are never relevant). AP@k divides
    by ``min(R, k)`` where R is the slate's relevant count, so a slate with
    every top-k position relevant scores 1.0. Slates with no relevant docs
    score ``filler_value`` — the same blank-query convention as ``ndcg``.
    """
    y_pred = jnp.asarray(y_pred, dtype=jnp.float32)
    y_true = jnp.asarray(y_true, dtype=jnp.float32)
    slate_length = y_true.shape[-1]
    if ats is None:
        ats = [slate_length]
    ats = [min(int(at), slate_length) for at in ats]

    true_sorted = _true_sorted_by_preds(y_pred, y_true, padding_indicator)
    rel = (true_sorted >= relevancy_threshold).astype(jnp.float32)
    cum_rel = jnp.cumsum(rel, axis=-1)
    prec_at_i = cum_rel / (jnp.arange(slate_length, dtype=jnp.float32) + 1.0)
    ap_cum = jnp.cumsum(rel * prec_at_i, axis=-1)

    at_idx = jnp.asarray([at - 1 for at in ats], dtype=jnp.int32)
    total_rel = cum_rel[:, -1:]
    denom = jnp.minimum(total_rel, jnp.asarray(ats, dtype=jnp.float32)[None, :])
    ap = ap_cum[:, at_idx] / jnp.maximum(denom, 1.0)
    return jnp.where(total_rel == 0.0, filler_value, ap)


def err(
    y_pred: jnp.ndarray,
    y_true: jnp.ndarray,
    ats: Optional[Sequence[int]] = None,
    padding_indicator: int = PADDED_Y_VALUE,
    max_relevance: float = 4.0,
) -> jnp.ndarray:
    """Expected Reciprocal Rank (Chapelle et al., CIKM 2009) at each cutoff
    (beyond the reference's zoo). Per-doc stop probability
    ``R_i = (2^y_i - 1) / 2^max_relevance`` (WEB30K grades: max 4); padded
    docs stop with probability 0.
    """
    y_pred = jnp.asarray(y_pred, dtype=jnp.float32)
    y_true = jnp.asarray(y_true, dtype=jnp.float32)
    slate_length = y_true.shape[-1]
    if ats is None:
        ats = [slate_length]
    ats = [min(int(at), slate_length) for at in ats]

    true_sorted = _true_sorted_by_preds(y_pred, y_true, padding_indicator)
    stop = (jnp.power(2.0, true_sorted) - 1.0) / (2.0 ** max_relevance)
    # exclusive prefix product of continue-probabilities: P(reach rank i)
    reach = jnp.cumprod(
        jnp.concatenate(
            [jnp.ones_like(stop[:, :1]), (1.0 - stop)[:, :-1]], axis=-1
        ),
        axis=-1,
    )
    inv_rank = 1.0 / (jnp.arange(slate_length, dtype=jnp.float32) + 1.0)
    err_cum = jnp.cumsum(inv_rank * stop * reach, axis=-1)

    at_idx = jnp.asarray([at - 1 for at in ats], dtype=jnp.int32)
    return err_cum[:, at_idx]


METRICS = {
    "ndcg": ndcg,
    "dcg": dcg,
    "mrr": mrr,
    "map": map_,
    "err": err,
}


def get_metric(name: str) -> Callable:
    if name not in METRICS:
        raise ValueError(f"Unknown metric '{name}'. Available: {sorted(METRICS)}")
    return METRICS[name]
