"""NeuralNDCG losses (reference: allrank/models/losses/neuralNDCG.py:10-136;
paper: arXiv 2102.07831).

Differentiable NDCG via the NeuralSort relaxation: an approximate permutation
matrix soft-sorts the gains (or, in the transposed variant, redistributes the
discounts), Sinkhorn-scaled to doubly stochastic. All shapes static; the
stochastic variant takes an explicit ``rng`` for its Gumbel perturbations.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from allrank_tpu.constants import DEFAULT_EPS, PADDED_Y_VALUE
from allrank_tpu.losses.common import as_f32, padding_mask
from allrank_tpu.metrics import dcg, identity_gain, position_discounts, pow2_gain
from allrank_tpu.ops.neuralsort_pallas import (
    soft_sort_available,
    soft_sort_contract,
)
from allrank_tpu.ops.soft_sort import (
    batch_shard_hint,
    deterministic_neural_sort,
    perturbed_scores,
    sequence_parallel_mesh,
    sinkhorn_scaling,
    soft_sort_contract_sp,
    stochastic_neural_sort,
)


def _p_hat(y_pred, mask, temperature, stochastic, n_samples, beta, log_scores, rng):
    if stochastic:
        if rng is None:
            raise ValueError("stochastic NeuralNDCG requires an rng key")
        return stochastic_neural_sort(
            y_pred, n_samples=n_samples, tau=temperature, mask=mask,
            rng=rng, beta=beta, log_scores=log_scores,
        )
    return deterministic_neural_sort(y_pred, tau=temperature, mask=mask)[None, :, :, :]


def _sinkhorn_over_samples(p_hat, mask, tol=1e-6, max_iter=50):
    s, b, L, _ = p_hat.shape
    flat = batch_shard_hint(p_hat.reshape(s * b, L, L))
    flat = sinkhorn_scaling(
        flat, jnp.tile(mask, (s, 1)), tol=tol, max_iter=max_iter
    )
    return flat.reshape(s, b, L, L)


def _flat_scores(y_pred, mask, stochastic, n_samples, beta, log_scores, rng):
    """Scores/mask flattened sample-major for the sequence-parallel path:
    ([S*B, L], [S*B, L], S)."""
    if stochastic:
        if rng is None:
            raise ValueError("stochastic NeuralNDCG requires an rng key")
        scores = perturbed_scores(y_pred, n_samples, rng, beta, log_scores)
        return scores, jnp.tile(mask, (n_samples, 1)), n_samples
    return y_pred, mask, 1


def neuralNDCG(
    y_pred: jnp.ndarray,
    y_true: jnp.ndarray,
    padded_value_indicator: int = PADDED_Y_VALUE,
    temperature: float = 1.0,
    powered_relevancies: bool = True,
    k: Optional[int] = None,
    stochastic: bool = False,
    n_samples: int = 32,
    beta: float = 0.1,
    log_scores: bool = True,
    rng: Optional[jax.Array] = None,
    slate_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """-mean NeuralNDCG@k: soft-sorted discounted gains over IDCG.

    Slates with IDCG == 0 (and batch-padding slates, whose labels are all
    padded) are excluded from the mean, as in the reference.
    """
    y_pred, y_true = as_f32(y_pred, y_true)
    slate_length = y_true.shape[1]
    k_eff = slate_length if k is None else min(int(k), slate_length)

    mask = padding_mask(y_true, padded_value_indicator)

    y_true_masked = jnp.where(mask, 0.0, y_true)
    gain_fn = pow2_gain if powered_relevancies else identity_gain
    gains = gain_fn(y_true_masked)

    sp = sequence_parallel_mesh(slate_length)
    if sp is not None:
        # slate-axis sharded path: P_hat row blocks live per device and are
        # contracted with the gains in place — no [L, L] replication
        mesh, axis = sp
        scores, mask_t, s_dim = _flat_scores(
            y_pred, mask, stochastic, n_samples, beta, log_scores, rng
        )
        gains_t = jnp.tile(gains, (s_dim, 1))
        ground_truth = soft_sort_contract_sp(
            scores, mask_t, gains_t, temperature, mesh, axis
        ).reshape(s_dim, -1, slate_length)
    else:
        scores, mask_t, s_dim = _flat_scores(
            y_pred, mask, stochastic, n_samples, beta, log_scores, rng
        )
        if soft_sort_available(slate_length, scores.shape[0]):
            # fully-fused VMEM chain (ops/neuralsort_pallas.py): same math,
            # no [L, L] tensor ever reaches HBM
            gains_t = gains if s_dim == 1 else jnp.tile(gains, (s_dim, 1))
            ground_truth = soft_sort_contract(
                scores, mask_t, gains_t, tau=temperature
            ).reshape(s_dim, -1, slate_length)
        else:
            p_hat = _p_hat(y_pred, mask, temperature, stochastic, n_samples,
                           beta, log_scores, rng)
            p_hat = _sinkhorn_over_samples(p_hat, mask)
            pair_pad = mask[:, :, None] | mask[:, None, :]
            p_hat = jnp.where(pair_pad[None, :, :, :], 0.0, p_hat)

            # [S, B, L]: soft-sorted gains
            ground_truth = jnp.einsum("sbij,bj->sbi", p_hat, gains)
    discounts = jnp.asarray(position_discounts(slate_length))
    discounted_gains = ground_truth * discounts

    idcg = dcg(y_true, y_true, ats=[k_eff], gain_function=gain_fn)[:, 0]  # [B]
    ndcg_val = jnp.sum(discounted_gains[:, :, :k_eff], axis=-1) / (idcg + DEFAULT_EPS)

    idcg_valid = idcg != 0.0
    if slate_mask is not None:
        idcg_valid = idcg_valid & jnp.asarray(slate_mask, dtype=bool)
    valid_f = idcg_valid.astype(jnp.float32)
    ndcg_val = ndcg_val * valid_f[None, :]

    n_samples_dim = ndcg_val.shape[0]
    denom = jnp.sum(valid_f) * n_samples_dim
    mean_ndcg = jnp.where(denom == 0.0, 0.0, jnp.sum(ndcg_val) / jnp.maximum(denom, 1.0))
    return -mean_ndcg


def neuralNDCG_transposed(
    y_pred: jnp.ndarray,
    y_true: jnp.ndarray,
    padded_value_indicator: int = PADDED_Y_VALUE,
    temperature: float = 1.0,
    powered_relevancies: bool = True,
    k: Optional[int] = None,
    stochastic: bool = False,
    n_samples: int = 32,
    beta: float = 0.1,
    log_scores: bool = True,
    max_iter: int = 50,
    tol: float = 1e-6,
    rng: Optional[jax.Array] = None,
    slate_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Transposed NeuralNDCG: P_hat^T redistributes the truncated discount
    vector over original positions ("expected discounts")."""
    y_pred, y_true = as_f32(y_pred, y_true)
    slate_length = y_true.shape[1]
    k_eff = slate_length if k is None else min(int(k), slate_length)

    mask = padding_mask(y_true, padded_value_indicator)

    discounts = jnp.asarray(position_discounts(slate_length))
    discounts = jnp.where(jnp.arange(slate_length) >= k_eff, 0.0, discounts)

    sp = sequence_parallel_mesh(slate_length)
    if sp is not None:
        mesh, axis = sp
        scores, mask_t, s_dim = _flat_scores(
            y_pred, mask, stochastic, n_samples, beta, log_scores, rng
        )
        disc_t = jnp.broadcast_to(discounts[None, :], scores.shape)
        # expected discount at original position j: Σ_i P_hat[i, j] discount_i
        expected_discounts = soft_sort_contract_sp(
            scores, mask_t, disc_t, temperature, mesh, axis,
            max_iter=max_iter, tol=tol, transpose=True,
        ).reshape(s_dim, -1, slate_length)
    else:
        scores, mask_t, s_dim = _flat_scores(
            y_pred, mask, stochastic, n_samples, beta, log_scores, rng
        )
        if soft_sort_available(slate_length, scores.shape[0]):
            disc_t = jnp.broadcast_to(discounts[None, :], scores.shape)
            expected_discounts = soft_sort_contract(
                scores, mask_t, disc_t, tau=temperature, max_iter=max_iter,
                transpose=True,
            ).reshape(s_dim, -1, slate_length)
        else:
            p_hat = _p_hat(y_pred, mask, temperature, stochastic, n_samples,
                           beta, log_scores, rng)
            p_hat = _sinkhorn_over_samples(p_hat, mask, tol=tol,
                                           max_iter=max_iter)

            # expected discount at original position j:
            # Σ_i P_hat[i, j] discount_i
            expected_discounts = jnp.einsum("sbij,i->sbj", p_hat, discounts)

    gain_fn = pow2_gain if powered_relevancies else identity_gain
    gains = gain_fn(jnp.where(mask, 0.0, y_true))
    discounted_gains = gains[None, :, :] * expected_discounts

    # NB: the reference uses the powered-gain IDCG in both branches
    # (neuralNDCG.py:121-127) — replicated here.
    idcg = dcg(y_true, y_true, ats=[k_eff], gain_function=pow2_gain)[:, 0]
    ndcg_val = jnp.sum(discounted_gains, axis=2) / (idcg + DEFAULT_EPS)

    idcg_valid = idcg != 0.0
    if slate_mask is not None:
        idcg_valid = idcg_valid & jnp.asarray(slate_mask, dtype=bool)
    valid_f = idcg_valid.astype(jnp.float32)
    ndcg_val = ndcg_val * valid_f[None, :]

    n_samples_dim = ndcg_val.shape[0]
    denom = jnp.sum(valid_f) * n_samples_dim
    mean_ndcg = jnp.where(denom == 0.0, 0.0, jnp.sum(ndcg_val) / jnp.maximum(denom, 1.0))
    return -mean_ndcg
