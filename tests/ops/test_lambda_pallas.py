"""Fused lambdaLoss pairwise kernel vs the XLA path — interpreter mode.

The XLA implementation in losses/lambdaloss.py is itself verified against
the reference to <=7e-9 (tools/parity_check.py); the kernel must match it
in value AND gradient for every weighing scheme, reduction, log base, and
k truncation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from allrank_tpu.losses.lambdaloss import WEIGHING_SCHEMES, lambdaLoss
from allrank_tpu.ops.lambda_pallas import fused_lambda_pairs


def _batch(B=6, L=40, seed=0):
    rng = np.random.RandomState(seed)
    y_pred = jnp.asarray(rng.randn(B, L).astype(np.float32))
    y_true = rng.randint(0, 5, size=(B, L)).astype(np.float32)
    y_true[1, L // 2:] = -1.0   # padded tail
    y_true[2, :] = -1.0         # fully padded slate
    return y_pred, jnp.asarray(y_true)


def _fused_loss(y_pred, y_true, scheme, k=None, reduction="sum",
                reduction_log="binary", sigma=1.0, mu=10.0,
                slate_mask=None):
    """Rebuild lambdaLoss's pre-kernel XLA prep, then call the kernel."""
    from allrank_tpu.constants import DEFAULT_EPS

    mask = y_true == -1.0
    L = y_true.shape[1]
    y_pred_f = jnp.where(mask, -jnp.inf, y_pred)
    y_true_f = jnp.where(mask, -jnp.inf, y_true)
    order = jnp.argsort(y_pred_f, axis=-1, descending=True, stable=True)
    yps = jnp.take_along_axis(y_pred_f, order, axis=-1)
    tsp = jnp.take_along_axis(y_true_f, order, axis=-1)
    y_true_sorted = jnp.sort(y_true_f, axis=-1, descending=True)
    pred_valid = jnp.isfinite(tsp)
    tsp = jnp.maximum(tsp, 0.0)
    y_true_sorted = jnp.maximum(y_true_sorted, 0.0)
    k_eff = L if k is None else min(k, L)
    D = jnp.asarray(np.log2(np.arange(L) + 2.0).astype(np.float32))
    max_dcgs = jnp.maximum(
        jnp.sum(((2.0**y_true_sorted - 1.0) / D)[:, :k_eff], axis=-1),
        DEFAULT_EPS,
    )
    G = (2.0**tsp - 1.0) / max_dcgs[:, None]
    valid = pred_valid
    if slate_mask is not None:
        valid = valid & jnp.asarray(slate_mask, bool)[:, None]
    loss_sums, counts = fused_lambda_pairs(
        jnp.where(pred_valid, yps, 0.0), tsp, G, valid.astype(jnp.float32),
        scheme=scheme, k_eff=k_eff, sigma=sigma, mu=mu,
        log_base=reduction_log, eps=DEFAULT_EPS,
    )
    total = jnp.sum(loss_sums)
    if reduction == "sum":
        return -total
    return -total / jnp.maximum(jnp.sum(counts), 1.0)


ALL_SCHEMES = [None] + list(WEIGHING_SCHEMES)


@pytest.mark.parametrize("scheme", ALL_SCHEMES)
def test_value_and_grad_match_xla(scheme):
    y_pred, y_true = _batch()
    kw = dict(weighing_scheme=scheme, mu=10.0, sigma=1.0)

    ref_v, ref_g = jax.value_and_grad(
        lambda p: lambdaLoss(p, y_true, **kw)
    )(y_pred)
    with pltpu.force_tpu_interpret_mode():
        got_v, got_g = jax.value_and_grad(
            lambda p: _fused_loss(p, y_true, scheme)
        )(y_pred)
    np.testing.assert_allclose(float(got_v), float(ref_v), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("reduction,log_base", [
    ("mean", "binary"), ("sum", "natural"),
])
def test_reductions_and_log_bases(reduction, log_base):
    y_pred, y_true = _batch(seed=3)
    kw = dict(weighing_scheme="ndcgLoss2PP_scheme", mu=10.0, sigma=1.0,
              reduction=reduction, reduction_log=log_base)
    ref_v, ref_g = jax.value_and_grad(
        lambda p: lambdaLoss(p, y_true, **kw)
    )(y_pred)
    with pltpu.force_tpu_interpret_mode():
        got_v, got_g = jax.value_and_grad(
            lambda p: _fused_loss(p, y_true, "ndcgLoss2PP_scheme",
                                  reduction=reduction,
                                  reduction_log=log_base)
        )(y_pred)
    np.testing.assert_allclose(float(got_v), float(ref_v), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g),
                               rtol=1e-4, atol=1e-6)


def test_topk_truncation_and_slate_mask():
    y_pred, y_true = _batch(seed=5)
    sm = jnp.asarray([True, True, True, False, True, True])
    kw = dict(weighing_scheme="lambdaRank_scheme", k=10, slate_mask=sm)
    ref_v, ref_g = jax.value_and_grad(
        lambda p: lambdaLoss(p, y_true, **kw)
    )(y_pred)
    with pltpu.force_tpu_interpret_mode():
        got_v, got_g = jax.value_and_grad(
            lambda p: _fused_loss(p, y_true, "lambdaRank_scheme", k=10,
                                  slate_mask=sm)
        )(y_pred)
    np.testing.assert_allclose(float(got_v), float(ref_v), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g),
                               rtol=1e-4, atol=1e-6)
