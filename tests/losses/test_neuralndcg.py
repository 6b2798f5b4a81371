"""Limit-behavior tests carried from reference tests/losses/test_neuralndcg.py:
at temperature -> 0, NeuralNDCG must equal -NDCG for all four variants
{deterministic, stochastic} x {normal, transposed}."""

import math
from functools import partial

import jax
import numpy as np
from pytest import approx

from allrank_tpu.constants import PADDED_Y_VALUE
from allrank_tpu.losses import neuralNDCG, neuralNDCG_transposed
from allrank_tpu.metrics import ndcg

TEST_CASES = [
    {"stochastic": False, "transposed": False},
    {"stochastic": True, "transposed": False},
    {"stochastic": False, "transposed": True},
    {"stochastic": True, "transposed": True},
]


def neuralNDCG_wrap(y_pred, y_true, temperature=1e-4, powered_relevancies=True,
                    k=None, stochastic=False, n_samples=1024, beta=0.001,
                    transposed=False):
    fun = neuralNDCG_transposed if transposed else neuralNDCG
    rng = jax.random.PRNGKey(0) if stochastic else None
    return float(
        fun(np.array([y_pred]), np.array([y_true]), temperature=temperature,
            powered_relevancies=powered_relevancies, k=k, stochastic=stochastic,
            n_samples=n_samples, beta=beta, rng=rng)
    )


def ndcg_wrap(y_pred, y_true, ats=None):
    return float(np.mean(np.asarray(ndcg(np.array([y_pred]), np.array([y_true]), ats=ats))))


def run_all(check):
    for tc in TEST_CASES:
        check(partial(neuralNDCG_wrap, **tc))


def test_neuralndcg_simple():
    def check(fun):
        y_pred = [0.5, 0.2]
        y_true = [1.0, 0.0]
        result = fun(y_pred, y_true)
        assert math.isfinite(result)
        assert -result == approx(ndcg_wrap(y_pred, y_true))
    run_all(check)


def test_neuralndcg_longer():
    def check(fun):
        y_pred = [0.5, 0.2, 0.1, 0.4, 1.0, -1.0, 0.63]
        y_true = [1.0, 2.0, 2.0, 4.0, 1.0, 4.0, 3.0]
        result = fun(y_pred, y_true)
        assert math.isfinite(result)
        assert -result == approx(ndcg_wrap(y_pred, y_true))
    run_all(check)


def test_neuralndcg_stable_for_very_small_prediction():
    def check(fun):
        y_pred = [0.5, -1e30]
        y_true = [1.0, 0.0]
        result = fun(y_pred, y_true)
        assert math.isfinite(result)
        assert -result == approx(ndcg_wrap(y_pred, y_true))
    run_all(check)


def test_neuralndcg_ignores_padded_value():
    def check(fun):
        y_pred = [0.5, 0.2, 0.1, 0.4, 1.0, -1.0, 0.63, 1.0, 0.5, 0.3]
        y_true = [1.0, 2.0, 2.0, 4.0, 1.0, 4.0, 3.0,
                  PADDED_Y_VALUE, PADDED_Y_VALUE, PADDED_Y_VALUE]
        result = fun(y_pred, y_true, temperature=0.001)
        assert math.isfinite(result)
        assert -result == approx(ndcg_wrap(y_pred, y_true))
    run_all(check)


def test_neuralndcg_at_3():
    def check(fun):
        y_pred = [0.5, 0.2, 0.1, 0.4, 1.0, -1.0, 0.63]
        y_true = [1.0, 2.0, 2.0, 4.0, 1.0, 4.0, 3.0]
        result = fun(y_pred, y_true, k=3)
        assert math.isfinite(result)
        assert -result == approx(ndcg_wrap(y_pred, y_true, ats=[3]))
    run_all(check)


def test_neuralndcg_all_zero_labels_returns_zero():
    result = float(neuralNDCG(np.array([[0.5, 0.2]]), np.array([[0.0, 0.0]])))
    assert result == 0.0
