"""Golden test carried from reference tests/losses/test_listmle.py."""

import math

import jax
import numpy as np
from pytest import approx

from allrank_tpu.constants import PADDED_Y_VALUE
from allrank_tpu.losses import listMLE


def listmle_wrap(y_pred, y_true, rng=None):
    return float(listMLE(np.array([y_pred]), np.array([y_true]), rng=rng))


def test_listmle_ignores_padded_value():
    y_pred = [0.5, 0.3, 0.5]
    y_true = [1.0, 0.0, PADDED_Y_VALUE]
    result = listmle_wrap(y_pred, y_true)
    expected = 0.5981389284133911  # reference golden (tie-free -> permutation-invariant)
    assert math.isfinite(result)
    assert result == approx(expected)


def test_listmle_permutation_invariant_without_ties():
    y_pred = [0.5, 0.3, 0.5]
    y_true = [1.0, 0.0, PADDED_Y_VALUE]
    base = listmle_wrap(y_pred, y_true)
    shuffled = listmle_wrap(y_pred, y_true, rng=jax.random.PRNGKey(7))
    assert shuffled == approx(base)


def test_listmle_padding_invariance():
    a = listmle_wrap([0.5, 0.3], [2.0, 0.0])
    b = listmle_wrap([0.5, 0.3, 0.9, 0.1], [2.0, 0.0, PADDED_Y_VALUE, PADDED_Y_VALUE])
    assert a == approx(b)
