"""Golden tests carried from reference tests/losses/test_ranknet.py;
expectations recomputed against a numpy BCE-with-logits."""

import math

import numpy as np
from pytest import approx

from allrank_tpu.constants import PADDED_Y_VALUE
from allrank_tpu.losses import rankNet, rankNet_weightByGTDiff, rankNet_weightByGTDiff_pow


def bce_logits(x, z, weight=None):
    x = np.asarray(x, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    losses = np.maximum(x, 0) - x * z + np.log1p(np.exp(-np.abs(x)))
    if weight is not None:
        losses = losses * np.asarray(weight, dtype=np.float64)
    return float(np.mean(losses))


def rankNet_wrap(y_pred, y_true):
    return float(rankNet(np.array([y_pred]), np.array([y_true])))


def test_ranknet_onepair():
    assert rankNet_wrap([0.5, 0.2], [1.0, 0.0]) == approx(bce_logits([0.3], [1.0]))


def test_ranknet_onepair_minus():
    assert rankNet_wrap([0.2, 0.5], [1.0, 0.0]) == approx(bce_logits([-0.3], [1.0]))


def test_ranknet_two_pairs():
    assert rankNet_wrap([0.5, 0.2, 0.1], [1.0, 0.0, 0.0]) == approx(
        bce_logits([0.3, 0.4], [1.0, 1.0])
    )


def test_ranknet_pair_reversed():
    assert rankNet_wrap([0.2, 0.5], [0.0, 1.0]) == approx(bce_logits([0.3], [1.0]))


def test_ranknet_pair_multirelevancy():
    assert rankNet_wrap([0.2, 0.5], [0.0, 2.0]) == approx(bce_logits([0.3], [1.0]))


def test_ranknet_onepair_masked():
    result = rankNet_wrap([0.5, 0.2, 0.66], [1.0, 0.0, PADDED_Y_VALUE])
    assert math.isfinite(result)
    assert result == approx(bce_logits([0.3], [1.0]))


def test_ranknet_two_pairs_weighted():
    result = float(
        rankNet_weightByGTDiff(np.array([[0.5, 0.2, 0.1]]), np.array([[2.0, 1.0, 0.0]]))
    )
    expected = bce_logits([0.3, 0.4, 0.1], [1.0, 1.0, 1.0], weight=[1.0, 2.0, 1.0])
    assert result == approx(expected)


def test_ranknet_two_pairs_weighted_pow():
    result = float(
        rankNet_weightByGTDiff_pow(
            np.array([[0.5, 0.2, 0.1]]), np.array([[2.0, 1.0, 0.0]])
        )
    )
    expected = bce_logits([0.3, 0.4, 0.1], [1.0, 1.0, 1.0], weight=[3.0, 4.0, 1.0])
    assert result == approx(expected)


def test_ranknet_padding_invariance():
    a = rankNet_wrap([0.5, 0.2, 0.1], [2.0, 1.0, 0.0])
    b = rankNet_wrap([0.5, 0.2, 0.1, 0.9], [2.0, 1.0, 0.0, PADDED_Y_VALUE])
    assert a == approx(b)
