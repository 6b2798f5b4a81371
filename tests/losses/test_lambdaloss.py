"""Golden tests carried from reference tests/losses/test_lambdaloss.py."""

import math

import numpy as np
from pytest import approx

from allrank_tpu.constants import PADDED_Y_VALUE
from allrank_tpu.losses import lambdaLoss


def loss_wrap(y_pred, y_true, **kwargs):
    return float(lambdaLoss(np.array([y_pred]), np.array([y_true]), **kwargs))


def test_ndcgloss1_ignores_padded():
    result = loss_wrap([0.5, 0.3, 0.5], [0.5, 0.3, 0.5],
                       weighing_scheme="ndcgLoss1_scheme", reduction_log="binary")
    result_pad = loss_wrap([0.5, 0.3, 0.5, 1.0], [0.5, 0.3, 0.5, PADDED_Y_VALUE],
                           weighing_scheme="ndcgLoss1_scheme", reduction_log="binary")
    expected = 2.9272110462
    assert math.isfinite(result) and math.isfinite(result_pad)
    assert result == approx(result_pad)
    assert result == approx(expected)


def test_ndcgloss2pp_ignores_padded():
    result = loss_wrap([0.5, 0.3, 0.5], [0.5, 0.3, 0.5],
                       weighing_scheme="ndcgLoss2PP_scheme", reduction_log="binary")
    result_pad = loss_wrap([0.5, 0.3, 0.5, 1.0], [0.5, 0.3, 0.5, PADDED_Y_VALUE],
                           weighing_scheme="ndcgLoss2PP_scheme", reduction_log="binary")
    expected = 1.1244146823
    assert math.isfinite(result) and math.isfinite(result_pad)
    assert result == approx(result_pad)
    assert result == approx(expected)


def test_ranknet_scheme_ignores_padded():
    result = loss_wrap([0.5, 0.3, 0.5], [0.5, 0.3, 0.5],
                       weighing_scheme="rankNet_scheme", reduction_log="natural")
    result_pad = loss_wrap([0.5, 0.3, 0.5, 1.0], [0.5, 0.3, 0.5, PADDED_Y_VALUE],
                           weighing_scheme="rankNet_scheme", reduction_log="natural")
    expected = 1.1962778568
    assert math.isfinite(result) and math.isfinite(result_pad)
    assert result == approx(result_pad)
    assert result == approx(expected)


def test_lambdarank_scheme_with_k():
    # k-truncation and mean reduction paths stay finite and padding-invariant
    a = loss_wrap([0.5, 0.3, 0.2, 0.9], [2.0, 1.0, 0.0, 3.0],
                  weighing_scheme="lambdaRank_scheme", k=2, reduction="mean")
    b = loss_wrap([0.5, 0.3, 0.2, 0.9, 0.7], [2.0, 1.0, 0.0, 3.0, PADDED_Y_VALUE],
                  weighing_scheme="lambdaRank_scheme", k=2, reduction="mean")
    assert math.isfinite(a)
    assert a == approx(b)


def test_no_scheme_defaults_to_unit_weights():
    a = loss_wrap([0.5, 0.3], [1.0, 0.0])
    assert math.isfinite(a)
