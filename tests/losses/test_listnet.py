"""Golden tests carried from reference tests/losses/test_listnet.py and
test_binary_listnet.py (values recomputed independently vs scipy.softmax)."""

import math

import numpy as np
from pytest import approx
from scipy.special import softmax

from allrank_tpu.constants import DEFAULT_EPS, PADDED_Y_VALUE
from allrank_tpu.losses import binary_listNet, listNet


def listNet_wrap(y_pred, y_true, eps=1e-10):
    return float(listNet(np.array([y_pred]), np.array([y_true]), eps))


def binary_listNet_wrap(y_pred, y_true, eps=1e-10):
    return float(binary_listNet(np.array([y_pred]), np.array([y_true]), eps))


def test_listnet_simple():
    y_pred = [0.5, 0.2]
    y_true = [1.0, 0.0]
    result = listNet_wrap(y_pred, y_true, eps=0.0)
    expected = -np.sum(softmax(y_true) * np.log(softmax(y_pred)))
    assert math.isfinite(result)
    assert result == approx(expected)


def test_listnet_stable_for_very_small_prediction():
    y_pred = [0.5, -1e30]
    y_true = [1.0, 0.0]
    result = listNet_wrap(y_pred, y_true)
    expected = -np.sum(softmax(y_true) * np.log(softmax(y_pred) + DEFAULT_EPS))
    assert math.isfinite(result)
    assert result == approx(expected)


def test_listnet_ignores_padded_value():
    y_pred = [0.5, 0.2, 0.5]
    y_true = [1.0, 0.0, PADDED_Y_VALUE]
    result = listNet_wrap(y_pred, y_true)
    expected = -np.sum(softmax(y_true[:2]) * np.log(softmax(y_pred[:2]) + DEFAULT_EPS))
    assert math.isfinite(result)
    assert result == approx(expected)


def test_listnet_slate_mask_excludes_dummy_slates():
    y_pred = np.array([[0.5, 0.2], [0.1, 0.9]])
    y_true = np.array([[1.0, 0.0], [PADDED_Y_VALUE, PADDED_Y_VALUE]])
    with_mask = float(listNet(y_pred, y_true, slate_mask=np.array([True, False])))
    alone = listNet_wrap([0.5, 0.2], [1.0, 0.0])
    assert with_mask == approx(alone)
    assert math.isfinite(with_mask)


def test_binary_listnet_simple():
    y_pred = [0.5, 0.2]
    y_true = [1.0, 0.0]
    result = binary_listNet_wrap(y_pred, y_true, eps=0.0)
    expected = -np.sum(np.array(y_true) * np.log(softmax(y_pred)))
    assert math.isfinite(result)
    assert result == approx(expected)


def test_binary_listnet_stable_for_very_small_prediction():
    y_pred = [0.5, -1e30]
    y_true = [1.0, 0.0]
    result = binary_listNet_wrap(y_pred, y_true)
    expected = -np.sum(np.array(y_true) * np.log(softmax(y_pred) + DEFAULT_EPS))
    assert math.isfinite(result)
    assert result == approx(expected, abs=1e-9)


def test_binary_listnet_ignores_padded_value():
    y_pred = [0.5, 0.2, 0.5]
    y_true = [1.0, 0.0, PADDED_Y_VALUE]
    result = binary_listNet_wrap(y_pred, y_true)
    expected = -np.sum(
        np.array(y_true[:2]) * np.log(softmax(y_pred[:2]) + DEFAULT_EPS)
    )
    assert math.isfinite(result)
    assert result == approx(expected)
