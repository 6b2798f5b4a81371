"""Golden tests carried from reference tests/losses/test_ordinal.py,
test_pointwise_rmse.py (and bce coverage the reference lacks)."""

import math

import numpy as np
from pytest import approx

from allrank_tpu.constants import PADDED_Y_VALUE
from allrank_tpu.losses import bce, ordinal, pointwise_rmse, with_ordinals


def xe(true, pred):
    return -true * math.log(pred) - (1 - true) * math.log(1 - pred)


def ordinal_wrap(y_pred, y_true, n=2):
    return float(ordinal(np.array([y_pred]), np.array([y_true]), n=n))


class TestOrdinal:
    def test_ds_transform(self):
        result = np.asarray(with_ordinals(np.array([[2.0, 1.0, 0.0]]), 2))
        expected = [[[1.0, 1.0], [1.0, 0.0], [0.0, 0.0]]]
        assert result.tolist() == expected

    def test_ds_transform_padded(self):
        result = np.asarray(with_ordinals(np.array([[1.0, PADDED_Y_VALUE]]), 2))
        assert result.tolist() == [[[1.0, 0.0], [-1.0, -1.0]]]

    def test_single_doc(self):
        result = ordinal_wrap([[0.8, 0.6]], [1.0])
        expected = np.mean([xe(1, 0.8) + xe(0, 0.6)])
        assert result == approx(expected)

    def test_simple(self):
        result = ordinal_wrap([[0.8, 0.7], [0.4, 0.3], [0.2, 0.1]], [2.0, 1.0, 0.0])
        expected = np.mean(
            [xe(1, 0.8) + xe(1, 0.7), xe(1, 0.4) + xe(0, 0.3), xe(0, 0.2) + xe(0, 0.1)]
        )
        assert result == approx(expected)

    def test_single_doc_padded(self):
        result = ordinal_wrap([[0.8, 0.6], [0.2, 0.1]], [1.0, PADDED_Y_VALUE])
        expected = np.mean([xe(1, 0.8) + xe(0, 0.6)])
        assert result == approx(expected)


class TestPointwiseRmse:
    def test_simple(self):
        result = float(pointwise_rmse(np.array([[0.5, 0.2]]), np.array([[1.0, 0.0]]), 1))
        assert result == approx(math.sqrt(np.mean([0.5**2, 0.2**2])))

    def test_simple_padded(self):
        result = float(
            pointwise_rmse(
                np.array([[0.5, 0.2, 0.5]]), np.array([[1.0, 0.0, PADDED_Y_VALUE]]), 1
            )
        )
        assert result == approx(math.sqrt(np.mean([0.5**2, 0.2**2])))

    def test_multiple_levels(self):
        result = float(
            pointwise_rmse(
                np.array([[0.5, 0.2, 0.7, 0.8]]), np.array([[1.0, 0.0, 2.0, 3.0]]), 3
            )
        )
        assert result == approx(math.sqrt(np.mean([0.5**2, 0.6**2, 0.1**2, 0.6**2])))


class TestBce:
    def test_simple(self):
        result = float(bce(np.array([[0.8, 0.2]]), np.array([[1.0, 0.0]])))
        expected = xe(1, 0.8) + xe(0, 0.2)  # sum over docs / 1 slate
        assert result == approx(expected)

    def test_padding_invariance(self):
        a = float(bce(np.array([[0.8, 0.2]]), np.array([[1.0, 0.0]])))
        b = float(
            bce(np.array([[0.8, 0.2, 0.5]]), np.array([[1.0, 0.0, PADDED_Y_VALUE]]))
        )
        assert a == approx(b)
