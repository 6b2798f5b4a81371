"""Golden test carried from reference tests/losses/test_approxndcg.py."""

import math

import numpy as np
from pytest import approx

from allrank_tpu.constants import PADDED_Y_VALUE
from allrank_tpu.losses import approxNDCGLoss


def test_approxndcg_ignores_padded():
    result = float(
        approxNDCGLoss(np.array([[0.5, 0.3, 0.5]]), np.array([[0.5, 0.3, 0.5]]), alpha=1.0)
    )
    result_pad = float(
        approxNDCGLoss(
            np.array([[0.5, 0.3, 0.5, 1.0]]),
            np.array([[0.5, 0.3, 0.5, PADDED_Y_VALUE]]),
            alpha=1.0,
        )
    )
    expected = -0.8499219417
    assert math.isfinite(result) and math.isfinite(result_pad)
    assert result == approx(result_pad)
    assert result == approx(expected)
