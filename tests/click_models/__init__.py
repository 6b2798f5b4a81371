"""Shared helper (reference: tests/click_models/__init__.py:9-12)."""

from typing import List, Union

import numpy as np

from allrank_tpu.click_models.base import ClickModel


def click(click_model: ClickModel, X: Union[list, np.ndarray],
          y: Union[list, np.ndarray]) -> List[int]:
    clicks = click_model.click((np.asarray(X), np.asarray(y)))
    assert isinstance(clicks, np.ndarray)
    return clicks.tolist()
