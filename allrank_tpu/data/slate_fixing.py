"""Slate length fixing: zero-pad short slates, subsample long ones with the
relevance guard (reference: allrank/data/dataset_loading.py:32-93)."""

from __future__ import annotations

from typing import Tuple

import numpy as np

from allrank_tpu.constants import PADDED_INDEX_VALUE, PADDED_Y_VALUE


def pad_slate(
    x: np.ndarray, y: np.ndarray, length: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad with zero features, PADDED_Y_VALUE labels, PADDED_INDEX_VALUE ranks."""
    n = len(y)
    fx = np.pad(x, ((0, length - n), (0, 0)), "constant")
    fy = np.pad(y, (0, length - n), "constant", constant_values=PADDED_Y_VALUE)
    fi = np.pad(
        np.arange(n), (0, length - n), "constant", constant_values=PADDED_INDEX_VALUE
    )
    return fx, fy, fi


def sample_slate(
    x: np.ndarray, y: np.ndarray, length: int, rng: np.random.RandomState
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Subsample ``length`` docs without replacement, keeping >= 1 relevant doc
    when the slate has any: resample while the draw has none (guard semantics
    of reference dataset_loading.py:61-79, loop instead of recursion)."""
    n = len(y)
    total = y.sum()
    while True:
        indices = rng.choice(n, length, replace=False)
        fy = y[indices]
        if fy.sum() != 0 or total == 0:
            break
        if total == 1:
            indices = np.concatenate(
                [rng.choice(indices, length - 1, replace=False), [int(np.argmax(y))]]
            )
            fy = y[indices]
            break
        # total > 1: redraw
    return x[indices], fy, indices


def fix_slate(
    x: np.ndarray, y: np.ndarray, length: int, rng: np.random.RandomState
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    if len(y) < length:
        return pad_slate(x, y, length)
    return sample_slate(x, y, length, rng)
