"""Write ranked/clicked slates back to svmlight format, stripping padding
(reference: allrank/data/dataset_saving.py:9-32)."""

from __future__ import annotations

from typing import Iterable

import numpy as np

from allrank_tpu.constants import PADDED_Y_VALUE


def write_to_libsvm_without_masked(
    path: str, X: Iterable[np.ndarray], y: Iterable[np.ndarray]
) -> None:
    """Drop padded docs (y == PADDED_Y_VALUE), renumber qids sequentially, dump."""
    from sklearn.datasets import dump_svmlight_file

    xs, ys, qids = [], [], []
    for qid, (slate_x, slate_y) in enumerate(zip(X, y)):
        slate_x = np.asarray(slate_x)
        slate_y = np.asarray(slate_y)
        keep = slate_y != PADDED_Y_VALUE
        xs.append(slate_x[keep])
        ys.append(slate_y[keep])
        qids.append(np.repeat(qid, int(keep.sum())))
    dump_svmlight_file(
        np.vstack(xs), np.concatenate(ys), path, query_id=np.concatenate(qids)
    )
