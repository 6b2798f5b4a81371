"""LibSVM slate datasets grouped by query id.

Parity with the reference loader (reference: allrank/data/dataset_loading.py:96-227):
rows are grouped by qid in first-appearance order; the train role is
length-fixed to ``slate_length`` (pad or subsample), validation roles are
padded to their own longest slate.

The parser prefers the native C++ extension (allrank_tpu.data.native) and
falls back to sklearn's pure-python svmlight reader.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

from allrank_tpu.utils.ltr_logging import get_logger

logger = get_logger()


def parse_svmlight(path_or_stream) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Return (X dense [N, F] float32, y [N] float32, qids [N] int64)."""
    from allrank_tpu.data.native import parse_svmlight_native

    if isinstance(path_or_stream, (str, os.PathLike)):
        native = parse_svmlight_native(str(path_or_stream))
        if native is not None:
            return native
        with open(path_or_stream, "rb") as f:
            return _parse_svmlight_sklearn(f)
    return _parse_svmlight_sklearn(path_or_stream)


def _parse_svmlight_sklearn(stream):
    from sklearn.datasets import load_svmlight_file

    x, y, qids = load_svmlight_file(stream, query_id=True)
    return (
        np.asarray(x.todense(), dtype=np.float32),
        y.astype(np.float32),
        qids.astype(np.int64),
    )


class SlateDataset:
    """Slates (query groups) of documents: per-qid feature/label arrays."""

    def __init__(self, X: np.ndarray, y: np.ndarray, query_ids: np.ndarray):
        X = np.asarray(X, dtype=np.float32)
        y = np.asarray(y, dtype=np.float32)

        # group rows by qid preserving first-appearance order
        _, first_idx, counts = np.unique(query_ids, return_index=True, return_counts=True)
        order = np.argsort(first_idx)
        boundaries = np.cumsum(counts[order])[:-1]

        self.X_by_qid: List[np.ndarray] = np.split(X, boundaries)
        self.y_by_qid: List[np.ndarray] = np.split(y, boundaries)
        self.longest_query_length = max(len(a) for a in self.y_by_qid)
        # flat views for the native batch assembler: X_by_qid[i] is
        # X[offsets[i]:offsets[i+1]] (qid groups are contiguous in LTR files)
        self._flat_X = np.ascontiguousarray(X)
        self._flat_y = np.ascontiguousarray(y)
        self._offsets = np.concatenate(
            [[0], np.cumsum(counts[order])]
        ).astype(np.int64)

        logger.info("loaded dataset with %d queries", len(self.X_by_qid))
        logger.info("longest query had %d documents", self.longest_query_length)

    @classmethod
    def from_svm_file(cls, svm_file_path) -> "SlateDataset":
        x, y, qids = parse_svmlight(svm_file_path)
        logger.info(
            "loaded dataset from %s with x shape %s, y shape %s",
            svm_file_path, x.shape, y.shape,
        )
        return cls(x, y, qids)

    def __len__(self) -> int:
        return len(self.X_by_qid)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        return self.X_by_qid[idx], self.y_by_qid[idx]

    @property
    def n_features(self) -> int:
        return self.X_by_qid[0].shape[-1]

    def flat_slate_buffers(self):
        """(X [N_docs, F], y [N_docs], offsets [n_slates+1], index_map) for
        the native assembler; index_map None = identity."""
        return self._flat_X, self._flat_y, self._offsets, None

    @property
    def shape(self) -> List[int]:
        return [len(self), self.longest_query_length, self.n_features]


def load_dataset_role(role: str, input_path: str, slate_length: int):
    """Load ``{input_path}/{role}.txt``; returns (dataset, effective_slate_length).

    Train slates fix to ``slate_length``; other roles pad to their longest
    slate (reference: dataset_loading.py:185-227)."""
    path = os.path.join(input_path, f"{role}.txt")
    logger.info("loading %s data from %s", role, path)
    ds = SlateDataset.from_svm_file(path)
    if role == "train":
        effective = int(slate_length)
    else:
        effective = int(ds.longest_query_length)
        logger.info("padding %s role to longest slate: %d", role, effective)
    return ds, effective


def load_dataset(
    input_path: str, slate_length: int, validation_ds_role: str
) -> Tuple["SlateDataset", int, "SlateDataset", int]:
    """Load train + validation datasets; returns (train_ds, train_len, val_ds, val_len)."""
    train_ds, train_len = load_dataset_role("train", input_path, slate_length)
    val_ds, val_len = load_dataset_role(validation_ds_role, input_path, slate_length)
    return train_ds, train_len, val_ds, val_len
