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
import uuid
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


_CACHE_VERSION = 1


def _cache_paths(path: str):
    base = str(path) + ".npycache"
    return (base + ".meta.json", base + ".X.npy", base + ".y.npy",
            base + ".qids.npy")


def parse_svmlight_cached(path) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """``parse_svmlight`` behind a binary sidecar cache: the first load
    writes ``<path>.npycache.{X,y,qids}.npy`` (+ a meta stamp of the
    source's size/mtime), subsequent loads memory-map X in ~0 time — no
    re-parse, and the OS pages the feature matrix lazily instead of the
    host holding a second multi-GB dense copy. The cache invalidates when
    the source file changes; write failures (read-only dataset dirs)
    degrade silently to a plain parse. Concurrent writers (multi-host
    training on a shared filesystem) are safe: every process writes
    identical content from the same source and publishes via atomic
    ``os.replace``, with the meta stamp written last. No reference analog
    (the reference re-parses the text file every run —
    reference: allrank/data/dataset_loading.py:118-129).

    The returned X is READ-ONLY on both paths (mmap on hits, pinned
    ndarray on misses) — copy before mutating."""
    import json

    meta_p, x_p, y_p, q_p = _cache_paths(path)
    st = os.stat(path)
    stamp = {"version": _CACHE_VERSION, "size": st.st_size,
             "mtime_ns": st.st_mtime_ns}
    try:
        with open(meta_p) as f:
            if json.load(f) == stamp:
                x = np.load(x_p, mmap_mode="r")
                y = np.load(y_p)
                qids = np.load(q_p)
                logger.info("dataset cache hit: %s (X memory-mapped)", x_p)
                return x, y, qids
            logger.info("dataset cache stale for %s; re-parsing", path)
    except (OSError, ValueError):
        pass

    # memmap-direct first parse: the C++ fill pass writes X straight into a
    # writable np.memmap over the future .npy sidecar, so even the FIRST
    # touch of a larger-than-RAM corpus never materializes the dense [N, F]
    # in host RAM (dirty pages are the OS's to write back/evict). Falls
    # back to the in-RAM parse when the native lib or a writable cache dir
    # is unavailable.
    direct = _parse_direct_to_memmap(path, x_p)
    if direct is not None:
        x, y, qids = direct
        try:
            for p, arr in ((y_p, y), (q_p, qids)):
                tmp = p + ".tmp"
                with open(tmp, "wb") as f:
                    np.save(f, arr)
                os.replace(tmp, p)
            with open(meta_p + ".tmp", "w") as f:
                json.dump(stamp, f)
            os.replace(meta_p + ".tmp", meta_p)
            logger.info("wrote dataset cache %s (memmap-direct parse)", x_p)
        except OSError as exc:
            logger.warning("dataset cache meta write failed (%s); cache "
                           "will miss next run", exc)
        return x, y, qids

    x, y, qids = parse_svmlight(path)
    try:
        # atomic-ish: data files first, meta stamp last (a partial write
        # without meta is just a miss, never a corrupt hit)
        for p, arr in ((x_p, x), (y_p, y), (q_p, qids)):
            tmp = p + ".tmp"
            with open(tmp, "wb") as f:
                np.save(f, arr)
            os.replace(tmp, p)
        with open(meta_p + ".tmp", "w") as f:
            json.dump(stamp, f)
        os.replace(meta_p + ".tmp", meta_p)
        logger.info("wrote dataset cache %s", x_p)
    except OSError as exc:
        logger.warning("dataset cache write failed (%s); continuing uncached",
                       exc)
    # contract: X is read-only on BOTH paths (cache hits hand out a
    # read-only mmap; pin the miss path to match so a future mutation
    # fails identically regardless of cache state)
    x.flags.writeable = False
    return x, y, qids


_STALE_TMP_AGE_S = 24 * 3600


def _reap_stale_tmps(x_p: str) -> None:
    """Remove day-old ``<x_p>.tmp.<hex>`` leftovers from crashed parses
    (unique tmp names don't self-overwrite like the old fixed ``.tmp``
    did, so a SIGKILL mid-parse would otherwise leak a multi-GB file).
    The age floor keeps live writers safe; even if a >24h parse's tmp is
    unlinked, its mapping stays valid (the inode outlives the name) and
    its ``os.replace`` then just falls back to the in-RAM path."""
    import glob
    import time

    for p in glob.glob(glob.escape(x_p) + ".tmp.*"):
        try:
            if time.time() - os.stat(p).st_mtime > _STALE_TMP_AGE_S:
                os.unlink(p)
                logger.info("removed stale parse tmp %s", p)
        except OSError:
            pass


def _parse_direct_to_memmap(path, x_p: str):
    """Native parse of ``path`` with X filled directly into the ``.npy``
    sidecar at ``x_p`` via a writable memmap; returns (X read-only mmap, y,
    qids) or None to fall back (no native lib / unwritable cache dir /
    parse error). Publishes via atomic ``os.replace`` like the in-RAM
    writer, so concurrent writers and crash-partial files stay safe."""
    from allrank_tpu.data.native import parse_svmlight_native

    # Unlike the in-RAM writer (short identical-content np.save calls to a
    # shared .tmp, where interleaved same-byte writes are harmless), this
    # path holds a LIVE writable mapping over the tmp inode for the whole
    # multi-minute parse — a concurrent writer's open_memmap(mode="w+")
    # truncating that shared inode would SIGBUS the first writer's next
    # page write. Give each process its own tmp inode; os.replace publishes
    # atomically and last-writer-wins with identical content.
    tmp = "%s.tmp.%s" % (x_p, uuid.uuid4().hex)
    _reap_stale_tmps(x_p)
    state: dict = {}

    def alloc(n_rows: int, n_features: int) -> np.ndarray:
        state["x"] = np.lib.format.open_memmap(
            tmp, mode="w+", dtype=np.float32, shape=(n_rows, n_features))
        return state["x"]

    try:
        res = parse_svmlight_native(path, x_alloc=alloc)
    except OSError as exc:  # open_memmap failed (read-only dataset dir)
        logger.info("memmap-direct parse unavailable (%s)", exc)
        res = None
    if res is None or "x" not in state:
        if "x" in state:
            del state["x"]
            try:
                os.unlink(tmp)
            except OSError:
                pass
        return None
    _, y, qids = res
    xm = state.pop("x")
    xm.flush()
    del xm  # close the writable map before publishing
    try:
        os.replace(tmp, x_p)
    except OSError:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None
    return np.load(x_p, mmap_mode="r"), y, qids


class SlateDataset:
    """Slates (query groups) of documents: per-qid feature/label arrays."""

    def __init__(self, X: np.ndarray, y: np.ndarray, query_ids: np.ndarray):
        X = np.asarray(X, dtype=np.float32)
        y = np.asarray(y, dtype=np.float32)
        query_ids = np.asarray(query_ids)

        # group rows by qid preserving first-appearance order
        _, first_idx, inverse, counts = np.unique(
            query_ids, return_index=True, return_inverse=True,
            return_counts=True)

        # the boundary-split grouping below assumes each qid's rows are
        # contiguous (true for every standard LTR file). A non-contiguous
        # file would be grouped SILENTLY WRONG by a cumsum split — the
        # reference has exactly this failure mode
        # (allrank/data/dataset_loading.py:109-113: np.split on cumsum
        # counts) — so detect it cheaply and regroup correctly instead.
        n_blocks = (1 + int(np.count_nonzero(query_ids[1:] != query_ids[:-1]))
                    if len(query_ids) else 0)
        if n_blocks != len(counts):
            logger.warning(
                "query ids are NOT contiguous (%d row blocks for %d unique "
                "qids) — regrouping rows by first qid appearance; the "
                "reference implementation silently scrambles slates on "
                "such files", n_blocks, len(counts))
            row_order = np.argsort(first_idx[inverse], kind="stable")
            X = X[row_order]
            y = y[row_order]
            query_ids = query_ids[row_order]

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
    def from_svm_file(cls, svm_file_path,
                      binary_cache: bool = False) -> "SlateDataset":
        parse = parse_svmlight_cached if binary_cache else parse_svmlight
        x, y, qids = parse(svm_file_path)
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


def load_dataset_role(role: str, input_path: str, slate_length: int,
                      binary_cache: bool = False):
    """Load ``{input_path}/{role}.txt``; returns (dataset, effective_slate_length).

    Train slates fix to ``slate_length``; other roles pad to their longest
    slate (reference: dataset_loading.py:185-227). ``binary_cache`` loads
    through the parse-once .npy sidecar cache (memory-mapped X)."""
    path = os.path.join(input_path, f"{role}.txt")
    logger.info("loading %s data from %s", role, path)
    ds = SlateDataset.from_svm_file(path, binary_cache=binary_cache)
    if role == "train":
        effective = int(slate_length)
    else:
        effective = int(ds.longest_query_length)
        logger.info("padding %s role to longest slate: %d", role, effective)
    return ds, effective


def load_dataset(
    input_path: str, slate_length: int, validation_ds_role: str,
    binary_cache: bool = False,
) -> Tuple["SlateDataset", int, "SlateDataset", int]:
    """Load train + validation datasets; returns (train_ds, train_len, val_ds, val_len)."""
    train_ds, train_len = load_dataset_role("train", input_path, slate_length,
                                            binary_cache=binary_cache)
    val_ds, val_len = load_dataset_role(validation_ds_role, input_path,
                                        slate_length,
                                        binary_cache=binary_cache)
    return train_ds, train_len, val_ds, val_len
