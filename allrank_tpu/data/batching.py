"""Fixed-shape slate batching with async device prefetch.

TPU-first design (replaces the reference's torch DataLoader,
reference: allrank/data/dataset_loading.py:230-247):

  * Every batch has the same static shape [B, L, F] — the trailing partial
    batch is padded with dummy slates marked invalid in ``slate_mask [B]``,
    so jit compiles exactly once per role.
  * Batch assembly writes into fresh numpy buffers on the host; the
    ``DevicePrefetcher`` overlays H2D transfer of batch t+1 with device
    compute of batch t using ``jax.device_put`` with an explicit sharding,
    so data-parallel shards go straight to their devices.
  * Multi-host: every process derives the SAME epoch permutation and the
    same global-batch boundaries (seeded shuffle), then assembles ONLY the
    rows its addressable devices own under the batch sharding
    (``local_rows``). The prefetcher stitches the per-process pieces into
    global arrays with ``jax.make_array_from_process_local_data`` — each
    slate is consumed exactly once per epoch across the whole pod, the
    pod-level analog of the reference's n_gpus×batch_size DataParallel
    global batch without silent data loss.
  * Slate subsampling draws from a per-(seed, epoch, slate) RNG, so the
    assembled global batch is bit-identical regardless of process layout.
"""

from __future__ import annotations

import collections
from typing import Iterator, NamedTuple, Optional

import numpy as np

from allrank_tpu.constants import PADDED_Y_VALUE
from allrank_tpu.data.slate_fixing import fix_slate


class SlateBatch(NamedTuple):
    x: np.ndarray  # [B, L, F] float32
    y: np.ndarray  # [B, L] float32, PADDED_Y_VALUE at padded docs
    indices: np.ndarray  # [B, L] int32, original ranks, PADDED_INDEX_VALUE at pads
    slate_mask: np.ndarray  # [B] bool, False for batch-padding dummy slates


class SlateBatcher:
    """Iterates fixed-shape batches over a SlateDataset.

    ``batch_size`` is the GLOBAL batch; ``local_rows`` (default: all rows)
    selects which positions of each global batch this process assembles —
    sorted global row indices owned by this process's devices (see
    ``parallel.process_local_rows``). Yields batches of shape
    ``[len(local_rows), L, F]``.

    shuffle/randomized subsampling re-draw each epoch from ``seed + epoch``;
    call ``set_epoch`` before each pass for reshuffling (train role).
    """

    def __init__(
        self,
        dataset,
        slate_length: int,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 42,
        local_rows: Optional[np.ndarray] = None,
        num_workers: int = 0,
        emit_row_indices: bool = False,
    ):
        self.dataset = dataset
        self.slate_length = int(slate_length)
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.emit_row_indices = bool(emit_row_indices)
        if local_rows is None:
            local_rows = np.arange(self.batch_size)
        self.local_rows = np.asarray(local_rows, dtype=np.int64)
        if self.local_rows.size and (
            self.local_rows.min() < 0 or self.local_rows.max() >= self.batch_size
        ):
            raise ValueError(
                f"local_rows must index into the global batch [0, {self.batch_size})"
            )
        self.num_workers = int(num_workers or 0)
        self._pool = None

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _order(self) -> np.ndarray:
        """The epoch's global slate permutation — identical on every process."""
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(order)
        return order

    def _slate_rng(self, ds_idx: int) -> np.random.RandomState:
        """Per-(seed, epoch, slate) stream: subsampling is independent of
        which process/batch position assembles the slate."""
        s = (self.seed * 1000003 + self.epoch) * 1000003 + int(ds_idx)
        return np.random.RandomState(s % (2**31 - 1))

    def __len__(self) -> int:
        """Global batch count — identical on every process (lockstep)."""
        return -(-len(self.dataset) // self.batch_size)

    def _fill_row(self, bufs, row: int, ds_idx: int, arange_L: np.ndarray) -> None:
        x, y, indices, slate_mask = bufs
        L = self.slate_length
        sx, sy = self.dataset[int(ds_idx)]
        n = len(sy)
        if n < L:
            # pad: write straight into the batch buffers (the
            # fix_slate/np.pad path allocates 3 intermediates per
            # slate and was the training loop's host bottleneck)
            x[row, :n] = sx
            y[row, :n] = sy
            indices[row, :n] = arange_L[:n]
        else:
            # n >= L: random subsample/permutation with the relevance guard
            # (reference permutes full-length slates too,
            # dataset_loading.py:55-58)
            fx, fy, fi = fix_slate(sx, sy, L, self._slate_rng(ds_idx))
            x[row], y[row], indices[row] = fx, fy, fi
        slate_mask[row] = True

    def _get_pool(self):
        if self._pool is None and self.num_workers > 1:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=self.num_workers)
        return self._pool

    def _native_buffers(self):
        """(X, y, offsets, index_map) when the C++ assembler can run, else
        None. The native path is the default when built (GIL-free threads,
        ~10x the Python row loop); ALLRANK_TPU_NO_NATIVE_ASSEMBLY=1 or a
        dataset without flat buffers falls back to Python."""
        from allrank_tpu.data.native import _load_assembler

        if _load_assembler() is None:
            return None
        get = getattr(self.dataset, "flat_slate_buffers", None)
        return get() if get is not None else None

    def _iter_row_indices(self) -> Iterator[SlateBatch]:
        """Index-mode epochs for a DeviceFeatureStore: ``x`` becomes a
        [B, L] int32 matrix of rows into the dataset's flat feature matrix
        (padded/dummy slots -> the store's sentinel row == total doc count).

        Derived FROM the materializing iterator's batches — ``indices``
        already records each slot's chosen within-slate position, so
        ``slate_offset + indices`` is the flat row for every assembly
        backend (native C++, thread pool, python) with bit-identical
        slate-fixing draws; only the [B, L, F] payload stops being shipped
        (host materialization is ~1s/epoch at WEB30K scale, the device feed
        it replaces is the bottleneck)."""
        flat = getattr(self.dataset, "flat_slate_buffers", lambda: None)()
        if flat is None:
            raise ValueError("emit_row_indices requires flat slate buffers")
        _, _, offsets, index_map = flat
        sentinel = np.int64(offsets[-1])
        order = self._order()
        G = self.batch_size
        local_rows = self.local_rows
        for start, batch in zip(
            range(0, len(order), G), self._iter_materialized()
        ):
            chunk = order[start : start + G]
            row_off = np.zeros((len(local_rows), 1), dtype=np.int64)
            for row, gpos in enumerate(local_rows):
                if gpos < len(chunk):
                    ds_idx = int(chunk[gpos])
                    base = ds_idx if index_map is None else int(index_map[ds_idx])
                    row_off[row, 0] = offsets[base]
            xi = np.where(
                batch.indices >= 0, row_off + batch.indices, sentinel
            ).astype(np.int32)
            yield SlateBatch(xi, batch.y, batch.indices, batch.slate_mask)

    def __iter__(self) -> Iterator[SlateBatch]:
        if self.emit_row_indices:
            yield from self._iter_row_indices()
            return
        yield from self._iter_materialized()

    def _iter_materialized(self) -> Iterator[SlateBatch]:
        order = self._order()
        G, L = self.batch_size, self.slate_length
        n_features = self.dataset.n_features
        local_rows = self.local_rows
        n_local = len(local_rows)
        native = self._native_buffers()
        pool = self._get_pool() if native is None else None

        arange_L = np.arange(L, dtype=np.int32)
        for start in range(0, len(order), G):
            chunk = order[start : start + G]  # global batch; may be short
            x = np.zeros((n_local, L, n_features), dtype=np.float32)
            y = np.full((n_local, L), float(PADDED_Y_VALUE), dtype=np.float32)
            indices = np.full((n_local, L), PADDED_Y_VALUE, dtype=np.int32)
            slate_mask = np.zeros((n_local,), dtype=bool)
            bufs = (x, y, indices, slate_mask)

            todo = [
                (row, int(chunk[gpos]))
                for row, gpos in enumerate(local_rows)
                if gpos < len(chunk)
            ]
            if native is not None and todo:
                from allrank_tpu.data.native import assemble_rows_native

                flat_X, flat_y, offsets, index_map = native
                rows = np.array([r for r, _ in todo], dtype=np.int64)
                local = np.array([i for _, i in todo], dtype=np.int64)
                slates = local if index_map is None else index_map[local]
                assemble_rows_native(
                    flat_X, flat_y, offsets, rows, slates, slates,
                    n_features, L,
                    (self.seed * 1000003 + self.epoch) & 0xFFFFFFFFFFFFFFFF,
                    self.num_workers, x, y, indices, slate_mask,
                )
                yield SlateBatch(x, y, indices, slate_mask)
                continue
            if pool is not None and len(todo) > self.num_workers:
                # chunked dispatch: one task per worker (per-row tasks drown
                # in executor overhead at ~50us of work per row)
                def fill_span(span):
                    for row, ds_idx in span:
                        self._fill_row(bufs, row, ds_idx, arange_L)

                step_size = -(-len(todo) // self.num_workers)
                spans = [todo[i : i + step_size]
                         for i in range(0, len(todo), step_size)]
                list(pool.map(fill_span, spans))
            else:
                for row, ds_idx in todo:
                    self._fill_row(bufs, row, ds_idx, arange_L)

            yield SlateBatch(x, y, indices, slate_mask)


class _SubsetDataset:
    """A view over selected slates of a SlateDataset."""

    def __init__(self, dataset, indices: np.ndarray):
        self.dataset = dataset
        self.indices = np.asarray(indices, dtype=np.int64)

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, idx: int):
        return self.dataset[int(self.indices[idx])]

    @property
    def n_features(self) -> int:
        return self.dataset.n_features

    def flat_slate_buffers(self):
        base = getattr(self.dataset, "flat_slate_buffers", lambda: None)()
        if base is None:
            return None
        X, y, offsets, index_map = base
        mapped = self.indices if index_map is None else index_map[self.indices]
        return X, y, offsets, mapped


class BucketedSlateBatcher:
    """Validation batcher with per-bucket padded slate lengths.

    The reference pads every validation slate to the split's longest
    (reference: allrank/data/dataset_loading.py:185-194) — for WEB30K vali
    that is L≈1300, so every eval batch pays the O(L²)+ loss cost at the
    maximum shape. Here slates are sorted by length and split into
    ``n_buckets`` roughly equal-count groups; each group pads to its own
    maximum (rounded up to ``align`` for TPU tiling) and compiles one eval
    program per distinct bucket shape. Metrics are padding-invariant, so
    results match pad-to-longest.

    Same multi-host contract as SlateBatcher: ``batch_size`` is global,
    ``local_rows`` selects this process's rows of every global batch.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        n_buckets: int = 4,
        local_rows: Optional[np.ndarray] = None,
        num_workers: int = 0,
        align: int = 8,
        emit_row_indices: bool = False,
    ):
        lengths = np.array([len(dataset[i][1]) for i in range(len(dataset))])
        order = np.argsort(lengths, kind="stable")
        self.buckets = []  # (bucket_length, slate indices)
        for group in np.array_split(order, max(1, int(n_buckets))):
            if len(group) == 0:
                continue
            length = -(-int(lengths[group].max()) // align) * align
            if self.buckets and self.buckets[-1][0] == length:
                prev_len, prev_idx = self.buckets[-1]
                self.buckets[-1] = (prev_len, np.concatenate([prev_idx, group]))
            else:
                self.buckets.append((length, group))
        self._batchers = [
            SlateBatcher(
                _SubsetDataset(dataset, idxs), length, batch_size,
                shuffle=False, local_rows=local_rows, num_workers=num_workers,
                emit_row_indices=emit_row_indices,
            )
            for length, idxs in self.buckets
        ]

    def set_epoch(self, epoch: int) -> None:
        for b in self._batchers:
            b.set_epoch(epoch)

    def __len__(self) -> int:
        return sum(len(b) for b in self._batchers)

    def __iter__(self) -> Iterator[SlateBatch]:
        for b in self._batchers:
            yield from b


class DevicePrefetcher:
    """Wraps a batch iterator, moving batches to device(s) ahead of compute.

    ``shardings`` is a SlateBatch-shaped tuple of jax shardings (or None for
    single-device default placement). Keeps ``depth`` batches in flight —
    jax.device_put is async, so H2D DMA of future batches overlaps the
    current step's compute.

    Multi-process: host batches are per-process row shards; the global
    jax.Array is stitched from every process's local piece with
    ``jax.make_array_from_process_local_data`` (row order must match the
    sharding's device→index map — ``SlateBatcher.local_rows`` guarantees it).
    """

    def __init__(self, batches, shardings=None, depth: int = 2):
        self.batches = batches
        self.shardings = shardings
        self.depth = depth

    def __iter__(self):
        import jax

        queue: collections.deque = collections.deque()
        multiprocess = jax.process_count() > 1

        def put(batch: SlateBatch):
            if self.shardings is None:
                return jax.device_put(batch)
            if not multiprocess:
                return jax.device_put(batch, self.shardings)
            return jax.tree.map(
                lambda leaf, s: jax.make_array_from_process_local_data(s, leaf),
                batch,
                self.shardings,
                is_leaf=lambda v: isinstance(v, np.ndarray),
            )

        it = iter(self.batches)
        try:
            for _ in range(self.depth):
                queue.append(put(next(it)))
        except StopIteration:
            pass

        while queue:
            ready = queue.popleft()
            try:
                queue.append(put(next(it)))
            except StopIteration:
                pass
            yield ready
