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
  * Per-process sharding for multi-host: pass (process_index, process_count)
    and each host assembles only its own slate shard.
"""

from __future__ import annotations

import collections
from typing import Iterator, NamedTuple

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
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.dataset = dataset
        self.slate_length = int(slate_length)
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.process_index = process_index
        self.process_count = process_count

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _local_order(self, rng: np.random.RandomState) -> np.ndarray:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng.shuffle(order)
        # contiguous per-process shard (all processes see same permutation)
        return order[self.process_index :: self.process_count]

    def __len__(self) -> int:
        n_local = len(
            range(self.process_index, len(self.dataset), self.process_count)
        )
        return -(-n_local // self.batch_size)

    def __iter__(self) -> Iterator[SlateBatch]:
        rng = np.random.RandomState(self.seed + self.epoch)
        order = self._local_order(rng)
        b, L = self.batch_size, self.slate_length
        n_features = self.dataset.n_features

        arange_L = np.arange(L, dtype=np.int32)
        for start in range(0, len(order), b):
            chunk = order[start : start + b]
            x = np.zeros((b, L, n_features), dtype=np.float32)
            y = np.full((b, L), float(PADDED_Y_VALUE), dtype=np.float32)
            indices = np.full((b, L), PADDED_Y_VALUE, dtype=np.int32)
            slate_mask = np.zeros((b,), dtype=bool)

            for row, ds_idx in enumerate(chunk):
                sx, sy = self.dataset[int(ds_idx)]
                n = len(sy)
                if n <= L:
                    # pad: write straight into the batch buffers (the
                    # fix_slate/np.pad path allocates 3 intermediates per
                    # slate and was the training loop's host bottleneck)
                    x[row, :n] = sx
                    y[row, :n] = sy
                    indices[row, :n] = arange_L[:n]
                else:
                    fx, fy, fi = fix_slate(sx, sy, L, rng)
                    x[row], y[row], indices[row] = fx, fy, fi
                slate_mask[row] = True

            yield SlateBatch(x, y, indices, slate_mask)


class DevicePrefetcher:
    """Wraps a batch iterator, moving batches to device(s) ahead of compute.

    ``shardings`` is a SlateBatch-shaped tuple of jax shardings (or None for
    single-device default placement). Keeps ``depth`` batches in flight —
    jax.device_put is async, so H2D DMA of future batches overlaps the
    current step's compute.
    """

    def __init__(self, batches, shardings=None, depth: int = 2):
        self.batches = batches
        self.shardings = shardings
        self.depth = depth

    def __iter__(self):
        import jax

        queue: collections.deque = collections.deque()

        def put(batch: SlateBatch):
            if self.shardings is None:
                return jax.device_put(batch)
            return jax.device_put(batch, self.shardings)

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
