"""Host batch-assembly throughput at WEB30K scale (data.num_workers sizing).

Builds an in-memory WEB30K-shaped dataset (18,919 slates, lognormal lengths,
136 features) and times full-epoch SlateBatcher assembly at batch 64 /
slate 240 for several worker counts, against the single-chip device demand
(see BENCHMARKS.md) — the host must assemble faster than the device trains
or the input pipeline is the bottleneck.

Usage: ``python tools/bench_host_assembly.py [--queries 18919] [--workers 0,2,4]``
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from allrank_tpu.data.batching import SlateBatcher  # noqa: E402
from allrank_tpu.data.dataset import SlateDataset  # noqa: E402


def build_dataset(n_queries: int, n_features: int = 136, seed: int = 0):
    rng = np.random.RandomState(seed)
    lengths = np.clip(
        rng.lognormal(mean=4.35, sigma=0.8, size=n_queries).astype(int), 5, 1308
    )
    total = int(lengths.sum())
    X = rng.randn(total, n_features).astype(np.float32)
    y = rng.randint(0, 5, size=total).astype(np.float32)
    qids = np.repeat(np.arange(n_queries), lengths)
    return SlateDataset(X, y, qids)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=int, default=18919)
    ap.add_argument("--workers", default="0,2,4")
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--slate-length", type=int, default=240)
    args = ap.parse_args()

    print(f"building {args.queries}-query dataset...", flush=True)
    ds = build_dataset(args.queries)
    print(f"dataset: {ds.shape}", flush=True)

    for w in (int(v) for v in args.workers.split(",")):
        batcher = SlateBatcher(
            ds, args.slate_length, args.batch_size, shuffle=True, seed=1,
            num_workers=w,
        )
        batcher.set_epoch(1)
        t0 = time.perf_counter()
        n = 0
        for b in batcher:
            n += int(b.slate_mask.sum())
        dt = time.perf_counter() - t0
        print(f"num_workers={w}: {dt:.2f}s/epoch = {n / dt:,.0f} slates/sec "
              f"host assembly", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
