"""Dummy libsvm dataset generator (reference: allrank/data/generate_dummy_data.py:10-38)."""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np


def generate_dummy_data(
    num_queries: int = 100,
    results_len: int = 20,
    num_labels: int = 5,
    num_features: int = 20,
    rng: np.random.RandomState = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """X ~ N(0,1); y = max(0, int(mean((X+1)/2) * num_labels)); fixed-size slates."""
    rng = rng or np.random
    X = rng.randn(num_queries * results_len, num_features)
    y = np.maximum(0, (((X + 1) / 2).mean(axis=-1) * num_labels).astype(np.int32))
    qid = np.repeat(np.arange(0, num_queries), results_len)
    return X, y, qid


def write_dummy_dataset(
    output_dir: str,
    num_queries: int = 100,
    results_len: int = 20,
    num_labels: int = 5,
    num_features: int = 20,
    seed: int = 42,
) -> str:
    """Write seeded train.txt + vali.txt under output_dir; returns output_dir."""
    from sklearn.datasets import dump_svmlight_file

    rng = np.random.RandomState(seed)
    os.makedirs(output_dir, exist_ok=True)
    for role in ("train", "vali"):
        X, y, qid = generate_dummy_data(
            num_queries, results_len, num_labels, num_features, rng
        )
        dump_svmlight_file(X, y, os.path.join(output_dir, f"{role}.txt"), query_id=qid)
    return output_dir


if __name__ == "__main__":
    from argparse import ArgumentParser

    parser = ArgumentParser("Dummy data")
    parser.add_argument("--num_queries", type=int, default=100)
    parser.add_argument("--results_len", type=int, default=20)
    parser.add_argument("--num_labels", type=int, default=5)
    parser.add_argument("--num_features", type=int, default=20)
    parser.add_argument("--output_dir", default="dummy_data")
    args = parser.parse_args()
    write_dummy_dataset(
        args.output_dir, args.num_queries, args.results_len,
        args.num_labels, args.num_features,
    )
