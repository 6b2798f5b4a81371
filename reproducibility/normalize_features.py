"""MSLR-WEB30K feature normalization (reference: reproducibility/normalize_features.py:10-89).

Per feature: optionally negate (features whose raw values are negative),
log-transform with eps 1e-2 unless excluded or any split has negative values,
then standardize with the TRAIN split's mean/std (eps 1e-6). Writes
``<ds_path>_normalized/{train,vali,test}.txt``.

Re-designed versus the reference script: fully vectorized numpy over the
feature axis (no per-feature Python loop) and reads through the fast native
parser when built.

Usage::

    python reproducibility/normalize_features.py --ds_path <dir with train/vali/test.txt>
"""

from __future__ import annotations

import os
import sys
from argparse import ArgumentParser, Namespace

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# MSLR-WEB30K feature groups (0-based indices, identical to the reference):
FEATURES_WITHOUT_LOGARITHM = [
    5, 6, 7, 8, 9, 15, 19, 57, 58, 62, 75, 79, 85, 95, 96, 97, 98, 99, 100,
    101, 102, 103, 104, 121, 122, 127, 129, 130,
]
FEATURES_NEGATIVE = [110, 111, 112, 113, 114, 115, 116, 117, 118, 119, 120,
                     123, 124]

EPS_LOG = 1e-2
EPS = 1e-6


def parse_args() -> Namespace:
    parser = ArgumentParser("Normalize features script")
    parser.add_argument("--ds_path", required=True, help="location of the dataset")
    parser.add_argument(
        "--features_without_logarithm", type=int, nargs="*",
        default=FEATURES_WITHOUT_LOGARITHM,
        help="feature indices standardized without the log transform",
    )
    parser.add_argument(
        "--features_negative", type=int, nargs="*", default=FEATURES_NEGATIVE,
        help="feature indices negated before the log transform",
    )
    return parser.parse_args()


def normalize_splits(splits, features_without_logarithm, features_negative):
    """splits: {role: X [N, F]} (modified out-of-place). Returns {role: X}."""
    n_features = next(iter(splits.values())).shape[1]
    X = {role: x.astype(np.float64).copy() for role, x in splits.items()}

    negate = np.zeros(n_features, dtype=bool)
    negate[list(features_negative)] = True
    for x in X.values():
        x[:, negate] *= -1.0

    # log-transform: not excluded AND all values of every split >= 0
    no_log = np.zeros(n_features, dtype=bool)
    no_log[list(features_without_logarithm)] = True
    all_nonneg = np.ones(n_features, dtype=bool)
    for x in X.values():
        all_nonneg &= (x >= 0).all(axis=0)
    do_log = ~no_log & all_nonneg
    for i in np.flatnonzero(~no_log & ~all_nonneg):
        print(f"Some values of feature no. {i} are still < 0 "
              "which is why the feature won't be normalized")
    for x in X.values():
        x[:, do_log] = np.log(x[:, do_log] + EPS_LOG)

    mean = X["train"].mean(axis=0)
    std = X["train"].std(axis=0)
    for role in X:
        X[role] = (X[role] - mean) / (std + EPS)
    return X


def main() -> None:
    args = parse_args()
    from allrank_tpu.data.dataset import parse_svmlight
    from sklearn.datasets import dump_svmlight_file

    roles = ("train", "test", "vali")
    raw = {}
    labels = {}
    qids = {}
    for role in roles:
        x, y, q = parse_svmlight(os.path.join(args.ds_path, f"{role}.txt"))
        raw[role], labels[role], qids[role] = x, y, q

    normalized = normalize_splits(
        raw, args.features_without_logarithm, args.features_negative
    )

    out_dir = f"{args.ds_path}_normalized"
    os.makedirs(out_dir, exist_ok=True)
    for role in roles:
        path = os.path.join(out_dir, f"{role}.txt")
        dump_svmlight_file(normalized[role], labels[role], path,
                           query_id=qids[role])
    print(f"Dataset with normalized features saved here: {out_dir}.")


if __name__ == "__main__":
    main()
