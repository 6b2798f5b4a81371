"""Generate an MSLR-WEB30K-shaped surrogate dataset (Fold1 layout).

The real MSLR-WEB30K is unreachable from this environment (no egress), so
this produces a structurally faithful stand-in for end-to-end validation of
the paper recipe (reproducibility/normalize_features.py + the contextaware
configs): 136 features, Fold1-sized splits (train 18,919 / vali 6,306 /
test 6,306 queries), a realistic slate-length distribution (mean ≈ 120
docs/query, max ≈ 1308 — the WEB30K vali maximum), and the published WEB30K
label marginals (0: 51.4%, 1: 32.5%, 2: 13.4%, 3: 1.9%, 4: 0.8%).

Structure: each doc has a latent quality u ~ N(0,1); graded labels come from
noisy global quantile binning of u (the noise level bounds the achievable
NDCG, so training curves look WEB30K-like rather than saturating at 1.0);
features are heterogeneous views of u — linear, heavy-tailed exponential
(BM25/count-like), negated (the 13 features normalize_features.py expects to
be negative), and pure-noise distractors — so the preprocessing script has
realistic work to do.

Usage::

    python tools/make_web30k_surrogate.py --output-dir /tmp/web30k_synth \
        [--scale 1.0] [--seed 42]

Writes ``<output-dir>/Fold1/{train,vali,test}.txt`` in svmlight format
(the layout reproducibility/normalize_features.py expects).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FEATURES = 136
# WEB30K label marginals (fractions of docs per grade 0..4)
LABEL_MARGINALS = np.array([0.514, 0.325, 0.134, 0.019, 0.008])
# the 13 features normalize_features.py negates — 0-based indices matching
# its FEATURES_NEGATIVE list (reference normalize_features.py:12)
FEATURES_NEGATIVE_0BASED = [110, 111, 112, 113, 114, 115, 116, 117, 118, 119,
                            120, 123, 124]
MAX_DOCS = 1308  # longest WEB30K vali slate
LABEL_NOISE = 0.9  # latent->label noise; bounds achievable NDCG below 1.0

SPLITS = {"train": 18919, "vali": 6306, "test": 6306}


def _feature_params(rng: np.random.RandomState):
    """Per-feature view of the latent: kind, signal weight, scale."""
    kinds = rng.choice(
        ["linear", "exp", "noise"], size=N_FEATURES, p=[0.45, 0.35, 0.2]
    )
    signal = rng.uniform(0.1, 1.2, size=N_FEATURES)
    signal[kinds == "noise"] = 0.0
    scale = 10.0 ** rng.uniform(-1, 3, size=N_FEATURES)  # spread like MSLR
    return kinds, signal, scale


def _slate_lengths(rng: np.random.RandomState, n_queries: int) -> np.ndarray:
    lengths = rng.lognormal(mean=4.35, sigma=0.8, size=n_queries)
    lengths = np.clip(lengths.astype(int), 5, MAX_DOCS)
    # make sure the tail exists: force a few near-maximum slates per split
    if n_queries >= 100:
        idx = rng.choice(n_queries, size=max(3, n_queries // 2000), replace=False)
        lengths[idx] = rng.randint(MAX_DOCS - 60, MAX_DOCS + 1, size=len(idx))
    return lengths


def _labels_from_latent(u, rng):
    noisy = u + LABEL_NOISE * rng.randn(*u.shape)
    # global quantile thresholds of the noisy latent realize the marginals
    cum = np.cumsum(LABEL_MARGINALS)[:-1]
    # noisy ~ N(0, 1 + LABEL_NOISE^2)
    sigma = np.sqrt(1.0 + LABEL_NOISE**2)
    thresholds = sigma * np.array(
        [float(_norm_ppf(c)) for c in cum]
    )
    return np.digitize(noisy, thresholds).astype(np.int32)


def _norm_ppf(p: float) -> float:
    from scipy.stats import norm

    return norm.ppf(p)


def _features_from_latent(u, kinds, signal, scale, rng):
    n = len(u)
    X = np.empty((n, N_FEATURES), dtype=np.float32)
    noise = rng.randn(n, N_FEATURES).astype(np.float32)
    for f in range(N_FEATURES):
        base = signal[f] * u + np.sqrt(max(1e-6, 1.0 - signal[f] ** 2)) * noise[:, f]
        if kinds[f] == "exp":
            vals = np.exp(1.2 * base)  # heavy-tailed, positive (count-like)
        else:
            vals = base
        vals = vals * scale[f]
        if f in FEATURES_NEGATIVE_0BASED:
            vals = -np.abs(vals)
        X[:, f] = vals
    return X


def write_split(path, n_queries, qid_start, kinds, signal, scale, seed):
    rng = np.random.RandomState(seed)
    lengths = _slate_lengths(rng, n_queries)
    n_docs = 0
    with open(path, "w") as f:
        for qi in range(n_queries):
            L = lengths[qi]
            qid = qid_start + qi
            u = rng.randn(L)
            y = _labels_from_latent(u, rng)
            X = _features_from_latent(u, kinds, signal, scale, rng)
            # vectorized "fid:val" formatting (C-level), then per-row join
            vals = np.char.mod("%.6g", X)
            prefixes = np.array([f"{j + 1}:" for j in range(N_FEATURES)])
            cells = np.char.add(prefixes[None, :], vals)
            rows = [
                f"{y[d]} qid:{qid} " + " ".join(cells[d]) for d in range(L)
            ]
            f.write("\n".join(rows) + "\n")
            n_docs += L
            if (qi + 1) % 2000 == 0:
                print(f"  {os.path.basename(path)}: {qi + 1}/{n_queries} queries",
                      flush=True)
    return n_docs, int(lengths.max())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--scale", type=float, default=1.0,
                    help="query-count multiplier (1.0 = Fold1 size)")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    fold = os.path.join(args.output_dir, "Fold1")
    os.makedirs(fold, exist_ok=True)
    param_rng = np.random.RandomState(args.seed)
    kinds, signal, scale = _feature_params(param_rng)

    from multiprocessing import Process

    qid_start = 1
    procs = []
    for i, (split, n) in enumerate(SPLITS.items()):
        n_scaled = max(10, int(n * args.scale))
        path = os.path.join(fold, f"{split}.txt")
        print(f"writing {path} ({n_scaled} queries)...", flush=True)
        p = Process(
            target=write_split,
            args=(path, n_scaled, qid_start, kinds, signal, scale,
                  args.seed + 7 * i),
        )
        p.start()
        procs.append(p)
        qid_start += n_scaled
    for p in procs:
        p.join()
        if p.exitcode != 0:
            raise RuntimeError(f"split writer failed with {p.exitcode}")
    print("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
