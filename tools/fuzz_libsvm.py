"""Differential fuzz of the native C++ svmlight parser vs sklearn.

The C++ parser (native/libsvm_parser.cpp) is the data path's trust
boundary: every training run's features flow through it, and a silent
mis-parse would corrupt training invisibly. This harness generates seeded
random svmlight files with adversarial-but-valid formatting and requires
the native parse to match sklearn's ``load_svmlight_file(query_id=True)``
EXACTLY (bitwise on X, y, qids):

  * 0-based and 1-based feature indexing (the sklearn "auto" rule);
  * sparse rows, empty rows (label+qid only), gap-heavy index spaces;
  * '#' comments (inline and full-line), blank lines, CRLF endings,
    runs of spaces/tabs, missing trailing newline;
  * labels/values as ints, negatives, and shortest-roundtrip float32
    reprs (incl. scientific notation) — value parity must be bitwise;
  * a >1 MB file to drive the multithreaded chunked path (row order must
    survive chunk-boundary splits).

Values are generated as float32 shortest-repr strings so both parse routes
(C++ from_chars -> float32 directly; sklearn -> float64 -> float32) are
guaranteed to land on the same float32 — any mismatch is a real bug, not
double-rounding noise.

Usage: python tools/fuzz_libsvm.py [--cases 200] [--seed 0]
CI runs a 25-case subset (tests/data/test_fuzz_libsvm.py).
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, ".")


def _f32_str(v) -> str:
    """Shortest-double repr of a float32 value: parses back to the same
    float32 through either route (from_chars->float32 directly, or
    python/sklearn float64 -> float32)."""
    return repr(float(np.float32(v)))


def _fmt_value(rng: np.random.RandomState) -> str:
    kind = rng.randint(5)
    if kind == 0:
        return str(rng.randint(-1000, 1000))
    if kind == 1:
        return _f32_str(rng.randn())
    if kind == 2:  # scientific-notation scales
        return _f32_str(rng.randn() * 10.0 ** rng.randint(-20, 20))
    if kind == 3:
        return "0"
    return _f32_str(rng.rand())


def _sep(rng: np.random.RandomState) -> str:
    return rng.choice([" ", "  ", "\t", " \t "])


def gen_file(rng: np.random.RandomState, path: str, big: bool = False) -> None:
    """Write a random valid svmlight file with adversarial formatting."""
    n_rows = rng.randint(400, 1200) if big else rng.randint(1, 60)
    n_feat = rng.randint(40, 120) if big else rng.randint(1, 30)
    one_based = bool(rng.randint(2))
    crlf = bool(rng.randint(2))
    trailing_newline = big or bool(rng.randint(2))
    eol = "\r\n" if crlf else "\n"

    qid = rng.randint(1, 1 << 20)
    buf = io.StringIO()
    for r in range(n_rows):
        if not big and rng.rand() < 0.08:
            buf.write(rng.choice(["", "   ", "# full-line comment"]) + eol)
        if rng.rand() < 0.3:
            qid += rng.randint(1, 50)
        label = rng.choice(["0", "1", "2", "-1",
                            _f32_str(rng.rand() * 4)])
        parts = [label, f"qid:{qid}"]
        # ascending unique indices with gaps; occasionally an empty row
        n_nz = 0 if rng.rand() < 0.05 else rng.randint(1, n_feat + 1)
        idxs = np.sort(rng.choice(n_feat, size=n_nz, replace=False))
        # pad long rows in the big case so the file crosses the 1 MB
        # multithreading threshold
        for i in idxs:
            parts.append(f"{i + (1 if one_based else 0)}:{_fmt_value(rng)}")
        line = _sep(rng).join(parts)
        if rng.rand() < 0.15:
            line += _sep(rng)  # trailing whitespace
        if rng.rand() < 0.15:
            line += rng.choice(["# c", " # trailing comment 1:9"])
        buf.write(line)
        if r < n_rows - 1 or trailing_newline:
            buf.write(eol)
    data = buf.getvalue()
    if big:
        reps = max(1, (1 << 21) // max(1, len(data)))
        data = data * reps  # >1 MB -> multithreaded chunked parse
    with open(path, "w", newline="") as f:
        f.write(data)


def _sklearn_parse(path: str):
    from sklearn.datasets import load_svmlight_file

    with open(path, "rb") as f:
        x, y, qids = load_svmlight_file(f, query_id=True)
    return (np.asarray(x.todense(), dtype=np.float32),
            y.astype(np.float32), qids.astype(np.int64))


def run_writer_case(seed: int):
    """Round-trip fuzz of the native WRITER: random arrays (extreme float32
    magnitudes, explicit zeros, negative labels, int64 qids) -> native
    write -> parse through BOTH parsers -> must equal the source bitwise.
    Returns a list of discrepancy strings."""
    from allrank_tpu.data.native import parse_svmlight_native, write_svmlight_native

    rng = np.random.RandomState(seed)
    n, f = rng.randint(1, 80), rng.randint(1, 40)
    X = (rng.randn(n, f) * 10.0 ** rng.randint(-20, 20, size=(n, f))
         ).astype(np.float32)
    X[rng.rand(n, f) < 0.4] = 0.0  # sparsity (zeros omitted on write)
    # the parser needs at least one non-zero column to detect n_features;
    # pin the last column so shapes round-trip
    X[rng.randint(n), f - 1] = 1.0
    y = rng.choice([0.0, 1.0, 2.0, -1.0, 3.5], size=n).astype(np.float32)
    qids = np.sort(rng.randint(0, 1 << 40, size=n)).astype(np.int64)

    problems = []
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "w.txt")
        if not write_svmlight_native(X, y, qids, path):
            return ["native writer unavailable"]
        native = parse_svmlight_native(path)
        if native is None:
            return ["native parser unavailable"]
        for label, parsed in (("native", native), ("sklearn", _sklearn_parse(path))):
            for name, a, b in zip(("X", "y", "qids"), parsed, (X, y, qids)):
                if a.shape != b.shape or not np.array_equal(a, b):
                    problems.append(
                        f"writer seed {seed}: {label} {name} mismatch")
    return problems


def run_case(seed: int, big: bool = False):
    """Returns a list of discrepancy strings (empty = parity)."""
    from allrank_tpu.data.native import parse_svmlight_native

    rng = np.random.RandomState(seed)
    problems = []
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "case.txt")
        gen_file(rng, path, big=big)
        native = parse_svmlight_native(path)
        if native is None:
            return ["native parser unavailable"]
        ref = _sklearn_parse(path)
        for name, a, b in zip(("X", "y", "qids"), native, ref):
            if a.shape != b.shape:
                problems.append(
                    f"seed {seed}: {name} shape {a.shape} != {b.shape}")
            elif not np.array_equal(a, b):
                n_bad = int(np.sum(a != b))
                problems.append(
                    f"seed {seed}: {name} differs at {n_bad} positions "
                    f"(first: {np.argwhere(a != b)[0].tolist()})")
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    failures = []
    for i in range(args.cases):
        failures += run_case(args.seed + i)
        failures += run_writer_case(args.seed + i)
    failures += run_case(args.seed + 10_000, big=True)  # multithreaded path
    n_total = 2 * args.cases + 1
    if failures:
        print(f"FAIL: {len(failures)} discrepancies over {n_total} files:")
        for f in failures[:20]:
            print("  " + f)
        return 1
    print(f"OK: native parser/writer bitwise-match sklearn on {n_total} "
          f"fuzzed files (incl. {args.cases} writer round-trips and 1 "
          f"multithreaded >1MB case)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
