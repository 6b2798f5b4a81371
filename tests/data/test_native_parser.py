"""Native C++ svmlight parser: exact parity with the sklearn reader.

Skipped when the shared library hasn't been built (``make native``).
"""

import os

import numpy as np
import pytest

from allrank_tpu.data.dataset import _parse_svmlight_sklearn
from allrank_tpu.data.native import parse_svmlight_native


needs_native = pytest.mark.skipif(
    parse_svmlight_native(__file__) is None
    and not os.path.exists(
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "allrank_tpu", "native",
            "libsvm_parser.so")
    ),
    reason="native parser not built (make native)",
)


def _write_and_compare(tmp_path, content: str):
    path = str(tmp_path / "data.txt")
    with open(path, "w") as f:
        f.write(content)
    native = parse_svmlight_native(path)
    assert native is not None, "native parser failed"
    with open(path, "rb") as f:
        X_ref, y_ref, q_ref = _parse_svmlight_sklearn(f)
    X, y, q = native
    np.testing.assert_array_equal(y, y_ref)
    np.testing.assert_array_equal(q, q_ref)
    np.testing.assert_allclose(X, X_ref, rtol=1e-6, atol=1e-7)


@needs_native
def test_native_matches_sklearn_one_based(tmp_path):
    _write_and_compare(
        tmp_path,
        "2 qid:1 1:0.5 3:-1.25 5:3e-2\n"
        "0 qid:1 2:1.0 5:0.125\n"
        "1 qid:2 1:-0.5 4:2.5\n",
    )


@needs_native
def test_native_matches_sklearn_zero_based(tmp_path):
    _write_and_compare(
        tmp_path,
        "1 qid:7 0:1.5 2:-0.5\n"
        "3 qid:8 1:2.0 3:0.25\n",
    )


@needs_native
def test_native_handles_comments_and_blank_lines(tmp_path):
    _write_and_compare(
        tmp_path,
        "2 qid:1 1:0.5 2:1.0 # a comment\n"
        "\n"
        "0 qid:2 1:-1.0 2:0.0\n",
    )


@needs_native
def test_native_matches_sklearn_on_generated_dataset(tmp_path):
    from allrank_tpu.data.dummy import write_dummy_dataset

    d = write_dummy_dataset(str(tmp_path), num_queries=30, results_len=8,
                            num_features=12)
    path = os.path.join(d, "train.txt")
    native = parse_svmlight_native(path)
    assert native is not None
    with open(path, "rb") as f:
        X_ref, y_ref, q_ref = _parse_svmlight_sklearn(f)
    X, y, q = native
    np.testing.assert_array_equal(y, y_ref)
    np.testing.assert_array_equal(q, q_ref)
    np.testing.assert_allclose(X, X_ref, rtol=1e-6, atol=1e-7)


@needs_native
def test_native_missing_file_returns_none():
    assert parse_svmlight_native("/no/such/file.txt") is None


class TestNativeWriter:
    """The C++ writer must be value-exact and line-grammar-compatible with
    sklearn's dump (zero-based indices, zeros omitted)."""

    def _data(self, n=50, f=7, seed=0):
        rng = np.random.RandomState(seed)
        X = rng.randn(n, f).astype(np.float32)
        X[rng.rand(n, f) < 0.1] = 0.0  # exercise the zero-skip path
        y = rng.randint(0, 5, n).astype(np.float32)
        qid = np.repeat(np.arange(n // 5), 5).astype(np.int64)
        return X, y, qid

    def test_roundtrip_exact_vs_sklearn(self, tmp_path):
        from sklearn.datasets import load_svmlight_file

        from allrank_tpu.data.native import write_svmlight_native

        X, y, qid = self._data()
        native_path = str(tmp_path / "native.txt")
        assert write_svmlight_native(X, y, qid, native_path), (
            "native writer not built — run `make native`"
        )
        Xn, yn, qn = load_svmlight_file(native_path, query_id=True,
                                        n_features=X.shape[1])
        np.testing.assert_array_equal(
            np.asarray(Xn.todense(), dtype=np.float32), X)
        np.testing.assert_array_equal(yn.astype(np.float32), y)
        np.testing.assert_array_equal(qn, qid)

    def test_write_to_libsvm_strips_padding_via_native(self, tmp_path):
        from sklearn.datasets import load_svmlight_file

        from allrank_tpu.data.saving import write_to_libsvm_without_masked

        rng = np.random.RandomState(1)
        slates_x = [rng.randn(4, 5).astype(np.float32) for _ in range(3)]
        slates_y = [np.array([2.0, 0.0, -1.0, -1.0], dtype=np.float32),
                    np.array([1.0, 1.0, 3.0, -1.0], dtype=np.float32),
                    np.array([0.0, 4.0, 2.0, 1.0], dtype=np.float32)]
        path = str(tmp_path / "out.txt")
        write_to_libsvm_without_masked(path, slates_x, slates_y)
        X, y, qid = load_svmlight_file(path, query_id=True, n_features=5)
        assert X.shape[0] == 2 + 3 + 4
        np.testing.assert_array_equal(qid, [0, 0, 1, 1, 1, 2, 2, 2, 2])
        np.testing.assert_array_equal(
            np.asarray(X.todense(), dtype=np.float32)[:2], slates_x[0][:2])
        assert (y != -1.0).all()


class TestEnsureBuiltFallback:
    """Any filesystem/toolchain failure in the on-demand build must degrade
    to the pure-python path (return None), never crash the data pipeline."""

    def test_readonly_package_dir_degrades_to_none(self, tmp_path, monkeypatch):
        import tempfile

        import allrank_tpu.data.native as native

        (tmp_path / "thing.cpp").write_text("int main(){return 0;}\n")

        def deny(*a, **k):
            raise PermissionError("read-only package dir")

        # chmod can't model this under root; simulate the unwritable dir
        monkeypatch.setattr(tempfile, "mkstemp", deny)
        assert native._ensure_built(str(tmp_path / "thing.so")) is None

    def test_broken_source_logs_compiler_stderr(self, tmp_path, caplog):
        import logging

        import allrank_tpu.data.native as native

        (tmp_path / "broken.cpp").write_text("this is not C++\n")
        with caplog.at_level(logging.WARNING, logger="allrank_tpu"):
            assert native._ensure_built(str(tmp_path / "broken.so")) is None
        assert any("native build" in r.message and "falling back" in r.message
                   for r in caplog.records)
