"""CI subset of the native-parser differential fuzz (tools/fuzz_libsvm.py):
seeded adversarial svmlight files must parse bitwise-identically through
the C++ parser and sklearn, including one >1 MB multithreaded case."""

import pytest

from allrank_tpu.data.native import parse_svmlight_native
from tools.fuzz_libsvm import run_case


def _native_available() -> bool:
    import os
    import tempfile

    fd, p = tempfile.mkstemp()
    os.write(fd, b"1 qid:1 1:0.5\n")
    os.close(fd)
    try:
        return parse_svmlight_native(p) is not None
    finally:
        os.unlink(p)


@pytest.mark.parametrize("seed", range(0, 25))
def test_fuzzed_file_parses_bitwise_like_sklearn(seed):
    if not _native_available():
        pytest.skip("native parser unavailable (no compiler?)")
    assert run_case(seed) == []


def test_multithreaded_big_file_parity():
    if not _native_available():
        pytest.skip("native parser unavailable (no compiler?)")
    assert run_case(77, big=True) == []


@pytest.mark.parametrize("seed", range(0, 10))
def test_writer_roundtrip_fuzz(seed):
    from tools.fuzz_libsvm import run_writer_case

    if not _native_available():
        pytest.skip("native parser unavailable (no compiler?)")
    assert run_writer_case(seed) == []


def test_writer_pins_index_base_when_column0_is_all_zero():
    """Regression (found by the fuzzer): a zero-based dump whose column 0
    is entirely zero used to auto-detect as one-based on re-read, shifting
    every column. Both the native writer and the sklearn fallback now emit
    one explicit `0:0` to pin the base."""
    import os
    import tempfile

    import numpy as np

    from allrank_tpu.data.saving import write_to_libsvm_without_masked

    X = np.zeros((3, 4), dtype=np.float32)
    X[:, 1] = [1.5, 2.5, 3.5]
    X[0, 3] = -1.0
    y = np.asarray([1.0, 0.0, 2.0], dtype=np.float32)

    for disable_native in (False, True):
        env = {} if not disable_native else {"ALLRANK_TPU_NO_NATIVE_WRITER": "1"}
        old = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            import allrank_tpu.data.native as native_mod

            native_mod._WRITER_TRIED = False
            with tempfile.TemporaryDirectory() as d:
                path = os.path.join(d, "o.txt")
                write_to_libsvm_without_masked(path, [X], [y])
                from allrank_tpu.data.dataset import parse_svmlight

                Xp, yp, qp = parse_svmlight(path)
                np.testing.assert_array_equal(Xp, X)
                np.testing.assert_array_equal(yp, y)
                assert "0:0" in open(path).readline()
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
            native_mod._WRITER_TRIED = False
