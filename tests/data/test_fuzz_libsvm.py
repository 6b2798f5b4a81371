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
