"""From-scratch build proof for ALL THREE native libraries.

The Dockerfile relies on ``make native`` / the auto-build fallback compiling
``libsvm_parser.so``, ``libsvm_writer.so`` and ``slate_assembler.so`` inside
a fresh container; this test performs the identical build (same sources,
same flags, clean directory) and loads each result, so a toolchain or source
regression fails CI instead of the container build."""

import ctypes
import os
import shutil

import pytest

from allrank_tpu.data.native import _ensure_built

NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "allrank_tpu", "native",
)
SOURCES = ["libsvm_parser.cpp", "libsvm_writer.cpp", "slate_assembler.cpp"]
ENTRY_SYMBOLS = {
    "libsvm_parser.cpp": "parse_svmlight_count",
    "libsvm_writer.cpp": "write_svmlight",
    "slate_assembler.cpp": "assemble_rows",
}


@pytest.mark.parametrize("source", SOURCES)
def test_builds_from_clean_checkout_and_loads(source, tmp_path):
    if shutil.which("g++") is None and shutil.which("c++") is None:
        pytest.skip("no C++ compiler on PATH")
    src = os.path.join(NATIVE_DIR, source)
    assert os.path.exists(src), f"missing native source {source}"
    shutil.copy(src, tmp_path / source)
    so_path = str(tmp_path / (source[:-4] + ".so"))

    built = _ensure_built(so_path)
    assert built == so_path, f"auto-build failed for {source}"
    lib = ctypes.CDLL(built)
    assert hasattr(lib, ENTRY_SYMBOLS[source])
