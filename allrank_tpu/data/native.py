"""ctypes bridge to the native C++ svmlight parser (native/libsvm_parser.cpp).

The parser is the data path's hot spot on multi-GB MSLR-style files; the C++
implementation is ~an order of magnitude faster than the pure-python reader.
The shared libraries auto-build from their .cpp sources on first use when
missing (fresh checkouts need no manual step); ``make native`` prebuilds
them, and callers fall back to the sklearn/python paths when no compiler is
available or ``ALLRANK_TPU_NO_NATIVE_BUILD`` is set.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB = None
_LIB_TRIED = False

_CXX_FLAGS = ["-O3", "-std=c++17", "-shared", "-fPIC", "-pthread", "-Wall"]


def _ensure_built(so_path: str) -> Optional[str]:
    """Build ``<name>.so`` from its sibling ``<name>.cpp`` on first use when
    missing (same flags as the Makefile target), so fresh checkouts work
    without a manual ``make native``. Compiles to a temp file and renames
    atomically (concurrent test workers race safely). Returns the .so path,
    or None when the source is absent or compilation fails (callers fall
    back to the pure-python/sklearn paths)."""
    if os.path.exists(so_path):
        return so_path
    cpp = so_path[:-3] + ".cpp"
    if not os.path.exists(cpp) or os.environ.get("ALLRANK_TPU_NO_NATIVE_BUILD"):
        return None
    import shutil
    import subprocess
    import tempfile

    gxx = shutil.which("g++") or shutil.which("c++")
    if gxx is None:
        return None
    tmp = None
    try:
        # mkstemp itself can fail (read-only package dir, e.g. a system
        # install under a non-root user) — that must degrade to the
        # pure-python path too, not crash the data pipeline.
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=os.path.dirname(so_path))
        os.close(fd)
        subprocess.run(
            [gxx, *_CXX_FLAGS, "-o", tmp, cpp],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, so_path)
        return so_path
    except Exception as exc:
        # Surface the degraded mode once: a silently broken toolchain would
        # otherwise drop users onto the ~10x slower python parser with no clue.
        import logging

        stderr = getattr(exc, "stderr", b"") or b""
        logging.getLogger("allrank_tpu").warning(
            "native build of %s failed (%s%s); falling back to the pure-python path",
            os.path.basename(so_path),
            type(exc).__name__,
            (": " + stderr.decode(errors="replace")[:500]) if stderr else "",
        )
        if tmp is not None and os.path.exists(tmp):
            try:
                os.unlink(tmp)
            except OSError:
                pass
        return None


def _find_library() -> Optional[str]:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    candidates = [
        os.path.join(here, "native", "libsvm_parser.so"),
        os.path.join(os.path.dirname(here), "native", "libsvm_parser.so"),
    ]
    for c in candidates:
        if os.path.exists(c):
            return c
    return _ensure_built(candidates[0])


def _load():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = _find_library()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.parse_svmlight_count.restype = ctypes.c_int64
        lib.parse_svmlight_count.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),  # n_rows
            ctypes.POINTER(ctypes.c_int64),  # n_features
        ]
        lib.parse_svmlight_fill.restype = ctypes.c_int64
        lib.parse_svmlight_fill.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,  # n_rows
            ctypes.c_int64,  # n_features
            np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS"),
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def parse_svmlight_native(
    path: str, x_alloc=None,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Parse with the C++ extension; None if unavailable (caller falls back).

    ``x_alloc(n_rows, n_features)`` optionally supplies the zero-initialized
    C-contiguous float32 [N, F] buffer the fill pass writes into — the
    binary cache passes a writable ``np.memmap`` over the future ``.npy``
    sidecar so a >RAM corpus parses without the dense matrix ever existing
    in host RAM (the reference densifies in RAM unconditionally —
    reference: allrank/data/dataset_loading.py:118-133)."""
    lib = _load()
    if lib is None or not os.path.exists(path):
        return None

    n_rows = ctypes.c_int64()
    n_features = ctypes.c_int64()
    rc = lib.parse_svmlight_count(
        path.encode(), ctypes.byref(n_rows), ctypes.byref(n_features)
    )
    if rc != 0:
        return None

    if x_alloc is None:
        X = np.zeros((n_rows.value, n_features.value), dtype=np.float32)
    else:
        X = x_alloc(n_rows.value, n_features.value)
    y = np.zeros((n_rows.value,), dtype=np.float32)
    qids = np.zeros((n_rows.value,), dtype=np.int64)
    rc = lib.parse_svmlight_fill(
        path.encode(), n_rows.value, n_features.value, X, y, qids
    )
    if rc != 0:
        return None
    return X, y, qids


_ASM = None
_ASM_TRIED = False


def _load_assembler():
    global _ASM, _ASM_TRIED
    if _ASM_TRIED:
        return _ASM
    _ASM_TRIED = True
    if os.environ.get("ALLRANK_TPU_NO_NATIVE_ASSEMBLY"):
        return None
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "native", "slate_assembler.so")
    if _ensure_built(path) is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        i64p = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")
        lib.assemble_rows.restype = ctypes.c_int64
        lib.assemble_rows.argtypes = [
            np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS"),
            i64p, i64p, i64p, i64p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_uint64, ctypes.c_int64,
            np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS"),
        ]
        _ASM = lib
    except OSError:
        _ASM = None
    return _ASM


def assemble_rows_native(
    X, y, offsets, rows, slates, rng_ids, n_features, slate_length,
    seed_base, n_threads, out_x, out_y, out_idx, out_mask,
) -> bool:
    """Fill batch rows with the C++ assembler (native/slate_assembler.cpp).

    Buffers must arrive pre-initialized (zeros / padded values). Returns
    False when the shared library is unavailable (caller falls back to the
    Python row loop)."""
    lib = _load_assembler()
    if lib is None:
        return False
    lib.assemble_rows(
        X, y, offsets, rows, slates, rng_ids,
        len(rows), n_features, slate_length,
        seed_base & 0xFFFFFFFFFFFFFFFF, max(1, int(n_threads)),
        out_x, out_y, out_idx, out_mask.view(np.uint8),
    )
    return True


_WRITER = None
_WRITER_TRIED = False


def _load_writer():
    global _WRITER, _WRITER_TRIED
    if _WRITER_TRIED:
        return _WRITER
    _WRITER_TRIED = True
    if os.environ.get("ALLRANK_TPU_NO_NATIVE_WRITER"):
        return None
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "native", "libsvm_writer.so")
    if _ensure_built(path) is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.write_svmlight.restype = ctypes.c_int64
        lib.write_svmlight.argtypes = [
            np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_char_p,
            ctypes.c_int64,
        ]
        _WRITER = lib
    except OSError:
        _WRITER = None
    return _WRITER


def write_svmlight_native(
    X: np.ndarray, y: np.ndarray, qid: np.ndarray, path: str,
    n_threads: int = 0,
) -> bool:
    """Write with the C++ writer (native/libsvm_writer.cpp); False if the
    shared library is unavailable (caller falls back to sklearn).

    Same line grammar as sklearn's dump_svmlight_file defaults (zero-based
    indices, zeros omitted); float values in shortest round-trip form."""
    lib = _load_writer()
    if lib is None:
        return False
    X = np.ascontiguousarray(X, dtype=np.float32)
    y = np.ascontiguousarray(y, dtype=np.float32)
    qid = np.ascontiguousarray(qid, dtype=np.int64)
    if n_threads <= 0:
        n_threads = min(8, os.cpu_count() or 1)
    rc = lib.write_svmlight(
        X, y, qid, X.shape[0], X.shape[1], path.encode(), n_threads
    )
    return rc == 0
