"""ctypes bridge to the native analyzer (native/analyzer.cpp).

Builds the shared library on first use with g++ (no pybind11 in this
image; plain C ABI + ctypes).  Produces bit-identical term buckets to the
Python Analyzer — verified in tests — at native speed for the streaming
ingest path.  Falls back cleanly when a compiler is unavailable.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                    "native", "analyzer.cpp")
_LIB_DIR = os.path.join(os.path.dirname(_SRC), "build")
_LIB = os.path.join(_LIB_DIR, "libanalyzer.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> bool:
    os.makedirs(_LIB_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        logger.warning("native analyzer build failed: %s", e)
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        needs_build = not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        )
        if needs_build and not _build():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError as e:
            logger.warning("native analyzer load failed: %s", e)
            _load_failed = True
            return None
        lib.analyze_docs.restype = ctypes.c_int
        lib.analyze_docs.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int, ctypes.c_uint32, ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def batch_doc_entries(
    texts: Sequence[str], slots: int, vocab_size: int,
    use_stopwords: bool = True,
) -> Optional[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Native equivalent of Analyzer.batch_doc_entries; None if no lib."""
    lib = load()
    if lib is None:
        return None
    n = len(texts)
    encoded = [t.encode("utf-8") for t in texts]
    offsets = np.zeros(n + 1, np.int64)
    for i, e in enumerate(encoded):
        offsets[i + 1] = offsets[i] + len(e)
    blob = b"".join(encoded)
    terms = np.empty((n, slots), np.int32)
    tfs = np.empty((n, slots), np.float32)
    lens = np.empty(n, np.float32)
    rc = lib.analyze_docs(blob, offsets, n, vocab_size, slots,
                          1 if use_stopwords else 0, terms, tfs, lens)
    if rc != 0:
        raise ValueError(f"analyze_docs failed with code {rc}")
    return terms, tfs, lens
