"""ctypes bridge to the native postings builder (native/postings.cpp).

Same pattern as tokenize/native.py: build on first use with g++, plain C
ABI, clean fallback to the numpy path when no compiler is available.
Bit-identical to build_inverted's lexsort semantics (verified in
tests/test_native_postings.py).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                    "native", "postings.cpp")
_LIB_DIR = os.path.join(os.path.dirname(_SRC), "build")
_LIB = os.path.join(_LIB_DIR, "libpostings.so")

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
        logger.warning("native postings build failed: %s", e)
        return False


def load() -> Optional[ctypes.CDLL]:
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
            logger.warning("native postings load failed: %s", e)
            _load_failed = True
            return None
        lib.build_postings.restype = ctypes.c_int
        lib.build_postings.argtypes = [
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def build_postings(
    terms: np.ndarray,  # [N, L] int32 (pad >= vocab)
    impact: np.ndarray,  # [N, L] float32
    vocab_size: int,
    postings_per_term: int,
) -> Optional[tuple[np.ndarray, np.ndarray]]:
    """Native top-P postings per term; None when the lib is unavailable."""
    lib = load()
    if lib is None:
        return None
    terms = np.ascontiguousarray(terms, np.int32)
    impact = np.ascontiguousarray(impact, np.float32)
    n, slots = terms.shape
    ids = np.full((vocab_size + 1, postings_per_term), -1, np.int32)
    imp = np.zeros((vocab_size + 1, postings_per_term), np.float32)
    rc = lib.build_postings(terms.reshape(-1), impact.reshape(-1),
                            n, slots, vocab_size, postings_per_term,
                            ids, imp)
    if rc != 0:
        raise ValueError(f"build_postings failed with code {rc}")
    return ids, imp
