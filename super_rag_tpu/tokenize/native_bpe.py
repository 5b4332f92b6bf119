"""ctypes bridge to the native BPE encoder (native/bpe.cpp).

Same pattern as tokenize/native.py: builds the shared library on first
use with g++ (no pybind11 in this image), produces bit-identical ids to
models/subword.BPETokenizer._text_ids — enforced by
tests/test_native_bpe.py — and falls back cleanly when no compiler is
available or SUPER_RAG_NO_NATIVE_BPE=1.
"""

from __future__ import annotations

import ctypes
import logging
import os
import struct
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                    "native", "bpe.cpp")
_LIB_DIR = os.path.join(os.path.dirname(_SRC), "build")
_LIB = os.path.join(_LIB_DIR, "libbpe.so")

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
        logger.warning("native bpe build failed: %s", e)
        return False


def load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if os.environ.get("SUPER_RAG_NO_NATIVE_BPE") == "1":
        return None
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
            logger.warning("native bpe load failed: %s", e)
            _load_failed = True
            return None
        lib.bpe_create.restype = ctypes.c_void_p
        lib.bpe_create.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.bpe_destroy.argtypes = [ctypes.c_void_p]
        lib.bpe_encode.restype = ctypes.c_int64
        lib.bpe_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def _pack_vocab(tokens: Sequence[str],
                merges: Sequence[tuple[str, str]]) -> bytes:
    out = [struct.pack("<ii", len(tokens), len(merges))]
    for t in tokens:
        b = t.encode("utf-8")
        out.append(struct.pack("<i", len(b)))
        out.append(b)
    for a, b_ in merges:
        for s in (a, b_):
            e = s.encode("utf-8")
            out.append(struct.pack("<i", len(e)))
            out.append(e)
    return b"".join(out)


class NativeBPE:
    """Owns one native encoder handle for a trained vocabulary."""

    def __init__(self, handle: int, lib: ctypes.CDLL):
        self._handle = handle
        self._lib = lib

    @classmethod
    def create(cls, tokens: Sequence[str],
               merges: Sequence[tuple[str, str]]) -> Optional["NativeBPE"]:
        lib = load()
        if lib is None:
            return None
        blob = _pack_vocab(tokens, merges)
        handle = lib.bpe_create(blob, len(blob))
        if not handle:
            logger.warning("native bpe rejected the vocab blob")
            return None
        return cls(handle, lib)

    def encode(self, text: str) -> np.ndarray:
        data = text.encode("utf-8")
        cap = 2 * len(data) + 8
        out = np.empty(cap, np.int32)
        n = self._lib.bpe_encode(
            self._handle, data, len(data),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap,
        )
        if n < 0:  # cannot happen with the 2n+8 bound; belt and braces
            raise RuntimeError("native bpe output overflow")
        return out[:n]

    def __del__(self):  # noqa: D105
        lib, handle = getattr(self, "_lib", None), getattr(self, "_handle", 0)
        if lib is not None and handle:
            try:
                lib.bpe_destroy(handle)
            except Exception:  # noqa: BLE001 — interpreter teardown
                pass
