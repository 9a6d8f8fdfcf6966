"""ctypes bindings for the native C++ word tokenizer (EXAMPLE — demoted
from the package in round 5; see README.md in this directory).

Compiles ``tokenizer.cpp`` with the system C++ toolchain on first use
(cached as a shared object next to the source) and exposes a
WordTokenizer-compatible API.  The supported tokenizer is the pure-Python
``modules.text.WordTokenizer``; this exists for hosts where a measured
multi-core win justifies the compiled path.
"""

from __future__ import annotations

import ctypes
import os
import sys
import threading
from typing import Iterable, Sequence

import numpy as np

# sibling imports (native_build) work no matter where this is run from
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

__all__ = ["NativeWordTokenizer", "native_toolchain_available"]

_SRC = os.path.join(os.path.dirname(__file__), "tokenizer.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_tokenizer.so")
_build_lock = threading.Lock()
_lib = None


def native_toolchain_available() -> bool:
    from native_build import toolchain_available
    return toolchain_available()


def _load():
    global _lib
    with _build_lock:
        if _lib is not None:
            return _lib
        from native_build import build_native_lib
        lib = build_native_lib(_SRC, _SO)
        lib.tok_create.restype = ctypes.c_void_p
        lib.tok_create.argtypes = [ctypes.c_char_p]
        lib.tok_vocab_size.restype = ctypes.c_int
        lib.tok_vocab_size.argtypes = [ctypes.c_void_p]
        lib.tok_encode_batch.restype = None
        lib.tok_encode_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
        lib.tok_destroy.restype = None
        lib.tok_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


class NativeWordTokenizer:
    """C++-backed vocabulary-file word tokenizer (pad=0, unk=1).

    Same id assignment as modules.text.WordTokenizer (sorted unique words
    from index 2), so the two are interchangeable.
    """

    PAD = 0
    UNK = 1

    def __init__(self, vocab: Iterable[str], max_length: int = 16):
        self._lib = _load()
        blob = "\n".join(vocab).encode("utf-8")
        self._handle = self._lib.tok_create(blob)
        if not self._handle:
            raise RuntimeError("tok_create failed")
        self.max_length = max_length
        self.vocab_size = self._lib.tok_vocab_size(self._handle)

    @classmethod
    def from_corpus(cls, texts: Sequence[str], max_length: int = 16):
        vocab = set()
        for t in texts:
            vocab.update(t.lower().split())
        return cls(sorted(vocab), max_length=max_length)

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        n = len(texts)
        out = np.zeros((n, self.max_length), dtype=np.int32)
        # lowercase HERE with Python's full-Unicode str.lower(): the C++
        # side's std::tolower is ASCII-only, which would diverge from
        # WordTokenizer on non-ASCII text (e.g. 'É' -> unk)
        arr = (ctypes.c_char_p * n)(
            *[t.lower().encode("utf-8") for t in texts])
        self._lib.tok_encode_batch(
            self._handle, arr, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self.max_length)
        return out

    def encode(self, text: str):
        return self([text])[0].tolist()

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.tok_destroy(self._handle)
        except Exception:
            pass
