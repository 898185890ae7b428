"""Native (C++) runtime components, exposed via ctypes.

The compute path is JAX/XLA/Pallas; the host-side runtime pieces that the
reference does in slow per-row Python — WordPiece tokenization of serialized
sensor rows (get_embedding.py:113-116) — are C++ here. The shared library is
built on demand with g++ -O3 (cached next to the sources; rebuilt when the
source is newer) and every entry point has a pure-Python fallback, so the
package works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "_native.so")
_SRC = os.path.join(_DIR, "wordpiece.cpp")

_lib = None
_build_error: Optional[str] = None


def _ensure_built():
    global _lib, _build_error
    if _lib is not None or _build_error is not None:
        return _lib
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        lib.wp_create.restype = ctypes.c_void_p
        lib.wp_create.argtypes = [ctypes.c_char_p] + [ctypes.c_int] * 4
        lib.wp_destroy.argtypes = [ctypes.c_void_p]
        lib.wp_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.wp_encode_batch.restype = ctypes.c_int
        lib.wp_encode_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
    except Exception as e:  # toolchain missing / build failure => fallback
        _build_error = str(e)
        _lib = None
    return _lib


def available() -> bool:
    return _ensure_built() is not None


class NativeWordPiece:
    """ctypes wrapper over the C++ WordPiece with the same encode contract
    as data.tokenizer.WordPiece (ids + attention mask, [CLS]/[SEP]/pad)."""

    def __init__(self, vocab: dict, cls_id: int, sep_id: int, pad_id: int,
                 unk_id: int, word_memo: Optional[dict] = None):
        lib = _ensure_built()
        if lib is None:
            raise RuntimeError(f"native build unavailable: {_build_error}")
        self._lib = lib
        lines = [f"{k}\t{v}" for k, v in vocab.items()]
        # memo entries are comma-terminated id lists (see wp_create): the
        # exact word->ids table RecoveredWordPiece carries
        for w, run in (word_memo or {}).items():
            if run:
                lines.append(f"{w}\t{','.join(str(i) for i in run)},")
        blob = "\n".join(lines).encode()
        self._h = lib.wp_create(blob, cls_id, sep_id, pad_id, unk_id)
        self.pad_id = pad_id

    def __del__(self):
        if getattr(self, "_h", None) and self._lib:
            self._lib.wp_destroy(self._h)
            self._h = None

    def encode_batch(self, texts, max_length: int = 512):
        n = len(texts)
        ids = np.empty((n, max_length), np.int32)
        mask = np.empty((n, max_length), np.int32)
        blob = "\n".join(texts).encode()
        got = self._lib.wp_encode_batch(
            self._h, blob, max_length,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        assert got == n, (got, n)
        return ids, mask

    def encode(self, text: str, max_length: int = 512):
        ids, mask = self.encode_batch([text], max_length)
        return ids[0], mask[0]

    @staticmethod
    def from_wordpiece(tok) -> "NativeWordPiece":
        """Build from a data.tokenizer.WordPiece. A RecoveredWordPiece's
        word memo is passed through whole (exact id runs for observed words,
        matching the Python engine verbatim); unseen words use greedy
        longest-match over the piece vocab, as in Python."""
        return NativeWordPiece(
            dict(tok.vocab), tok.cls_id, tok.sep_id, tok.pad_id, tok.unk_id,
            word_memo=getattr(tok, "word_memo", None),
        )
