# -*- coding: utf-8 -*-
"""Native (C++) host-runtime components with pure-Python fallbacks.

The TPU compute path is JAX/XLA/Pallas; the host-side runtime around it is
native where it is hot, loaded via ctypes (no pybind11 dependency):

  * ``src/gather.cpp`` — threaded feature-table row gather (the reference's
    input bottleneck, drin/data.py:85-126),
  * ``src/wordpiece.cpp`` — fused BERT tokenization (BasicTokenizer pass
    driven by a Python-built unicodedata table + WordPiece greedy match;
    the reference leans on HF's Rust tokenizers here, SURVEY §2.12).
    Measured 10× over the pure-Python tokenizer, byte-exact, with
    automatic Python fallback for inputs outside the fast path.

Every entry point degrades to the Python/numpy implementation when the
shared library has not been built, so the framework works out of the box.
Concurrency is gated by a ThreadSanitizer stress binary (``make
tsan_stress``; tests/test_native.py).

Build: ``make -C drin_tpu/native`` (or ``python -m drin_tpu.native.build``).
"""

from __future__ import annotations

import ctypes
import os
import threading

import numpy as np

_LIB = None
_TRIED = False
_LOAD_LOCK = threading.Lock()


def _load_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    with _LOAD_LOCK:
        return _load_lib_locked()


def _load_lib_locked():
    # under _LOAD_LOCK: without it, a second thread racing the first load
    # could observe _TRIED=True while _LIB is still unassigned and
    # permanently bind its tokenizer to the slow Python path
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    path = os.path.join(os.path.dirname(__file__), "libdrin_native.so")
    if os.path.exists(path):
        try:
            lib = ctypes.CDLL(path)
            lib.drin_gather_rows.argtypes = [
                ctypes.c_void_p,  # src
                ctypes.c_void_p,  # dst
                ctypes.POINTER(ctypes.c_int32),  # row indices
                ctypes.c_int64,  # n rows to gather
                ctypes.c_int64,  # row nbytes
                ctypes.c_int32,  # n threads
            ]
            lib.drin_gather_rows.restype = ctypes.c_int32
            try:  # tokenizer entry points (a stale prebuilt .so may lack
                # some of them — degrade to gather-only, never crash callers)
                lib.drin_wp_build.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                              ctypes.c_int32]
                lib.drin_wp_build.restype = ctypes.c_void_p
                lib.drin_wp_free.argtypes = [ctypes.c_void_p]
                lib.drin_wp_tokenize.argtypes = [
                    ctypes.c_void_p,  # vocab handle
                    ctypes.c_char_p,  # concatenated utf-8 words
                    ctypes.POINTER(ctypes.c_int64),  # word byte offsets [n+1]
                    ctypes.c_int64,  # n words
                    ctypes.c_int32,  # unk id
                    ctypes.POINTER(ctypes.c_int32),  # out ids
                    ctypes.c_int64,  # out capacity
                    ctypes.POINTER(ctypes.c_int64),  # out per-word cumulative ends
                ]
                lib.drin_wp_tokenize.restype = ctypes.c_int64
                lib.drin_bert_encode.argtypes = [
                    ctypes.c_void_p,  # vocab handle
                    ctypes.c_char_p,  # BMP classification flags [65536]
                    ctypes.c_char_p,  # utf-8 text
                    ctypes.c_int64,  # text byte length
                    ctypes.c_int32,  # unk id
                    ctypes.POINTER(ctypes.c_int32),  # out ids
                    ctypes.c_int64,  # out capacity
                ]
                lib.drin_bert_encode.restype = ctypes.c_int64
                lib.drin_bert_encode_batch.argtypes = [
                    ctypes.c_void_p,  # vocab handle
                    ctypes.c_char_p,  # BMP classification flags [65536]
                    ctypes.c_char_p,  # concatenated utf-8 texts
                    ctypes.POINTER(ctypes.c_int64),  # text byte offsets [n+1]
                    ctypes.c_int64,  # n texts
                    ctypes.c_int32,  # unk id
                    ctypes.POINTER(ctypes.c_int32),  # out ids
                    ctypes.c_int64,  # out capacity
                    ctypes.POINTER(ctypes.c_int64),  # per-text cumulative ends
                ]
                lib.drin_bert_encode_batch.restype = ctypes.c_int64
                lib._has_wordpiece = True
            except AttributeError:
                lib._has_wordpiece = False
            _LIB = lib
        except OSError:
            _LIB = None
    _TRIED = True  # publish only after _LIB has its final value
    return _LIB


def native_available() -> bool:
    return _load_lib() is not None


def gather_rows(table: np.ndarray, rows: np.ndarray) -> np.ndarray:
    """Gather ``table[rows]`` where ``rows`` may be multi-dimensional.

    Output shape: ``rows.shape + table.shape[1:]``.  Uses the threaded C++
    gather for large contiguous tables; numpy fancy-indexing otherwise."""
    rows = np.asarray(rows)
    lib = _load_lib()
    flat64 = rows.reshape(-1)
    row_nbytes = int(np.prod(table.shape[1:])) * table.dtype.itemsize
    # The native path needs a real contiguous buffer (mmap-backed arrays are
    # fine: the pointer is valid; the OS pages data in on access).  It also
    # must see only in-range non-negative int32 indices — the C++ side does
    # raw pointer arithmetic with no bounds checks, so negative/OOB rows
    # (corrupt store, -1 sentinels) or int32-overflowing indices route to
    # the numpy path, which raises/wraps identically with or without the
    # .so built.
    in_range = (flat64.size == 0
                or (int(flat64.min()) >= 0
                    and int(flat64.max()) < table.shape[0] and
                    int(flat64.max()) <= np.iinfo(np.int32).max))
    use_native = (
        lib is not None
        and isinstance(table, np.ndarray)
        # bool masks / float indices mean numpy SELECTION semantics (or an
        # IndexError), not row-number arithmetic — never reinterpret them
        and np.issubdtype(flat64.dtype, np.integer)
        and table.flags["C_CONTIGUOUS"]
        and row_nbytes >= 256  # tiny rows: numpy is already fine
        and flat64.size >= 64
        and in_range
    )
    if not use_native:
        return np.ascontiguousarray(table[rows])
    flat = flat64.astype(np.int32, copy=False)
    out = np.empty((flat.size,) + table.shape[1:], dtype=table.dtype)
    idx = np.ascontiguousarray(flat)
    nthreads = min(8, os.cpu_count() or 1)
    rc = lib.drin_gather_rows(
        table.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(flat.size),
        ctypes.c_int64(row_nbytes),
        ctypes.c_int32(nthreads),
    )
    if rc != 0:  # defensive; the C++ side only fails on bad args
        return np.ascontiguousarray(table[rows])
    return out.reshape(rows.shape + table.shape[1:])


def _vocab_buffer(vocab: dict) -> bytes:
    """'\n'-joined tokens in id order for drin_wp_build; raises ValueError on
    non-contiguous/duplicate ids OR newline-containing tokens (the buffer is
    newline-delimited, so such a token would silently split into two native
    entries and shift every later id) so callers fall back to the Python
    matcher."""
    n = len(vocab)
    by_id = [None] * n
    for tok, i in vocab.items():
        if not (0 <= i < n) or by_id[i] is not None:
            raise ValueError("vocab ids must be contiguous 0..n-1 and unique")
        if "\n" in tok:
            raise ValueError(f"vocab token {tok!r} contains a newline")
        by_id[i] = tok
    return "\n".join(by_id).encode("utf-8")


class _VocabHandle:
    """Shared native vocab-handle lifecycle for the matcher classes: lib
    check, vocab build (NULL on native allocation failure -> raise so
    callers fall back to Python), and the free on GC."""

    def __init__(self, vocab: dict, unk_id: int, max_chars: int = 100):
        lib = _load_lib()
        if lib is None or not getattr(lib, "_has_wordpiece", False):
            raise RuntimeError("native library not built (make -C drin_tpu/native)")
        buf = _vocab_buffer(vocab)
        self._lib = lib
        self._handle = ctypes.c_void_p(lib.drin_wp_build(buf, len(buf), max_chars))
        if not self._handle:
            raise RuntimeError("native vocab build failed (allocation)")
        self._unk = int(unk_id)

    def __del__(self):
        lib = getattr(self, "_lib", None)
        h = getattr(self, "_handle", None)
        if lib is not None and h:
            lib.drin_wp_free(h)


class WordPieceNative(_VocabHandle):
    """Native greedy longest-match WordPiece over a fixed vocab
    (``src/wordpiece.cpp``; byte-exact vs text/wordpiece.WordPieceTokenizer).

    The vocab must have contiguous ids 0..n-1 (true for any vocab.txt-loaded
    or fabricated vocab); construction raises otherwise so callers fall back
    to the Python matcher.  ``tokenize_ids`` matches a list of pre-split
    words in ONE foreign call (the GIL is released for its duration)."""

    def tokenize_ids(self, words) -> list:
        """Vocab ids for the concatenation of WordPiece(word) over words."""
        if not words:
            return []
        enc = [w.encode("utf-8") for w in words]
        offsets = np.zeros(len(enc) + 1, np.int64)
        np.cumsum([len(b) for b in enc], out=offsets[1:])
        blob = b"".join(enc)
        cap = max(offsets[-1], len(enc)) + 8  # ids never exceed input bytes
        out = np.empty(int(cap), np.int32)
        ends = np.empty(len(enc), np.int64)
        total = self._lib.drin_wp_tokenize(
            self._handle, blob, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(enc), self._unk, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            int(cap), ends.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        if total < 0:  # NOT assert: -O must never turn this into garbage ids
            raise RuntimeError("native wordpiece output overflow (capacity bug)")
        return out[:total].tolist()


_BMP_FLAGS = None


def _bmp_flags() -> bytes:
    """BMP classification table for the native BasicTokenizer pass, built
    once per process from Python's own unicodedata — the native side never
    re-implements unicode categories, it consumes exactly the predicates
    text/wordpiece.py uses (flags: 1=whitespace 2=control 4=punctuation
    8=CJK 16=drop)."""
    global _BMP_FLAGS
    if _BMP_FLAGS is None:
        from drin_tpu.text.wordpiece import (_is_chinese_char, _is_control,
                                             _is_punctuation, _is_whitespace)

        flags = bytearray(0x10000)
        for cp in range(0x10000):
            ch = chr(cp)
            f = 0
            if cp == 0 or cp == 0xFFFD or _is_control(ch):
                f = 16
            elif _is_whitespace(ch):
                f = 1
            elif _is_chinese_char(cp):
                f = 8
            elif _is_punctuation(ch):
                f = 4
            flags[cp] = f
        _BMP_FLAGS = bytes(flags)
    return _BMP_FLAGS


class BertEncodeNative(_VocabHandle):
    """Fused native BasicTokenizer + WordPiece: raw text -> vocab ids in one
    GIL-releasing call (bert-base-cased semantics: no lowercasing).

    Texts containing 4-byte UTF-8 sequences (astral codepoints, outside the
    BMP flags table) return None — the caller falls back to the Python
    path, keeping byte-exactness for every input."""

    def __init__(self, vocab: dict, unk_id: int, max_chars: int = 100):
        super().__init__(vocab, unk_id, max_chars)
        self._flags = _bmp_flags()

    def encode_ids(self, text: str):
        try:
            blob = text.encode("utf-8")
        except UnicodeEncodeError:
            # lone surrogates (malformed JSON escapes survive json.loads as
            # U+D800-DFFF) are unencodable — the Python path drops them via
            # its control-char cleaner, so fall back instead of crashing
            return None
        if blob and max(blob) >= 0xF0:
            return None  # astral chars: Python path keeps exactness
        cap = len(blob) + 8
        out = np.empty(cap, np.int32)
        total = self._lib.drin_bert_encode(
            self._handle, self._flags, blob, len(blob), self._unk,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap)
        if total < 0:
            # -2: control/NUL/U+FFFD chars get REMOVED (word-splicing) by
            # the Python cleaner — not expressible over input spans
            # natively; -1: capacity (cannot happen by construction, but a
            # stale .so might disagree) — either way the Python path keeps
            # exactness.  NOT an assert: python -O would strip it and feed
            # uninitialized ids to the model.
            return None
        return out[:total].tolist()

    def encode_ids_batch(self, texts):
        """``encode_ids`` for many texts in ONE foreign call (per-call
        overhead dominates short candidate strings).  Returns a list with a
        per-text id list, or None at positions the native path can't
        express (astral chars, drop-class chars) — the caller re-encodes
        just those in Python."""
        n = len(texts)
        if n == 0:
            return []
        blobs = []
        skip = [False] * n
        for i, t in enumerate(texts):
            try:
                b = t.encode("utf-8")
            except UnicodeEncodeError:  # lone surrogates: Python fallback
                skip[i] = True
                b = b""
            if b and max(b) >= 0xF0:  # astral: Python fallback (C-speed scan)
                skip[i] = True
                b = b""
            blobs.append(b)
        offsets = np.zeros(n + 1, np.int64)
        np.cumsum([len(b) for b in blobs], out=offsets[1:])
        blob = b"".join(blobs)
        cap = int(offsets[-1]) + 8
        out = np.empty(cap, np.int32)
        ends = np.empty(n, np.int64)
        total = self._lib.drin_bert_encode_batch(
            self._handle, self._flags, blob,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
            self._unk, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cap, ends.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        if total < 0:  # capacity disagreement (stale .so): whole-batch
            return [None] * n  # Python fallback, never garbage ids
        res = []
        prev = 0
        for i in range(n):
            if skip[i] or ends[i] < 0:
                res.append(None)
            else:
                res.append(out[prev : int(ends[i])].tolist())
                prev = int(ends[i])
        return res
