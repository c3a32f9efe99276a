# -*- coding: utf-8 -*-
"""Native host-runtime tests: the threaded C++ gather (drin_tpu/native).

Covers the two properties the input pipeline depends on:

  * correctness — the ctypes path returns exactly ``table[rows]`` (the
    reference's per-example gather-join semantics, drin/data.py:85-93);
  * thread safety — a ThreadSanitizer-instrumented stress run over the
    threaded gather exits clean (race detection is a first-class subsystem
    here; the reference has none, SURVEY.md §5.2).
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

import drin_tpu.native as native

NATIVE_DIR = os.path.dirname(os.path.abspath(native.__file__))


def _built_lib():
    if not native.native_available():
        r = subprocess.run(["make", "-C", NATIVE_DIR], capture_output=True, text=True)
        if r.returncode != 0:
            pytest.skip(f"native lib build failed: {r.stderr[-500:]}")
        # reset the module's load cache so the fresh .so is picked up
        native._TRIED = False
        native._LIB = None
    if not native.native_available():
        pytest.skip("native lib unavailable")


@pytest.mark.parametrize("dtype", [np.float32, np.float16, np.int64])
def test_gather_rows_matches_numpy(dtype):
    """The native threaded path must byte-match numpy fancy-indexing (the
    size thresholds in gather_rows route big gathers to C++)."""
    _built_lib()
    rng = np.random.default_rng(0)
    table = rng.standard_normal((700, 96)).astype(dtype)  # row 384B: native
    rows = rng.integers(0, 700, size=(8, 33)).astype(np.int64)
    out = native.gather_rows(table, rows)
    np.testing.assert_array_equal(out, table[rows])
    assert out.shape == rows.shape + table.shape[1:]
    # below-threshold gathers use numpy and must agree too
    small = native.gather_rows(table[:, :2], rows)  # row 8B < 256B threshold
    np.testing.assert_array_equal(small, table[:, :2][rows])


def test_gather_rows_mmap_table(tmp_path):
    """mmap-backed tables (the production feature store) work through the
    native pointer path."""
    _built_lib()
    rng = np.random.default_rng(1)
    arr = rng.standard_normal((300, 128)).astype(np.float32)
    p = tmp_path / "t.npy"
    np.save(p, arr)
    table = np.load(p, mmap_mode="r")
    rows = rng.integers(0, 300, size=(4, 50))
    np.testing.assert_array_equal(native.gather_rows(table, rows), arr[rows])


def test_gather_tsan_stress():
    """Build the -fsanitize=thread stress binary and run it: any data race
    in the threaded gather aborts (halt_on_error) with a nonzero exit."""
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    # -B: always rebuild from the current sources (a stale binary would
    # silently test old code)
    r = subprocess.run(["make", "-B", "-C", NATIVE_DIR, "tsan_stress"],
                       capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"tsan build unsupported here: {r.stderr[-500:]}")
    binary = os.path.join(NATIVE_DIR, "tsan_stress")
    env = dict(os.environ, TSAN_OPTIONS="halt_on_error=1 exitcode=66")
    run = subprocess.run([binary], capture_output=True, text=True, env=env,
                         timeout=300)
    assert run.returncode == 0, f"tsan: {run.stdout}\n{run.stderr}"
    assert "ThreadSanitizer" not in run.stderr, run.stderr
    assert "ok" in run.stdout


def test_native_tokenizer_matches_python_fuzz():
    """The fused native tokenizer (C++ BasicTokenizer pass + WordPiece) must
    be byte-exact vs the pure-Python path over random text incl. unicode,
    punctuation bursts, CJK, overlong words and whitespace runs; inputs
    outside the native fast path (astral chars, control chars) must fall
    back rather than diverge."""
    import numpy as np

    from drin_tpu.native import BertEncodeNative
    from drin_tpu.text.wordpiece import BertTokenizer

    rng = np.random.default_rng(17)
    base_words = ["alpha", "beta", "gamma", "delta", "kappa", "zeta",
                  "übermut", "naïve", "héllo"]
    vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3, "[MASK]": 4}
    for w in base_words + ["##pha", "al", "##ta", "be", ",", ".", "!", "漢", "字"]:
        if w not in vocab:
            vocab[w] = len(vocab)
    tok = BertTokenizer(vocab=vocab, model_max_length=64)
    assert isinstance(tok._native, BertEncodeNative), "native path not active"
    tok_py = BertTokenizer(vocab=vocab, model_max_length=64)
    tok_py._native = None

    pieces = base_words + [",", ".", "!", "漢字", "  ", "\t", "unknownword",
                           "a" * 120, "ü" * 5, "\x00x", "e‍moji", "😀"]
    for trial in range(200):
        text = "".join(rng.choice(pieces, size=int(rng.integers(1, 12))))
        assert tok.encode(text, truncation=True) == tok_py.encode(text, truncation=True), repr(text)
        a = tok(text, padding="max_length", truncation=True, max_length=32)
        b = tok_py(text, padding="max_length", truncation=True, max_length=32)
        np.testing.assert_array_equal(a["input_ids"], b["input_ids"])
        np.testing.assert_array_equal(a["attention_mask"], b["attention_mask"])


def test_native_tokenizer_fallback_paths():
    """Astral codepoints and control chars return None from the native
    encoder (the Python path handles them); non-contiguous vocab ids refuse
    native construction."""
    import pytest

    from drin_tpu.native import BertEncodeNative

    vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3, "hello": 4}
    enc = BertEncodeNative(vocab, unk_id=1)
    assert enc.encode_ids("hello") == [4]
    assert enc.encode_ids("😀 astral") is None
    assert enc.encode_ids("con\x00trol") is None
    with pytest.raises(ValueError, match="contiguous"):
        BertEncodeNative({"[UNK]": 1, "x": 7}, unk_id=1)


def test_native_wordpiece_word_matcher():
    """The word-level native matcher (WordPieceNative) equals the Python
    WordPieceTokenizer on continuation pieces, UNK collapse and the
    max-chars rule."""
    from drin_tpu.native import WordPieceNative
    from drin_tpu.text.wordpiece import WordPieceTokenizer

    vocab = {"[UNK]": 0, "un": 1, "##aff": 2, "##able": 3, "##a": 4, "b": 5}
    nat = WordPieceNative(vocab, unk_id=0)
    py = WordPieceTokenizer(vocab, "[UNK]")
    for word in ["unaffable", "una", "b", "zzz", "a" * 101, "un", ""]:
        want = [vocab[t] for t in py.tokenize(word)] if word else []
        assert nat.tokenize_ids([word] if word else []) == want, word
    # multi-word call concatenates per-word results
    assert nat.tokenize_ids(["unaffable", "b", "zzz"]) == [1, 2, 3, 5, 0]


def test_native_encode_batch_matches_per_text():
    """encode_batch == a per-text encode loop, including texts that take the
    Python fallback (astral / control chars) interleaved with native ones."""
    from drin_tpu.text.wordpiece import BertTokenizer

    vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3, "hello": 4,
             "world": 5, ",": 6, "##d": 7, "worl": 8}
    tok = BertTokenizer(vocab=vocab, model_max_length=8)
    assert tok._native is not None
    texts = ["hello world", "😀 astral", "world, hello", "", "a\x00b",
             "hello " * 10, "worl"]
    want = [tok.encode(t, truncation=True) for t in texts]
    got = tok.encode_batch(texts, truncation=True)
    assert got == want
    # and through __call__ (batched path with padding)
    import numpy as np

    a = tok(texts, padding="max_length", truncation=True, max_length=8)
    tok_py = BertTokenizer(vocab=vocab, model_max_length=8)
    tok_py._native = None
    b = tok_py(texts, padding="max_length", truncation=True, max_length=8)
    np.testing.assert_array_equal(a["input_ids"], b["input_ids"])
    np.testing.assert_array_equal(a["attention_mask"], b["attention_mask"])


def test_native_tokenizer_lone_surrogate_falls_back():
    """Lone surrogates (malformed JSON escapes survive json.loads as
    U+D800-DFFF) are unencodable to UTF-8: the native encoder must return
    None (Python fallback — its cleaner drops them as control chars)
    instead of crashing the whole preprocessing run with
    UnicodeEncodeError."""
    import json

    from drin_tpu.native import BertEncodeNative
    from drin_tpu.text.wordpiece import BertTokenizer, build_tiny_vocab

    vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3, "hello": 4,
             "world": 5}
    enc = BertEncodeNative(vocab, unk_id=1)
    s = json.loads('"hello \\ud800 world"')
    assert enc.encode_ids(s) is None
    assert enc.encode_ids_batch([s, "hello"])[1] == [4]
    # end-to-end: the tokenizer's fallback produces the surrogate-dropped
    # Python result, identical with and without the native lib
    tok = BertTokenizer(vocab=build_tiny_vocab(["hello world"]))
    assert tok._native is not None
    got = tok.encode_batch([s], truncation=True)[0]
    assert got == [tok.cls_id] + tok._py_word_ids(s) + [tok.sep_id]


def test_gather_rows_out_of_range_matches_numpy():
    """Negative or out-of-range row indices must NOT reach the native
    memcpy (no bounds checks there) — they route to numpy, which raises
    IndexError identically with or without the .so built."""
    import pytest

    _built_lib()  # the routing guard only matters when the .so is loaded
    rng = np.random.default_rng(4)
    table = rng.standard_normal((700, 96)).astype(np.float32)
    rows = rng.integers(0, 700, size=(8, 33)).astype(np.int64)
    rows[3, 7] = 700  # one past the end
    with pytest.raises(IndexError):
        native.gather_rows(table, rows)
    rows[3, 7] = -1  # numpy wraps negatives; parity requires the same
    out = native.gather_rows(table, rows)
    np.testing.assert_array_equal(out, table[rows])


def test_gather_rows_noninteger_indices_match_numpy():
    """Bool masks / float indices mean numpy SELECTION semantics (or an
    IndexError), never row-number arithmetic — the native path must decline
    them identically with or without the .so built."""
    _built_lib()
    rng = np.random.default_rng(6)
    table = rng.standard_normal((700, 96)).astype(np.float32)
    mask = rng.uniform(size=700) < 0.5
    np.testing.assert_array_equal(native.gather_rows(table, mask), table[mask])
    # float indices raise like numpy
    import pytest

    with pytest.raises(IndexError):
        native.gather_rows(table, np.arange(64.0) + 0.5)


def test_vocab_buffer_rejects_newline_tokens():
    """A newline inside a token would split it into two native entries and
    silently shift every later id — must raise so callers fall back."""
    import pytest

    from drin_tpu.native import _vocab_buffer

    with pytest.raises(ValueError, match="newline"):
        _vocab_buffer({"a\nb": 0, "c": 1})
