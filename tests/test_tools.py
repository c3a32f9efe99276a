# -*- coding: utf-8 -*-
"""Distribution tooling + input-pipeline component tests."""

import numpy as np
import pytest


def test_data_tools_roundtrip(tmp_path):
    """zip -> fake-mp4 -> zip roundtrip restores bytes exactly and verifies
    md5 (reference dataset/data_tools.py behavior)."""
    from drin_tpu.tools.data_tools import MP4_HEADER, decode, encode, md5

    payload = bytes(range(256)) * 100
    raw = tmp_path / "archive.zip"
    raw.write_bytes(payload)
    orig_md5 = md5(str(raw))

    encode(str(tmp_path), ["archive.zip"], ["video.mp4"], log=lambda *a: None)
    enc = (tmp_path / "video.mp4").read_bytes()
    assert enc[: len(MP4_HEADER)] == MP4_HEADER  # recognized as mp4
    assert enc[-len(MP4_HEADER):] == payload[: len(MP4_HEADER)]  # stash at EOF
    assert len(enc) == len(payload) + len(MP4_HEADER)

    results = decode(str(tmp_path), ["archive.zip"], ["video.mp4"], log=lambda *a: None)
    assert results == {"archive.zip": True}
    assert (tmp_path / "archive.zip").read_bytes() == payload
    assert md5(str(tmp_path / "archive.zip")) == orig_md5


def test_data_tools_detects_corruption(tmp_path):
    from drin_tpu.tools.data_tools import decode, encode

    raw = tmp_path / "a.zip"
    raw.write_bytes(b"x" * 4096)
    encode(str(tmp_path), ["a.zip"], ["a.mp4"], log=lambda *a: None)
    # corrupt a byte mid-file
    data = bytearray((tmp_path / "a.mp4").read_bytes())
    data[100] ^= 0xFF
    (tmp_path / "a.mp4").write_bytes(bytes(data))
    results = decode(str(tmp_path), ["a.zip"], ["a.mp4"], log=lambda *a: None)
    assert results == {"a.zip": False}


def test_prefetcher_order_and_completeness():
    from drin_tpu.data.prefetch import Prefetcher

    items = list(range(57))
    got = list(Prefetcher(iter(items), lambda x: x * 2, depth=3))
    assert got == [x * 2 for x in items]


def test_prefetcher_propagates_exceptions():
    from drin_tpu.data.prefetch import Prefetcher

    def gen():
        yield 1
        yield 2
        raise RuntimeError("boom in worker")

    it = Prefetcher(gen(), depth=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(RuntimeError, match="boom in worker"):
        next(it)


def test_prefetcher_transform_exception():
    from drin_tpu.data.prefetch import Prefetcher

    it = Prefetcher(iter([1, 0]), lambda x: 1 // x, depth=1)
    assert next(it) == 1
    with pytest.raises(ZeroDivisionError):
        list(it)


def test_prefetcher_close_unblocks_abandoned_worker():
    """An abandoned iteration (exception in the consumer's loop body, early
    break) must not leave the worker thread blocked in q.put holding
    transformed items forever — the context manager / close() stops and
    joins it, releasing the queued batches."""
    import itertools

    from drin_tpu.data.prefetch import Prefetcher

    # infinite source, depth 1: the worker is guaranteed to be blocked in
    # put() once the consumer stops pulling
    pf = Prefetcher(itertools.count(), depth=1)
    assert next(pf) == 0
    pf.close()
    assert not pf._thread.is_alive()
    pf.close()  # idempotent

    # the context-manager form used by the trainer's epoch loop
    with Prefetcher(itertools.count(), depth=1) as pf2:
        for x in pf2:
            if x >= 3:
                break
    assert not pf2._thread.is_alive()

    # normal exhaustion still works under the context manager
    with Prefetcher(iter(range(5)), lambda x: x + 1, depth=2) as pf3:
        assert list(pf3) == [1, 2, 3, 4, 5]


def test_online_parallel_tokenization_identical(tmp_path):
    """The fork-pool tokenization path must produce bit-identical batches to
    the sequential path (exercised via a forced pool even on 1-core hosts)."""
    import json

    from drin_tpu.common import npy_io
    from drin_tpu.data import online as ol
    from drin_tpu.data.synthetic import tiny_config
    from drin_tpu.text.wordpiece import BertTokenizer, build_tiny_vocab

    d = str(tmp_path)
    N, C = 8, 5
    sentences = [f"Sentence number {i} mentions alpha beta" for i in range(N)]
    vocab = build_tiny_vocab(sentences + [f"name Q{i} attr words" for i in range(6)])
    npy_io.save_field(d, "mention_text_raw", np.asarray(sentences), "train")
    npy_io.save_field(d, "start_pos", np.full(N, 1), "train")
    npy_io.save_field(d, "end_pos", np.full(N, 3), "train")
    npy_io.save_field(d, "answer", np.zeros(N, np.int64), "train")
    npy_io.save_field(d, "entity_name_raw", np.asarray([f"Q{i % 6}" for i in range(N * C)]), "train")
    with open(f"{d}/ne.json", "w") as f:
        json.dump({f"Q{i}": f"name Q{i}" for i in range(6)}, f)
    with open(f"{d}/abs.json", "w") as f:
        json.dump({f"Q{i}": "attr words" for i in range(6)}, f)

    cfg = tiny_config("wikimel", "ghmfc", preprocess_dir=d).replace(
        num_candidates_data=C - 1, online_bert=True, max_bert_len=64,
        num_entity_sentence=2, mention_final_layer_name="linear",
        entity_final_layer_name="linear",
        qid2entity_path=f"{d}/ne.json", qid2attr_path=f"{d}/abs.json")
    tk = lambda: BertTokenizer(vocab=vocab, model_max_length=64)
    seq = ol.OnlineMELDataset(cfg.replace(dataloader_workers=0), "train", tk())
    par = ol.OnlineMELDataset(cfg.replace(dataloader_workers=2), "train", tk())
    if par._pool is None:  # 1-core host: force the pool to cover the code path
        import multiprocessing as mp

        par._pool = mp.get_context("fork").Pool(
            2, initializer=ol._init_tok_worker, initargs=(vocab, 64))
    idx = np.arange(N)
    b_seq, b_par = seq.online_batch(idx), par.online_batch(idx)
    for a, b in zip(b_seq, b_par):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    par.close()


def test_zip_overflow_is_actionable():
    from drin_tpu.data.online import zip_entities

    long_tokens = [[101] + list(range(5, 40)) + [102]] * 4
    with pytest.raises(ValueError, match="num_entity_sentence"):
        zip_entities(long_tokens, 2, 32, 101)


def test_prefetcher_close_leaves_nothing_queued():
    """close() must release EVERY queued item: a worker put() that had
    already passed the stop check can land behind the first drain, leaving
    the last (device-resident) batch pinned in the queue until GC — close
    drains again after the join (prefetch.Prefetcher.close)."""
    import itertools
    import queue as _queue

    from drin_tpu.data.prefetch import Prefetcher

    for _ in range(20):  # the race needs a few shots
        pf = Prefetcher(itertools.count(), depth=2)
        next(pf)
        pf.close()
        assert not pf._thread.is_alive()
        with pytest.raises(_queue.Empty):
            pf._q.get_nowait()
