# -*- coding: utf-8 -*-
"""Benchmark: online-path host-side batch assembly (tokenize + zip + pack).

The online data layer is pure host work — the reference does it inside
DataLoader worker processes with HF's Rust tokenizer; this repo's in-framework
tokenizer now has a fused native (C++) path (native/src/wordpiece.cpp).  This
measures ``OnlineMELDataset.online_batch`` at WikiMEL-like shapes (B=64,
C=101 candidates, ~100-char attr texts, zipped into 12 sentences) with the
native tokenizer vs the pure-Python fallback.  One JSON line per variant.
CPU-only; NOT the driver benchmark (bench.py is)."""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    import tempfile

    from drin_tpu.common import npy_io
    from drin_tpu.data.online import OnlineMELDataset
    from drin_tpu.data.synthetic import tiny_config
    from drin_tpu.text.wordpiece import BertTokenizer, build_tiny_vocab

    B, C, N = 64, 101, 512
    rng = np.random.default_rng(0)
    words = ["".join(rng.choice(list("abcdefghijklmnop"), rng.integers(3, 10)))
             for _ in range(3000)]
    d = tempfile.mkdtemp()
    sentences = [" ".join(rng.choice(words, 24)) for _ in range(N)]
    npy_io.save_field(d, "mention_text_raw", np.asarray(sentences), "train")
    npy_io.save_field(d, "start_pos", np.ones(N, np.int64), "train")
    npy_io.save_field(d, "end_pos", np.full(N, 2, np.int64), "train")
    npy_io.save_field(d, "answer", (np.arange(N) % (C - 1)).astype(np.int64), "train")
    n_ent = 2000
    npy_io.save_field(d, "entity_name_raw",
                      np.asarray([f"Q{i % n_ent}" for i in range(N * C)]), "train")
    import json as _json

    with open(os.path.join(d, "qid2ne.json"), "w") as f:
        _json.dump({f"Q{i}": " ".join(rng.choice(words, 2)) for i in range(n_ent)}, f)
    with open(os.path.join(d, "qid2abs.json"), "w") as f:
        _json.dump({f"Q{i}": " ".join(rng.choice(words, 14)) for i in range(n_ent)}, f)

    vocab = build_tiny_vocab([" ".join(words)])
    cfg = tiny_config("wikimel", "ghmfc", preprocess_dir=d).replace(
        num_candidates_data=C - 1, online_bert=True, max_bert_len=512,
        num_entity_sentence=12, online_length_buckets=128,
        mention_final_layer_name="linear", entity_final_layer_name="linear",
        dataloader_workers=0,  # measure single-thread host cost
        qid2entity_path=os.path.join(d, "qid2ne.json"),
        qid2attr_path=os.path.join(d, "qid2abs.json"))

    for label in ("native", "python"):
        tok = BertTokenizer(vocab=vocab, model_max_length=512)
        if label == "python":
            tok._native = None
        elif tok._native is None:
            print(json.dumps({"variant": "native", "error": "library not built"}))
            continue
        ds = OnlineMELDataset(cfg, "train", tokenizer=tok)
        idx = np.arange(B)
        ds.online_batch(idx)  # warm
        iters = 5
        t0 = time.perf_counter()
        for i in range(iters):
            ds.online_batch((idx + i * B) % N)
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({
            "variant": f"online_batch-{label}", "batch": B, "candidates": C,
            "ms_per_batch": round(dt * 1e3, 1),
            "mentions_per_sec_host": round(B / dt, 1)}), flush=True)


if __name__ == "__main__":
    main()
