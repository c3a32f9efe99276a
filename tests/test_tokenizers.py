# -*- coding: utf-8 -*-
"""Tokenizer parity: our pure-Python WordPiece and CLIP-BPE vs the HF
tokenizers given identical vocab/merges files."""

import json
import tempfile

import numpy as np

TEXTS = [
    "The quick brown fox, jumped over the lazy dog!",
    "Entity linking (MEL) maps mentions to KB entries.",
    "He visited New York City in 2019... amazing!",
    "Ángel played piano; naïve café-style music",
    "中文 characters split 正确",
    "",
    "   spaces\teverywhere\n\nok   ",
]


def test_wordpiece_matches_hf():
    from transformers import BertTokenizer as HFTok

    from drin_tpu.text.wordpiece import BertTokenizer, build_tiny_vocab

    vocab = build_tiny_vocab(TEXTS[:3], extra=["##ing", "##s", "play", "##ed", "pia", "##no", "nai", "##ve"])
    ours = BertTokenizer(vocab=vocab, do_lower_case=False)
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as vf:
        inv = {v: k for k, v in vocab.items()}
        for i in range(len(vocab)):
            vf.write(inv[i] + "\n")
    hf = HFTok(vocab_file=vf.name, do_lower_case=False)

    for t in TEXTS:
        assert ours.tokenize(t) == hf.tokenize(t), t
    enc_o = ours(TEXTS[:5], padding=True, truncation=True)
    enc_h = hf(TEXTS[:5], padding=True, truncation=True, return_tensors="np")
    for k in ("input_ids", "attention_mask", "token_type_ids"):
        np.testing.assert_array_equal(enc_o[k], enc_h[k])


def test_wordpiece_truncation_matches_hf():
    from transformers import BertTokenizer as HFTok

    from drin_tpu.text.wordpiece import BertTokenizer, build_tiny_vocab

    long = " ".join(["word"] * 40)
    vocab = build_tiny_vocab([long])
    ours = BertTokenizer(vocab=vocab, do_lower_case=False, model_max_length=16)
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as vf:
        inv = {v: k for k, v in vocab.items()}
        for i in range(len(vocab)):
            vf.write(inv[i] + "\n")
    hf = HFTok(vocab_file=vf.name, do_lower_case=False, model_max_length=16)
    eo = ours([long], padding=True, truncation=True)
    eh = hf([long], padding=True, truncation=True, return_tensors="np")
    np.testing.assert_array_equal(eo["input_ids"], eh["input_ids"])


def test_clip_bpe_matches_hf():
    from transformers import CLIPTokenizer as HF

    from drin_tpu.text.clip_bpe import CLIPTokenizer as Ours, bytes_to_unicode

    b2u = bytes_to_unicode()
    alphabet = sorted(set(b2u.values()))
    vocab = {}
    for ch in alphabet:
        vocab[ch] = len(vocab)
    for ch in alphabet:
        vocab[ch + "</w>"] = len(vocab)
    merges = [("t", "h"), ("th", "e</w>"), ("a", "n"), ("an", "d</w>"), ("i", "n"),
              ("in", "g</w>"), ("q", "u"), ("e", "r</w>")]
    for a, b in merges:
        if a + b not in vocab:
            vocab[a + b] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)

    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as vf:
        json.dump(vocab, vf)
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as mf:
        mf.write("#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges))

    hf = HF(vocab_file=vf.name, merges_file=mf.name, model_max_length=77)
    ours = Ours(vocab=vocab, merges=merges)
    texts = ["The quick brown fox and the running dog!", "Entity linking; it's working?", "Ángel 123 café"]
    for t in texts:
        assert ours.tokenize(t) == hf.tokenize(t), t
    eo = ours(texts, padding=True, truncation=True)
    eh = hf(texts, padding=True, truncation=True, return_tensors="np")
    np.testing.assert_array_equal(eo["input_ids"], eh["input_ids"])
    np.testing.assert_array_equal(eo["attention_mask"], eh["attention_mask"])
