# -*- coding: utf-8 -*-
"""GHMFC online-BERT path parity vs the reference run in place with a tiny
random BERT.

Reference notes (documented divergences the oracle corrects):
  * ghmfc.py:225 passes ``entity_dict`` (a python dict) into
    ``unzip_entities`` where the freshly computed ``zipped_entity`` tensor is
    clearly intended — the reference's online zipped path crashes as
    written.  The oracle here re-implements EntityEncoder.forward's zipped
    branch (ghmfc.py:216-225) with that one variable corrected, still
    calling the reference's own ``unzip_entities``.
  * the reference instantiates two BertModel copies with identical
    pretrained weights (ghmfc.py:159, :209); ours shares one BERT —
    identical numerics while frozen.
"""

import os

import numpy as np
import pytest

from drin_tpu.common.config import make_config
from tests.reference_oracle import load_reference, ref_import


def _tiny_hf_bert(vocab_size=211, hidden=16, max_len=64):
    import torch
    from transformers import BertConfig, BertModel

    torch.manual_seed(3)
    cfg = BertConfig(
        vocab_size=vocab_size, hidden_size=hidden, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32, max_position_embeddings=max_len,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    return BertModel(cfg).eval(), cfg


def test_ghmfc_online_zipped_parity():
    import torch

    from drin_tpu.data.online import zip_entities
    from drin_tpu.encoders.bert import config_from_torch, bert_params_from_torch
    from drin_tpu.models.ghmfc import GHMFCOnline
    from drin_tpu.models.torch_import import _linear, _multimodal_fusion, _wrapped_linear

    B, C, S = 2, 8, 3
    D, Dr, R = 16, 24, 4
    max_len = 64
    args = load_reference("wikimel", "ghmfc")
    args.online_bert = True
    args.finetune_bert = False
    args.num_candidates_data = C - 1
    args.num_candidates_model = C
    args.num_entity_sentence = S
    args.bert_embed_dim = D
    args.resnet_embed_dim = Dr
    args.max_bert_len = max_len
    args.max_mention_sentence_len = 32

    hf_bert, hf_cfg = _tiny_hf_bert(hidden=D, max_len=max_len)
    ref_mod = ref_import("baselines.ghmfc")
    ref_mod.bert_model = lambda: hf_bert  # no-download oracle encoder
    torch.manual_seed(0)
    ref = ref_mod.Model().eval()

    # corrected zipped entity branch (see module docstring)
    def corrected_entity_forward(batch):
        entity_dict, sep_idx, _entity_image = batch
        bs = sep_idx.shape[0]
        with torch.no_grad():
            zipped = torch.empty([bs, S, max_len, D])
            for i in range(S):
                d_i = {k: v[:, i, :] for k, v in entity_dict.items()}
                zipped[:, i] = ref.entity_encoder.text_encoder(**d_i)["last_hidden_state"]
        enc = ref.entity_encoder.unzip_entities(zipped, sep_idx, ref.entity_encoder.pooling)
        return ref.entity_encoder.final_layer(enc)

    ref.entity_encoder.forward = corrected_entity_forward

    # random batch: token ids + zipped entities through OUR packer (byte-wise
    # identical to the reference's zip_entities, verified in test below)
    rng = np.random.default_rng(21)
    V = hf_cfg.vocab_size
    mention_ids = np.zeros((B, max_len), np.int64)
    mention_mask = np.zeros((B, max_len), np.int64)
    for b in range(B):
        n = rng.integers(10, 30)
        mention_ids[b, 0], mention_ids[b, 1 : n - 1] = 101, rng.integers(5, V, n - 2)
        mention_ids[b, n - 1] = 102
        mention_mask[b, :n] = 1
    start = np.array([2, 3])
    end = np.array([4, 5])
    mention_image = rng.standard_normal((B, R, Dr), np.float32)
    ids = np.zeros((B, S, max_len), np.int64)
    emask = np.zeros((B, S, max_len), np.int64)
    per = (C + S - 1) // S
    sep = np.zeros((B, S, per), np.int64)
    for b in range(B):
        token_lists = [[101] + list(rng.integers(5, V, rng.integers(2, 7))) + [102] for _ in range(C)]
        ids[b], emask[b], sep[b] = zip_entities(token_lists, S, max_len, 101)

    ref_batch = [
        {"input_ids": torch.as_tensor(mention_ids),
         "token_type_ids": torch.zeros_like(torch.as_tensor(mention_ids)),
         "attention_mask": torch.as_tensor(mention_mask)},
        torch.as_tensor(start), torch.as_tensor(end), torch.as_tensor(mention_image),
        {"input_ids": torch.as_tensor(ids),
         "token_type_ids": torch.zeros_like(torch.as_tensor(ids)),
         "attention_mask": torch.as_tensor(emask)},
        torch.as_tensor(sep), torch.zeros(B),
    ]
    with torch.no_grad():
        ref_out = ref(ref_batch).numpy()

    cfg = make_config("ghmfc", "wikimel", dataset_root="/tmp/unused",
                      num_candidates_data=C - 1, num_entity_sentence=S,
                      bert_embed_dim=D, resnet_embed_dim=Dr, max_bert_len=max_len,
                      max_mention_sentence_len=32, online_bert=True, finetune_bert=False)
    bert_cfg = config_from_torch(hf_cfg)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = {
        "bert": bert_params_from_torch({k: v.numpy() for k, v in hf_bert.state_dict().items()}, bert_cfg),
        "mention_encoder": {
            "intermediate_layer": _multimodal_fusion(sd, "mention_encoder.intermediate_layer")
        },
        "entity_final_layer": _wrapped_linear(sd, "entity_encoder.final_layer"),
    }
    model = GHMFCOnline(cfg, bert_cfg)
    ours = np.asarray(model.apply(
        {"params": params},
        (mention_ids, mention_mask, start, end, mention_image, ids, emask, sep, np.zeros(B))))
    assert ours.shape == ref_out.shape == (B, C)
    np.testing.assert_allclose(ours, ref_out, rtol=2e-3, atol=2e-4)


def test_zip_entities_matches_reference():
    """Our numpy zip_entities must pack byte-identically to the reference's
    (baselines/data.py:34-61)."""
    import torch

    args = load_reference("wikimel", "ghmfc")
    args.num_entity_sentence = 3
    args.max_bert_len = 32
    import importlib

    ref_data = ref_import("baselines.data")
    from drin_tpu.data.online import zip_entities

    rng = np.random.default_rng(4)
    token_lists = [[101] + list(rng.integers(5, 100, rng.integers(1, 6))) + [102] for _ in range(8)]
    ids, mask, sep = zip_entities([list(map(int, t)) for t in token_lists], 3, 32, 101)
    ref_dict, ref_sep = ref_data.zip_entities([list(map(int, t)) for t in token_lists])
    np.testing.assert_array_equal(ids, ref_dict["input_ids"].numpy())
    np.testing.assert_array_equal(mask, ref_dict["attention_mask"].numpy())
    np.testing.assert_array_equal(sep, ref_sep.numpy())


def test_extract_mention_matches_reference():
    import torch

    args = load_reference("wikimel", "ghmfc")
    args.max_bert_len = 32
    ref_data = ref_import("baselines.data")
    from drin_tpu.data.online import extract_mention

    tokens = np.array([101, 11, 12, 13, 14, 15, 102] + [0] * 25, np.int64)
    ids, mask, s, e = extract_mention(tokens, 1, 4, 32, 101, 102)
    ref_dict, rs, re_ = ref_data.extract_mention(torch.as_tensor(tokens), 1, 4)
    np.testing.assert_array_equal(ids, ref_dict["input_ids"].numpy())
    np.testing.assert_array_equal(mask, ref_dict["attention_mask"].numpy())
    assert (s, e) == (rs, re_)


def test_pre_extract_mention_matches_reference_batchwise():
    """pre_extract_mention packs each mention into its own [CLS mention SEP]
    sentence with start=1 (baselines/data.py:154-156); our columnar batch
    assembly must equal the reference's per-sample extract_mention."""
    import tempfile

    import torch

    args = load_reference("wikimel", "ghmfc")
    args.max_bert_len = 32
    ref_data = ref_import("baselines.data")

    from drin_tpu.data.online import OnlineMELDataset
    from drin_tpu.data.synthetic import tiny_config
    from drin_tpu.text.wordpiece import BertTokenizer, build_tiny_vocab
    from drin_tpu.common import npy_io
    import json, os

    # fabricate an intermediate store with raw mentions + qid candidates
    d = tempfile.mkdtemp()
    sentences = ["Alpha beta gamma delta epsilon", "Zeta eta theta iota kappa"]
    vocab = build_tiny_vocab(sentences + ["name Q0", "name Q1", "attr text"])
    tok = BertTokenizer(vocab=vocab, model_max_length=32)
    # align the reference's hard-coded special-token ids (args.py:46-47)
    # with the tiny vocab so its extract_mention packs the same bytes
    args.CLS, args.SEP = ref_data.CLS, ref_data.SEP = tok.cls_id, tok.sep_id
    npy_io.save_field(d, "mention_text_raw", np.asarray(sentences), "train")
    npy_io.save_field(d, "start_pos", np.asarray([1, 2]), "train")
    npy_io.save_field(d, "end_pos", np.asarray([3, 4]), "train")
    npy_io.save_field(d, "answer", np.asarray([0, 1]), "train")
    C = 3
    npy_io.save_field(d, "entity_name_raw", np.asarray([f"Q{i % 2}" for i in range(2 * C)]), "train")
    with open(os.path.join(d, "qid2ne.json"), "w") as f:
        json.dump({"Q0": "name Q0", "Q1": "name Q1"}, f)
    with open(os.path.join(d, "qid2abs.json"), "w") as f:
        json.dump({"Q0": "attr text", "Q1": "attr text"}, f)

    cfg = tiny_config("wikimel", "ghmfc", preprocess_dir=d).replace(
        num_candidates_data=C - 1, online_bert=True, pre_extract_mention=True,
        max_bert_len=32, num_entity_sentence=2,
        mention_final_layer_name="linear",  # no image loading
        entity_final_layer_name="linear",
        qid2entity_path=os.path.join(d, "qid2ne.json"),
        qid2attr_path=os.path.join(d, "qid2abs.json"),
    )
    ds = OnlineMELDataset(cfg, "train", tokenizer=tok)
    batch = ds.online_batch(np.arange(2))

    # oracle: tokenizer + reference extract_mention per sample
    full = tok(sentences, padding="max_length", truncation=True, max_length=32)
    for b in range(2):
        ref_dict, rs, re_ = ref_data.extract_mention(
            torch.as_tensor(full["input_ids"][b]), [1, 2][b], [3, 4][b])
        np.testing.assert_array_equal(batch.mention_ids[b], ref_dict["input_ids"].numpy())
        np.testing.assert_array_equal(batch.mention_mask[b], ref_dict["attention_mask"].numpy())
        assert batch.mention_start_pos[b] == rs and batch.mention_end_pos[b] == re_


@pytest.mark.parametrize("pooling", ["avg", "max"])
def test_ghmfc_online_direct_parity(pooling):
    """num_entity_sentence=0: the reference encodes each candidate separately
    (ghmfc.py:227-236, per-candidate BERT calls + per-sample token pooling);
    ours is one batched [B*C, Le] BERT call + masked einsum/max."""
    import torch

    from drin_tpu.encoders.bert import bert_params_from_torch, config_from_torch
    from drin_tpu.models.ghmfc import GHMFCOnline
    from drin_tpu.models.torch_import import _multimodal_fusion, _wrapped_linear

    B, C = 2, 5
    D, Dr, R = 16, 24, 4
    Le, max_len = 16, 64
    args = load_reference("wikimel", "ghmfc")
    args.online_bert = True
    args.finetune_bert = False
    args.num_candidates_data = C - 1
    args.num_candidates_model = C
    args.num_entity_sentence = 0  # direct mode
    args.bert_embed_dim = D
    args.resnet_embed_dim = Dr
    args.max_bert_len = max_len
    args.max_mention_sentence_len = 32
    args.entity_final_pooling = pooling

    hf_bert, hf_cfg = _tiny_hf_bert(hidden=D, max_len=max_len)
    ref_mod = ref_import("baselines.ghmfc")
    ref_mod.bert_model = lambda: hf_bert
    torch.manual_seed(5)
    ref = ref_mod.Model().eval()

    rng = np.random.default_rng(23)
    V = hf_cfg.vocab_size
    mention_ids = np.zeros((B, max_len), np.int64)
    mention_mask = np.zeros((B, max_len), np.int64)
    for b in range(B):
        n = rng.integers(10, 30)
        mention_ids[b, 0], mention_ids[b, 1 : n - 1] = 101, rng.integers(5, V, n - 2)
        mention_ids[b, n - 1] = 102
        mention_mask[b, :n] = 1
    start, end = np.array([2, 3]), np.array([4, 5])
    mention_image = rng.standard_normal((B, R, Dr), np.float32)
    eids = np.zeros((B, C, Le), np.int64)
    emask = np.zeros((B, C, Le), np.int64)
    for b in range(B):
        for c in range(C):
            n = rng.integers(4, Le)
            eids[b, c, 0], eids[b, c, 1 : n - 1] = 101, rng.integers(5, V, n - 2)
            eids[b, c, n - 1] = 102
            emask[b, c, :n] = 1

    ref_batch = [
        {"input_ids": torch.as_tensor(mention_ids),
         "token_type_ids": torch.zeros_like(torch.as_tensor(mention_ids)),
         "attention_mask": torch.as_tensor(mention_mask)},
        torch.as_tensor(start), torch.as_tensor(end), torch.as_tensor(mention_image),
        {"input_ids": torch.as_tensor(eids),
         "token_type_ids": torch.zeros_like(torch.as_tensor(eids)),
         "attention_mask": torch.as_tensor(emask)},
        torch.as_tensor(np.zeros((B,), np.int64)), torch.zeros(B),
    ]
    with torch.no_grad():
        ref_out = ref(ref_batch).numpy()

    cfg = make_config("ghmfc", "wikimel", dataset_root="/tmp/unused",
                      num_candidates_data=C - 1, num_entity_sentence=0,
                      bert_embed_dim=D, resnet_embed_dim=Dr, max_bert_len=max_len,
                      max_mention_sentence_len=32, online_bert=True, finetune_bert=False,
                      entity_final_pooling=pooling)
    bert_cfg = config_from_torch(hf_cfg)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = {
        "bert": bert_params_from_torch({k: v.numpy() for k, v in hf_bert.state_dict().items()}, bert_cfg),
        "mention_encoder": {
            "intermediate_layer": _multimodal_fusion(sd, "mention_encoder.intermediate_layer")
        },
        "entity_final_layer": _wrapped_linear(sd, "entity_encoder.final_layer"),
    }
    model = GHMFCOnline(cfg, bert_cfg)
    ours = np.asarray(model.apply(
        {"params": params},
        (mention_ids, mention_mask, start, end, mention_image,
         eids, emask, np.zeros((B,), np.int64), np.zeros(B))))
    assert ours.shape == ref_out.shape == (B, C)
    np.testing.assert_allclose(ours, ref_out, rtol=2e-3, atol=2e-4)


def test_direct_mode_entity_tokens_truncate_at_max_bert_len():
    """num_entity_sentence=0 must truncate/pad candidate texts at
    max_bert_len, like the reference's direct mode (baselines/data.py:153-155
    tokenizes at the tokenizer's model_max_length and pad_tokens to
    max_bert_len) — NOT at max_entity_attr_token_len, which only bounds the
    OFFLINE BertStage.  The length bucket then trims all-padding columns."""
    from drin_tpu.common.config import make_config
    from drin_tpu.data.online import entity_tokens
    from drin_tpu.text.wordpiece import BertTokenizer, build_tiny_vocab

    words = [f"w{i}" for i in range(30)]
    vocab = build_tiny_vocab([" ".join(words)])
    max_len = 24
    tok = BertTokenizer(vocab=vocab, model_max_length=max_len)
    cfg = make_config("ghmfc", "wikimel", dataset_root="/tmp/unused",
                      num_candidates_data=1, num_entity_sentence=0,
                      online_bert=True, max_bert_len=max_len,
                      max_entity_attr_token_len=8)
    rows = [[" ".join(words), "w0 w1"], ["w2", "w3 w4 w5"]]
    ids, mask, sep = entity_tokens(cfg, tok, rows, bucket=0)
    assert ids.shape == (2, 2, max_len)  # max_bert_len, not the 8-token cap
    # the long candidate actually fills past the attr cap and truncates
    # with a closing SEP at the max_bert_len edge, like the reference
    assert int(mask[0, 0].sum()) == max_len
    assert ids[0, 0, -1] == tok.sep_id
    # bucket mode trims trailing all-padding columns in bucket steps
    short_rows = [["w0 w1", "w2"]]
    bids, bmask, _ = entity_tokens(cfg, tok, short_rows, bucket=8)
    assert bids.shape[-1] == 8 and bmask.shape[-1] == 8
    assert int(bmask.sum(-1).max()) <= 8  # trim stays above every row's content


def test_length_bucketing_is_exact():
    """bucket_trim removes only all-padding token columns; the online model's
    scores must be identical (Config.online_length_buckets rationale)."""
    import jax

    from drin_tpu.data.online import bucket_trim
    from drin_tpu.data.synthetic import tiny_config
    from drin_tpu.encoders.bert import BertConfig
    from drin_tpu.models.ghmfc import GHMFCOnline

    B, C, S, L, Lm = 2, 5, 2, 32, 8
    cfg = tiny_config("wikimel", "ghmfc").replace(
        num_candidates_data=C - 1, online_bert=True, num_entity_sentence=S,
        finetune_bert=False, mention_final_layer_name="linear",
        max_mention_sentence_len=Lm, max_bert_len=L)
    bert_cfg = BertConfig(vocab_size=32, hidden_size=8, num_hidden_layers=2,
                          num_attention_heads=2, intermediate_size=16,
                          max_position_embeddings=L)
    model = GHMFCOnline(cfg, bert_cfg)
    rng = np.random.default_rng(9)

    def tokens(shape, maxlen):
        ids = np.zeros(shape + (L,), np.int64)
        mask = np.zeros(shape + (L,), np.int64)
        flat_ids = ids.reshape(-1, L)
        flat_mask = mask.reshape(-1, L)
        for r in range(flat_ids.shape[0]):
            n = int(rng.integers(5, maxlen))
            flat_ids[r, 0], flat_ids[r, 1 : n - 1], flat_ids[r, n - 1] = 1, rng.integers(5, 32, n - 2), 2
            flat_mask[r, :n] = 1
        return ids, mask

    mids, mmask = tokens((B,), 14)
    eids, emask = tokens((B, S), 17)
    per = (C + S - 1) // S
    sep = np.sort(rng.integers(2, 15, (B, S, per)), axis=-1).astype(np.int64)
    feats_full = (mids, mmask, np.ones((B,), np.int64), np.full((B,), 3, np.int64),
                  np.zeros((B,), np.float32), eids, emask, sep,
                  np.zeros((B,), np.float32))
    params = model.init(jax.random.key(0), feats_full)["params"]
    want = np.asarray(model.apply({"params": params}, feats_full))

    tm_ids, tm_mask = bucket_trim(mids, mmask, 8, floor=Lm)
    te_ids, te_mask = bucket_trim(eids, emask, 8)
    assert te_ids.shape[-1] < L and tm_ids.shape[-1] < L  # actually trimmed
    feats_trim = (tm_ids, tm_mask) + feats_full[2:5] + (te_ids, te_mask) + feats_full[7:]
    got = np.asarray(model.apply({"params": params}, feats_trim))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def _make_online_store(tmpdir, n=6, C=3, max_len=32):
    """Tiny online intermediate store + matching cfg/tokenizer (the shared
    fabricator — also used by the 2-process dist worker)."""
    from drin_tpu.data.synthetic import make_synthetic_online_store

    return make_synthetic_online_store(tmpdir, n=n, C=C, max_len=max_len)


def test_online_wikimel_brief_refused(tmp_path):
    """entity_text_type='brief' has no raw source in the wikimel store (the
    reference reads entity-brief-raw, a file none of its stages write —
    baselines/data.py:77-79); the loader must refuse instead of silently
    substituting name-recipe text."""
    import pytest

    from drin_tpu.data.online import OnlineMELDataset

    cfg, tok = _make_online_store(str(tmp_path))
    with pytest.raises(ValueError, match="brief"):
        OnlineMELDataset(cfg.replace(entity_text_type="brief"), "train", tokenizer=tok)


def test_global_length_bucket_matches_local(tmp_path):
    """Precomputed per-example lengths must reproduce the mask-derived
    batch max exactly: a dataset with the multi-process global-bucket path
    forced on yields bit-identical batches to the default local path when
    the global indices equal the local ones."""
    from drin_tpu.data.online import OnlineMELDataset

    cfg, tok = _make_online_store(str(tmp_path))
    ds_local = OnlineMELDataset(cfg, "train", tokenizer=tok)
    ds_global = OnlineMELDataset(cfg, "train", tokenizer=tok)
    assert ds_global._men_len is None  # single process: lengths not built
    ds_global._men_len, ds_global._ent_len = ds_global._precompute_lengths()
    for idx in (np.arange(3), np.array([3, 4, 5]), np.array([0, 5])):
        a = ds_local.online_batch(idx)
        b = ds_global.online_batch(idx, bucket_idx=idx)
        for x, y, name in zip(a, b, a._fields):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=name)


def test_global_length_bucket_shape_agreement(tmp_path):
    """Multi-process shape contract: each host assembles its own row slice
    with the GLOBAL batch indices as bucket_idx — the halves must come out
    with identical token widths and concatenate to the full-batch assembly
    (VERDICT r2 weak #5: bucketing previously died when process_count > 1)."""
    from drin_tpu.data.online import OnlineMELDataset

    cfg, tok = _make_online_store(str(tmp_path))
    ds = OnlineMELDataset(cfg, "train", tokenizer=tok)
    ds._men_len, ds._ent_len = ds._precompute_lengths()
    gidx = np.array([0, 1, 2, 3])
    full = ds.online_batch(gidx, bucket_idx=gidx)
    h0 = ds.online_batch(gidx[:2], bucket_idx=gidx)
    h1 = ds.online_batch(gidx[2:], bucket_idx=gidx)
    assert h0.mention_ids.shape[1:] == h1.mention_ids.shape[1:] == full.mention_ids.shape[1:]
    assert h0.entity_ids.shape[1:] == h1.entity_ids.shape[1:] == full.entity_ids.shape[1:]
    for x0, x1, xf, name in zip(h0, h1, full, full._fields):
        np.testing.assert_array_equal(
            np.concatenate([np.asarray(x0), np.asarray(x1)]), np.asarray(xf),
            err_msg=name)
    # a different global batch may pick a different (still shared) width
    assert ds.online_batch(np.array([0]), bucket_idx=np.array([0])).mention_ids.shape[-1] \
        <= full.mention_ids.shape[-1]


def test_online_dataset_pool_does_not_pin_instance(tmp_path, monkeypatch):
    """Discarded OnlineMELDataset instances must be garbage-collectable and
    their fork pools reaped (review finding): atexit.register(self.close)
    held a strong reference to every dataset, pinning its arrays AND worker
    processes for the process lifetime — harnesses re-create datasets per
    fit chunk.  The pool guard is now a weakref.finalize that references
    only the pool."""
    import gc
    import weakref

    from drin_tpu.data.online import OnlineMELDataset
    from drin_tpu.data.synthetic import make_synthetic_online_store

    monkeypatch.setattr(os, "cpu_count", lambda: 2)  # force the fork pool on
    cfg, tok = make_synthetic_online_store(str(tmp_path / "st"), n=4,
                                           dataloader_workers=2)
    ds = OnlineMELDataset(cfg, "train", tokenizer=tok)
    assert ds._pool is not None and ds._pool_finalizer is not None
    batch = ds.online_batch(np.arange(2))  # the pool actually works
    assert batch.entity_ids.shape[0] == 2
    fin = ds._pool_finalizer
    wr = weakref.ref(ds)
    del ds, batch
    gc.collect()
    assert wr() is None, "dataset instance pinned after discard"
    assert not fin.alive, "pool finalizer did not run at GC"

    # explicit close() detaches the finalizer and reaps the pool
    ds2 = OnlineMELDataset(cfg, "train", tokenizer=tok)
    fin2 = ds2._pool_finalizer
    ds2.close()
    assert ds2._pool is None and ds2._pool_finalizer is None
    assert not fin2.alive
    ds2.close()  # idempotent
