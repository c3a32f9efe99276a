# -*- coding: utf-8 -*-
"""End-to-end coverage of the ``train.py`` entry itself — the config-dump /
seed / dataset / mesh / device-table selection glue (reference main(),
train.py:125-151) — driven in-process with CLI-style overrides."""

import sys

import numpy as np
import pytest

from drin_tpu.data.synthetic import make_synthetic_store, tiny_config


def _overrides(cfg, **extra):
    base = dict(
        preprocess_dir=cfg.preprocess_dir,
        dataset_root="/tmp/unused",
        num_candidates_data=cfg.num_candidates_data,
        metrics_topk=tuple(cfg.metrics_topk),
        bert_embed_dim=16, resnet_embed_dim=24, gcn_embed_dim=16,
        mention_final_output_dim=16, entity_final_output_dim=16,
        max_mention_sentence_len=12, max_entity_attr_token_len=8,
        resnet_num_region=4, batch_size=4,
        transformer_num_layers=2, transformer_num_heads=2,
        transformer_ffn_hidden_size=16,
        num_epoch=1, test_epoch_interval=1, dataloader_workers=0,
    )
    base.update(extra)
    return [f"{k}={v!r}" if isinstance(v, str) else f"{k}={v}" for k, v in base.items()]


@pytest.mark.parametrize("dataset_name,model_type", [
    ("wikidiverse", "drin"),
    ("wikimel", "drin"),    # exercises the device-entity-table rows path
    ("wikimel", "ghmfc"),
])
def test_train_py_main_end_to_end(tmp_path, dataset_name, model_type, capsys):
    sys.modules.pop("train", None)
    import train as train_entry

    cfg = tiny_config(dataset_name, model_type, preprocess_dir=str(tmp_path))
    make_synthetic_store(cfg, n_mentions=10, n_entities=30, seed=7)
    argv = [f"model_type={model_type}", f"dataset_name={dataset_name}"] + _overrides(cfg)
    train_entry.main(argv)
    out = capsys.readouterr().out
    assert "model_type" in out  # config summary printed (reference train.py:126-133)
    if dataset_name == "wikimel" and model_type == "drin":
        assert "device entity tables resident" in out


def test_train_py_main_mesh(tmp_path, capsys):
    """mesh_data/mesh_model overrides put the whole run on the virtual mesh."""
    sys.modules.pop("train", None)
    import train as train_entry

    cfg = tiny_config("wikidiverse", "drin", preprocess_dir=str(tmp_path))
    make_synthetic_store(cfg, n_mentions=10, seed=8)
    argv = ["model_type=drin", "dataset_name=wikidiverse",
            "mesh_data=4", "mesh_model=2"] + _overrides(cfg, batch_size=8)
    train_entry.main(argv)
    out = capsys.readouterr().out
    assert "devices: 8 (mesh)" in out


def test_train_py_mesh_data_all_remaining(tmp_path, capsys):
    """mesh_data=-1 ("all remaining devices") resolves against the live
    backend AFTER cluster init and actually builds the mesh — previously it
    silently trained single-chip (ADVICE r2)."""
    sys.modules.pop("train", None)
    import train as train_entry

    cfg = tiny_config("wikidiverse", "drin", preprocess_dir=str(tmp_path))
    make_synthetic_store(cfg, n_mentions=10, seed=8)
    argv = ["model_type=drin", "dataset_name=wikidiverse",
            "mesh_data=-1", "mesh_model=2"] + _overrides(cfg, batch_size=8)
    train_entry.main(argv)
    out = capsys.readouterr().out
    assert "devices: 8 (mesh)" in out  # 8 virtual devices / model 2 -> data 4


def test_train_py_test_only(tmp_path, capsys):
    sys.modules.pop("train", None)
    import train as train_entry

    cfg = tiny_config("wikidiverse", "drin", preprocess_dir=str(tmp_path))
    make_synthetic_store(cfg, n_mentions=10, seed=9)
    train_entry.main(["model_type=drin", "dataset_name=wikidiverse",
                      "test_only=true"] + _overrides(cfg))
    assert "model_type" in capsys.readouterr().out


def test_unknown_config_key_suggests_fix():
    from drin_tpu.common.config import make_config

    with pytest.raises(ValueError, match="did you mean 'batch_size'"):
        make_config("drin", "wikidiverse", dataset_root="/tmp/x", batch_siz=32)


def test_train_py_online_bert_with_checkpoint(tmp_path, capsys):
    """train.py's online-BERT branch end to end: model dims come from the
    checkpoint, the pretrained tower is merged into the init params
    (train.py online path), and one epoch trains through the encoder."""
    import json as _json
    import os
    import sys as _sys

    import torch

    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_ghmfc_online import _tiny_hf_bert

    from drin_tpu.common.npy_io import save_field
    from drin_tpu.text.wordpiece import build_tiny_vocab

    root = tmp_path
    qids = [f"Q{i}" for i in range(5)]
    qid2name = {q: f"name {q}" for q in qids}
    qid2attr = {q: f"attr of {q}" for q in qids}
    (root / "qid2ne.json").write_text(_json.dumps(qid2name))
    (root / "qid2abs.json").write_text(_json.dumps(qid2attr))
    sentences = ["Alpha beta gamma delta", "Epsilon zeta eta theta"]
    vocab = build_tiny_vocab(sentences + list(qid2name.values()) + list(qid2attr.values()))
    vocab_path = str(root / "vocab.txt")
    inv = {v: k for k, v in vocab.items()}
    with open(vocab_path, "w") as f:
        for i in range(len(inv)):
            f.write(inv[i] + "\n")

    hf_bert, hf_cfg = _tiny_hf_bert(vocab_size=len(vocab), hidden=16, max_len=64)
    ckpt_dir = root / "bert-ckpt"
    ckpt_dir.mkdir()
    (ckpt_dir / "config.json").write_text(_json.dumps(hf_cfg.to_dict()))
    torch.save(hf_bert.state_dict(), str(ckpt_dir / "pytorch_model.bin"))

    store = root / "store"
    store.mkdir()
    n, C = 4, 3
    rng = np.random.default_rng(51)
    save_field(str(store), "mention_text_raw",
               np.asarray([sentences[i % 2] for i in range(n)]), "train")
    save_field(str(store), "entity_name_raw",
               np.asarray([f"Q{rng.integers(0, 5)}" for _ in range(n * C)]), "train")
    save_field(str(store), "start_pos", np.ones(n, np.int64), "train")
    save_field(str(store), "end_pos", np.full(n, 2, np.int64), "train")
    save_field(str(store), "answer", rng.integers(0, C - 1, n).astype(np.int64), "train")
    save_field(str(store), "mention_image_feature",
               rng.standard_normal((n, 4, 24)).astype(np.float32), "train")
    for split in ("valid", "test"):
        for f in os.listdir(store):
            if f.endswith("_train.npy"):
                os.link(store / f, store / f.replace("_train", f"_{split}"))

    sys.modules.pop("train", None)
    import train as train_entry

    train_entry.main([
        "model_type=ghmfc", "dataset_name=wikimel", "online_bert=true",
        f"preprocess_dir={str(store)!r}", f"bert_checkpoint={str(ckpt_dir)!r}",
        f"bert_vocab={vocab_path!r}", f"qid2entity_path={str(root / 'qid2ne.json')!r}",
        f"qid2attr_path={str(root / 'qid2abs.json')!r}",
        f"num_candidates_data={C - 1}", "metrics_topk=(1,)",
        "bert_embed_dim=16", "resnet_embed_dim=24", "resnet_num_region=4",
        "mention_final_output_dim=16", "entity_final_output_dim=16",
        "num_entity_sentence=2", "max_mention_sentence_len=16",
        "max_entity_attr_token_len=8", "max_bert_len=64", "batch_size=4",
        "transformer_num_heads=2", "num_epoch=1", "test_epoch_interval=1",
        "finetune_bert=true",
    ])
    out = capsys.readouterr().out
    assert "model_type" in out
