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
