# -*- coding: utf-8 -*-
"""Train/valid/test entry point — reference-compatible semantics
(``/root/reference/train.py:125-151``): print the full config, seed, build
datasets + model, then run ``num_epoch // test_epoch_interval`` rounds of
fit + test (or test only).

Unlike the reference (config = editing ``common/args.py``), every config
field is overridable from the CLI: ``python train.py model_type=drin
dataset_name=wikidiverse batch_size=64 debug=true``.  TPU additions:
``mesh_data``/``mesh_model`` choose the device mesh, ``enable_checkpointing``
turns on Orbax checkpoint/resume (the reference always disables
checkpointing, train.py:115).
"""

from __future__ import annotations

import sys

import jax
import numpy as np

from drin_tpu.common.cli import parse_overrides


def main(argv=None) -> None:
    from drin_tpu.common.config import config_summary, make_config
    from drin_tpu.data.dataset import create_datasets
    from drin_tpu.models import get_model
    from drin_tpu.train.trainer import Trainer

    overrides = parse_overrides(argv if argv is not None else sys.argv[1:])
    model_type = overrides.pop("model_type", "drin")
    dataset_name = overrides.pop("dataset_name", "wikidiverse")
    cfg = make_config(model_type, dataset_name, **overrides)

    # multi-host: join the cluster before any device query.  Launch one
    # process per host with e.g.  ``python train.py mesh_data=8 mesh_model=2
    # coordinator_address=host0:9876 num_processes=2 process_id=$RANK``
    # (parallel/distributed.py; the reference is single-process, SURVEY §2.11)
    if cfg.num_processes > 1:
        from drin_tpu.parallel import distributed as dist

        dist.initialize(cfg)
    # mesh selection.  mesh_data == -1 means "all remaining devices": on a
    # single slice it resolves to len(devices) // mesh_model; on a
    # multi-slice pod it stays IMPLICIT (data=None) so make_hybrid_mesh can
    # size the data axis per slice (uneven slices contribute
    # min(slice)//model rows each — an explicit global width can't express
    # that).  Resolution happens here, after cluster init, so the global
    # device count is correct and reading cfg.num_devices never touches the
    # backend as a side effect.
    from drin_tpu.parallel.mesh import group_by_slice, make_hybrid_mesh, make_mesh

    implicit = cfg.mesh_data == -1
    slices = group_by_slice()
    mesh = None
    if implicit or cfg.num_devices > 1:
        if len(slices) > 1:
            # multi-slice pod: model (candidate) axis within a slice so its
            # per-step collectives ride ICI; only DP reductions cross DCN
            mesh = make_hybrid_mesh(
                slices, model=cfg.mesh_model,
                data=None if implicit else cfg.mesh_data)
        else:
            mesh = make_mesh(cfg)  # resolves -1 against the device list
        # record the realized width so downstream cfg.num_devices is real
        cfg = cfg.replace(mesh_data=mesh.shape["data"])
        if mesh.devices.size == 1:
            mesh = None  # a 1-device "mesh" is just single-chip
    if jax.process_index() == 0:
        print(config_summary(cfg))

    # seed discipline (reference pl.seed_everything, train.py:134)
    np.random.seed(cfg.seed)
    root_key = jax.random.key(cfg.seed)

    model, kind = get_model(cfg)
    feats_fn = None
    if kind == "online":
        from drin_tpu.data.online import OnlineMELDataset

        train_ds, valid_ds, test_ds = (OnlineMELDataset(cfg, s) for s in ("train", "valid", "test"))
    else:
        train_ds, valid_ds, test_ds = create_datasets(cfg)
        # device-resident entity tables: ship [B, C] row indices per batch
        # and gather in HBM (data/device_store.py).  Pooled tables replicate
        # (small); the non-pooled token-level table row-shards over the
        # 'model' mesh axis — it exceeds one chip's HBM at full scale.
        shard_rows = (not cfg.entity_pooling_cached and mesh is not None
                      and mesh.shape["model"] > 1)
        if (cfg.device_entity_tables and cfg.dataset_name == "wikimel"
                and (cfg.entity_pooling_cached or shard_rows)):
            from drin_tpu.data.device_store import (DeviceEntityStore,
                                                    include_for)
            from drin_tpu.parallel.mesh import replicated

            # GHMFC's entity tower reads ONLY the text table: skip
            # uploading — and dead-gathering per step — the image + object
            # tables (the one serving/training-shared policy:
            # device_store.include_for)
            store = DeviceEntityStore(
                cfg, train_ds.tables, mesh=mesh, shard_rows=shard_rows,
                include=include_for(kind),
                sharding=replicated(mesh) if (mesh is not None and not shard_rows) else None)
            feats_fn = store.drin_feats_fn() if kind == "drin" else store.baseline_feats_fn()
            kind = kind + "_rows"
            if jax.process_index() == 0:
                print(f"device entity tables resident: {store.nbytes / 1e6:.0f} MB"
                      + (" (row-sharded over the model axis)" if shard_rows else ""))
    example = next(test_ds.batches(cfg.batch_size, kind=kind, pad_to_full=True))
    feats = tuple(np.asarray(x) for x in example[:-1])
    # online: init at a 2-row slice — a full-batch f32 init traces the
    # 13x512-token zipped BERT forward at B=batch_size and OOMs one chip on
    # its own (benchmarks/online_bert.py inits at B=2 for the same reason);
    # parameter shapes are batch-independent
    init_feats = tuple(x[:2] for x in feats) if kind == "online" else feats
    params = model.init(root_key, init_feats if feats_fn is None else feats_fn(init_feats))["params"]
    if kind == "online" and cfg.bert_checkpoint:
        # load the pretrained BERT tower (the reference downloads
        # bert-base-cased at model build, ghmfc.py:13-18)
        from drin_tpu.encoders.checkpoints import load_bert

        _, bert_params = load_bert(cfg.bert_checkpoint, model.bert_cfg)
        params = dict(params, bert=bert_params)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    if jax.process_index() == 0:  # one summary line per run, like the others
        print(f"model: {cfg.model_type} ({n_params:,} params), "
              f"devices: {cfg.num_devices} ({'mesh' if mesh else 'single chip'})")

    apply_fn = lambda p, f: model.apply({"params": p}, f)
    # training runs with dropout active (the reference trains in torch train
    # mode; transformer_dropout=0.1 applies to the multimodal/transformer
    # configs); eval stays deterministic
    train_apply_fn = lambda p, f, rng: model.apply(
        {"params": p}, f, deterministic=False, rngs={"dropout": rng})
    trainer = Trainer(cfg, apply_fn, params, mesh,
                      batch_fields=type(example)._fields, example_batch=example,
                      feats_fn=feats_fn, train_apply_fn=train_apply_fn)

    try:
        if cfg.test_only:
            trainer.test(test_ds, kind=kind)
            return
        rounds = max(cfg.num_epoch // cfg.test_epoch_interval, 1)
        for _ in range(rounds):  # reference fit/test chunks (train.py:141-144)
            trainer.fit(train_ds, valid_ds, cfg.test_epoch_interval, kind=kind)
            trainer.test(test_ds, kind=kind)
    finally:
        if cfg.num_processes > 1:
            from drin_tpu.parallel import distributed as dist

            dist.shutdown()


if __name__ == "__main__":
    main()
