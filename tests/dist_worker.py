# -*- coding: utf-8 -*-
"""Worker for the multi-process SPMD test (not a test module).

Runs 2 training epochs + a test epoch of tiny-DRIN over a shared synthetic
store on a (4, 2) global mesh, either as one process owning all 8 virtual
CPU devices (the oracle) or as one rank of an N-process cluster (4 devices
per rank).  Writes the result JSON from process 0.

Usage: python dist_worker.py <pid> <nproc> <store_dir> <out_json> <port>
"""

import json
import os
import sys


def _param_digest(params) -> float:
    """ORDER-SENSITIVE param digest: every element is weighted by a
    position- and leaf-dependent factor, so a multi-host restore that
    reassembles shards in the wrong rank order (rows permuted across
    processes) changes it — a plain L1 sum would not."""
    import jax
    import numpy as np

    tot = 0.0
    for i, x in enumerate(jax.tree.leaves(params)):
        x = np.asarray(x, np.float64).ravel()
        tot += float(np.dot(x, np.cos(0.03 * np.arange(x.size) + i)))
    return tot


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    store, out, port = sys.argv[3], sys.argv[4], sys.argv[5]
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={8 // nproc}").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    if nproc > 1:
        from drin_tpu.parallel import distributed as dist

        dist.initialize(coordinator_address=f"localhost:{port}",
                        num_processes=nproc, process_id=pid)
    assert len(jax.devices()) == 8, jax.devices()

    import numpy as np

    from drin_tpu.data.dataset import create_datasets
    from drin_tpu.data.synthetic import tiny_config
    from drin_tpu.models import get_model
    from drin_tpu.parallel import mesh as pmesh
    from drin_tpu.train.trainer import Trainer

    ckpt_dir = sys.argv[6] if len(sys.argv) > 6 else ""
    mode = sys.argv[7] if len(sys.argv) > 7 else "wd"
    if mode == "online":
        # online GHMFC with GLOBAL length bucketing: every host must derive
        # the same bucket shape from the global batch indices
        # (data/online._precompute_lengths; VERDICT r2 weak #5)
        from drin_tpu.data.online import OnlineMELDataset
        from drin_tpu.data.synthetic import make_synthetic_online_store
        from drin_tpu.encoders.bert import BertConfig
        from drin_tpu.models.ghmfc import GHMFCOnline

        cfg, tok = make_synthetic_online_store(store, write=False)
        cfg = cfg.replace(batch_size=8, learning_rate=3e-3, metrics_topk=(1,))
        train_ds, valid_ds, test_ds = (
            OnlineMELDataset(cfg, s, tokenizer=tok) for s in ("train", "valid", "test"))
        if nproc > 1:
            assert train_ds._men_len is not None, "bucketing must stay ACTIVE multi-process"
            assert train_ds._ent_len is not None
        bert_cfg = BertConfig(vocab_size=64, hidden_size=16, num_hidden_layers=1,
                              num_attention_heads=2, intermediate_size=32,
                              max_position_embeddings=cfg.max_bert_len)
        model, kind = GHMFCOnline(cfg, bert_cfg), "online"
    else:
        dataset_name = "wikimel" if mode == "wm_rows" else "wikidiverse"
        cfg = tiny_config(dataset_name, "drin", preprocess_dir=store).replace(
            batch_size=8, learning_rate=3e-3,
            enable_checkpointing=bool(ckpt_dir), checkpoint_dir=ckpt_dir or "unused")
        train_ds, valid_ds, test_ds = create_datasets(cfg)
        model, kind = get_model(cfg)
    mesh = pmesh.make_mesh(devices=jax.devices(), data=4, model=2)
    feats_fn = None
    if mode == "wm_rows":
        # pod-production wikimel path: device-resident entity tables
        # ROW-SHARDED over the model axis, spanning both processes
        from drin_tpu.data.device_store import DeviceEntityStore

        store_dev = DeviceEntityStore(cfg, train_ds.tables, mesh=mesh, shard_rows=True)
        feats_fn = store_dev.drin_feats_fn()
        kind = "drin_rows"
    assert not (ckpt_dir and mode == "wm_rows")
    example = next(test_ds.batches(cfg.batch_size, kind=kind, pad_to_full=True))
    # init from a dense batch (host-gathered) so no collective runs pre-jit
    dense_kind = "online" if mode == "online" else "drin"
    dense = next(test_ds.batches(cfg.batch_size, kind=dense_kind, pad_to_full=True))
    params = model.init(jax.random.key(0), tuple(np.asarray(x) for x in dense[:-1]))["params"]
    tr = Trainer(cfg, lambda p, f: model.apply({"params": p}, f), params, mesh,
                 batch_fields=type(example)._fields, example_batch=example,
                 feats_fn=feats_fn, log=lambda *a: None)
    losses = []
    for _ in range(2):
        losses.append(tr._run_epoch(train_ds, "train", True, kind)["loss"])
        tr.epoch += 1
        tr.save()
    test_out = tr._run_epoch(test_ds, "test", False, kind)
    p = jax.device_get(tr.state.params)
    digest = _param_digest(p)
    resumed_epoch = None
    if ckpt_dir:
        # multi-host checkpoint roundtrip: a fresh trainer must restore the
        # saved step on every process
        tr2 = Trainer(cfg, tr.apply_fn,
                      model.init(jax.random.key(1),
                                 tuple(np.asarray(x) for x in example[:-1]))["params"],
                      mesh, batch_fields=type(example)._fields, example_batch=example,
                      log=lambda *a: None)
        resumed_epoch = tr2.epoch
        p2 = jax.device_get(tr2.state.params)
        d2 = _param_digest(p2)
        assert abs(d2 - digest) < 1e-6 * max(abs(digest), 1.0), (digest, d2)
    if jax.process_index() == 0:
        with open(out, "w") as f:
            json.dump({"losses": losses, "test_loss": test_out["loss"],
                       "test_accs": test_out["accs"], "params_l1": digest,
                       "resumed_epoch": resumed_epoch}, f)
    if nproc > 1:
        from drin_tpu.parallel import distributed as dist

        dist.shutdown()


if __name__ == "__main__":
    main()
    # the gloo CPU transport can linger after shutdown; exit hard once the
    # result file is written
    os._exit(0)
