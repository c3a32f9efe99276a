# -*- coding: utf-8 -*-
"""Device-resident entity tables: in-step gather must equal the host-gather
path exactly (same pooled tables, same rows)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from drin_tpu.data.dataset import MELFeatureDataset, load_wikimel_entity_tables
from drin_tpu.data.device_store import DeviceEntityStore
from drin_tpu.data.synthetic import make_synthetic_store, tiny_config
from drin_tpu.models.drin import DRIN


@pytest.fixture(scope="module")
def wm(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("wm-dev"))
    cfg = tiny_config("wikimel", "drin", preprocess_dir=d)
    make_synthetic_store(cfg, n_mentions=10, n_entities=25, seed=11)
    tables = load_wikimel_entity_tables(cfg)
    ds = MELFeatureDataset(cfg, "train", tables)
    return cfg, tables, ds


def test_rows_path_equals_host_gather(wm):
    cfg, tables, ds = wm
    store = DeviceEntityStore(cfg, tables, dtype=jnp.float32)
    feats_fn = store.drin_feats_fn()

    idx = np.arange(4)
    host_batch = ds.drin_batch(idx)
    rows_batch = ds.drin_rows_batch(idx)

    model = DRIN(cfg)
    params = model.init(jax.random.key(0), host_batch[:-1])["params"]
    s_host = np.asarray(model.apply({"params": params}, host_batch[:-1]))
    s_rows = np.asarray(jax.jit(lambda p, f: model.apply({"params": p}, feats_fn(f)))(
        params, tuple(jnp.asarray(np.asarray(x)) for x in rows_batch[:-1])))
    np.testing.assert_allclose(s_rows, s_host, rtol=1e-6)
    np.testing.assert_array_equal(rows_batch.answer, host_batch.answer)


def test_rows_batch_is_small(wm):
    cfg, tables, ds = wm
    host = ds.drin_batch(np.arange(4))
    rows = ds.drin_rows_batch(np.arange(4))
    host_bytes = sum(np.asarray(x).nbytes for x in host)
    rows_bytes = sum(np.asarray(x).nbytes for x in rows)
    assert rows_bytes < host_bytes  # the point of the feature


def test_trainer_with_device_store(wm):
    from drin_tpu.train.trainer import Trainer

    cfg, tables, ds = wm
    store = DeviceEntityStore(cfg, tables, dtype=jnp.float32)
    feats_fn = store.drin_feats_fn()
    example = next(ds.batches(cfg.batch_size, kind="drin_rows", pad_to_full=True))
    model = DRIN(cfg)
    params = model.init(jax.random.key(0), feats_fn(tuple(np.asarray(x) for x in example[:-1])))["params"]
    apply_fn = lambda p, f: model.apply({"params": p}, f)
    tr = Trainer(cfg, apply_fn, params, feats_fn=feats_fn, log=lambda *a: None)
    out = tr._run_epoch(ds, "train", True, "drin_rows")
    assert np.isfinite(out["loss"])
