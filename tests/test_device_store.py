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


def test_step_does_not_embed_tables_as_constants(wm):
    """Device tables must cross the jit boundary as ARGUMENTS.  Closure-
    captured tables get baked into the lowered program as dense constants —
    harmless at test sizes, but a multi-hundred-MB production table makes
    the compile hang (observed on the target chip; BASELINE.md serving
    notes).  Guard: lower a step against a ~13MB table and require the
    StableHLO text to stay small (an embedded dense literal would be tens
    of MB of text)."""
    from drin_tpu.train.trainer import build_step_fns, create_train_state

    cfg, _, ds = wm
    N = 26_000  # x 2 x 64 f32 = 13.3MB text table
    rng = np.random.default_rng(0)
    D, Dr, Te = cfg.bert_embed_dim, cfg.resnet_embed_dim, cfg.entity_object_topk
    big_tables = {
        "entity_text_feature": rng.standard_normal((N, 2, D)).astype(np.float32),
        "entity_image_feature": rng.standard_normal((N, 1, Dr)).astype(np.float32),
        "entity_object_feature": rng.standard_normal((N, Te, 1, Dr)).astype(np.float32),
        "entity_object_score": rng.uniform(0, 1, (N, Te)).astype(np.float32),
    }
    store = DeviceEntityStore(cfg, big_tables, dtype=jnp.float32)
    feats_fn = store.drin_feats_fn()
    assert feats_fn.tables is not None  # the pass-as-argument contract

    rows_batch = ds.drin_rows_batch(np.arange(4))
    model = DRIN(cfg)
    feats = feats_fn(tuple(jnp.asarray(np.asarray(x)) for x in rows_batch[:-1]))
    params = model.init(jax.random.key(0), feats)["params"]
    state, tx = create_train_state(params, cfg)
    fns = build_step_fns(lambda p, f: model.apply({"params": p}, f), cfg, tx,
                         feats_fn=feats_fn)
    batch = tuple(np.asarray(x) for x in rows_batch)
    lowered = fns.train_step.lower(state, batch, np.ones((4,), np.float32),
                                   __import__("drin_tpu.train.metrics",
                                              fromlist=["init_state"]).init_state(cfg.metrics_topk))
    text = lowered.as_text()
    total = sum(np.asarray(t).nbytes for t in feats_fn.tables)
    assert total > 5_000_000  # the table really is big
    assert len(text) < 2_000_000, (
        f"lowered program is {len(text)/1e6:.1f}MB of text - entity tables "
        "are being embedded as constants instead of passed as arguments")
