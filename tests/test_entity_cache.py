# -*- coding: utf-8 -*-
"""The pooled entity-text cache must be numerically equivalent to per-batch
token pooling (it hoists the same deterministic computation out of the
training loop)."""

import numpy as np
import jax
import pytest

from drin_tpu.data.dataset import MELFeatureDataset, load_wikimel_entity_tables
from drin_tpu.data.synthetic import make_synthetic_store, tiny_config
from drin_tpu.models.drin import DRIN
from drin_tpu.models.ghmfc import GHMFC


@pytest.fixture(scope="module")
def wm_store(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("wm-cache"))
    cfg = tiny_config("wikimel", "drin", preprocess_dir=d)
    make_synthetic_store(cfg, n_mentions=10, n_entities=30, seed=7)
    return d


def _scores(cfg, model_cls, kind, store):
    tables = load_wikimel_entity_tables(cfg)
    ds = MELFeatureDataset(cfg, "train", tables)
    batch = next(ds.batches(4, kind=kind))
    model = model_cls(cfg)
    params = model.init(jax.random.key(0), batch[:-1])["params"]
    return params, np.asarray(model.apply({"params": params}, batch[:-1])), batch


def test_drin_cached_equals_uncached(wm_store):
    base = tiny_config("wikimel", "drin", preprocess_dir=wm_store)
    raw = base.replace(cache_entity_pooling=False)
    cached = base.replace(cache_entity_pooling=True)
    assert cached.entity_pooling_cached and not raw.entity_pooling_cached

    p_raw, s_raw, b_raw = _scores(raw, DRIN, "drin", wm_store)
    tables = load_wikimel_entity_tables(cached)
    ds = MELFeatureDataset(cached, "train", tables)
    b_c = next(ds.batches(4, kind="drin"))
    assert b_c.entity_text_feature.shape[-2] == 2  # (pooled, cls)
    model = DRIN(cached)
    s_c = np.asarray(model.apply({"params": p_raw}, b_c[:-1]))
    np.testing.assert_allclose(s_c, s_raw, rtol=1e-5, atol=1e-6)


def test_ghmfc_cached_equals_uncached(wm_store):
    base = tiny_config("wikimel", "ghmfc", preprocess_dir=wm_store).replace(
        mention_final_layer_name="linear", mention_final_representation="avg extract")
    raw = base.replace(cache_entity_pooling=False)
    cached = base.replace(cache_entity_pooling=True)

    p_raw, s_raw, _ = _scores(raw, GHMFC, "baseline", wm_store)
    tables = load_wikimel_entity_tables(cached)
    ds = MELFeatureDataset(cached, "train", tables)
    b_c = next(ds.batches(4, kind="baseline"))
    model = GHMFC(cached)
    s_c = np.asarray(model.apply({"params": p_raw}, b_c[:-1]))
    np.testing.assert_allclose(s_c, s_raw, rtol=1e-5, atol=1e-6)


def test_max_pooling_disables_cache(wm_store):
    cfg = tiny_config("wikimel", "ghmfc", preprocess_dir=wm_store).replace(
        cache_entity_pooling=True, entity_final_pooling="max")
    assert not cfg.entity_pooling_cached  # cache cannot represent max pooling
    tables = load_wikimel_entity_tables(cfg)
    assert tables["entity_text_feature"].ndim == 3  # raw token table kept


def test_projected_tables_match_raw_forward(tmp_path):
    """Eval projection cache: pushing the trained entity-side linears into
    the frozen tables (project_drin_tables + entity_projected=True) must
    reproduce the raw-path scores — linear(gather(T)) == gather(linear(T))."""
    from drin_tpu.data.dataset import MELFeatureDataset, load_wikimel_entity_tables
    from drin_tpu.data.device_store import project_drin_tables
    from drin_tpu.data.synthetic import make_synthetic_store, tiny_config
    from drin_tpu.models.drin import DRIN

    d = str(tmp_path / "store")
    cfg = tiny_config("wikimel", "drin", preprocess_dir=d)
    make_synthetic_store(cfg, n_mentions=8, n_entities=30, seed=21)
    tables = load_wikimel_entity_tables(cfg)
    ds = MELFeatureDataset(cfg, "train", tables)
    batch = ds.drin_batch(np.arange(6))
    model = DRIN(cfg)
    params = model.init(jax.random.key(3), batch[:-1])["params"]
    want = np.asarray(model.apply({"params": params}, batch[:-1]))

    proj = project_drin_tables(cfg, tables, params)
    assert proj["entity_image_feature"].shape == (30, cfg.gcn_embed_dim)
    rows = ds.entity_row_idx[np.arange(6)]
    feats = list(batch[:-1])
    feats[7] = proj["entity_text_feature"][rows]   # [B, C, 2, D]
    feats[9] = proj["entity_image_feature"][rows]  # [B, C, Dg]
    cfg_p = cfg.replace(entity_projected=True)
    got = np.asarray(DRIN(cfg_p).apply({"params": params}, tuple(feats)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)
