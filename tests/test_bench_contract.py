# -*- coding: utf-8 -*-
"""Driver-contract guards for bench.py.

The benchmark's ``vs_baseline`` column silently degrades to null if the
in-place reference measurement breaks (it did once: the pooled-cache batch
layout reached the reference model, which consumes raw token-level entity
features).  Pin the contract: the reference measurement must run and return
a positive pairs/s on a tiny batch, and the ours-vs-reference batch layouts
must stay consistent with each side's expectations.
"""

import os

import numpy as np
import pytest


def _bench(tmp_path, monkeypatch):
    import bench

    monkeypatch.setattr(bench, "B", 4)
    monkeypatch.setattr(bench, "BASELINE_CACHE", str(tmp_path / "cache.json"))
    return bench


def test_measure_reference_runs_in_place(tmp_path, monkeypatch):
    bench = _bench(tmp_path, monkeypatch)
    pps = bench.measure_reference()
    assert np.isfinite(pps) and pps > 0
    assert os.path.exists(bench.BASELINE_CACHE)
    # second call reads the cache (no torch re-run)
    assert bench.measure_reference() == pytest.approx(pps)


def test_reference_batch_is_token_level(monkeypatch):
    """The reference consumes [B, C, Le, D] entity text (drin/data.py:89-93);
    the pooled-cache layout must never be handed to it."""
    import __graft_entry__ as g
    from drin_tpu.common.config import make_config

    cfg = make_config("drin", "wikimel", dataset_root="/tmp/unused",
                      cache_entity_pooling=False)
    feats, _ = g._random_drin_batch(cfg, B=2, rng=np.random.default_rng(0))
    etf, etm = feats[7], feats[8]
    assert etf.ndim == 4 and etf.shape[2] == cfg.max_entity_attr_token_len
    assert etm.shape == etf.shape[:3]  # per-candidate token masks
