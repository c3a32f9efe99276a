# -*- coding: utf-8 -*-
"""A/B: GHMFC rank-stage latency, text+image store vs text-only store.

The reference GHMFC entity tower reads ONLY entity text
(/root/reference/baselines/ghmfc.py:202-251 — no entity-image branch), yet
a ``("text", "image")`` store gathers the image rows per request anyway:
at B=64, C=101 that is ``64*101*1*2048`` bf16 = ~26MB of dead gather
traffic next to ~2MB of text rows.  ``Ranker`` now builds GHMFC stores
with ``include=("text",)`` (serve.py); this script measures what that
narrowing is worth on the rank program itself, same session, same jitted
methodology as every other rank A/B (``benchmarks/_timing.rank_chain_time``).

Run on the real TPU (no JAX_PLATFORMS=cpu); ``--tiny`` smoke-tests the
harness on CPU at toy sizes.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

from benchmarks._tables import N_ENTITIES


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def make_ghmfc_store(cfg, n: int, include, seed: int = 1):
    """A full-scale text(+image) GHMFC store: built from a 64-row host
    placeholder, then the big tables are generated ON device and swapped in
    (host→device upload through the relay is ~2.4MB/s — CLAUDE.md)."""
    import jax
    import jax.numpy as jnp

    from drin_tpu.data.device_store import DeviceEntityStore

    D, Dr = cfg.bert_embed_dim, cfg.resnet_embed_dim
    rng = np.random.default_rng(0)
    tiny = {
        "entity_text_feature": rng.standard_normal((64, 2, D)).astype(np.float32),
        "entity_image_feature": rng.standard_normal((64, 1, Dr)).astype(np.float32),
    }
    store = DeviceEntityStore(cfg, tiny, dtype=jnp.bfloat16, include=include)
    keys = jax.random.split(jax.random.key(seed), 2)
    store.text = jax.random.normal(keys[0], (n, 2, D), jnp.bfloat16)
    if "image" in include:
        store.image = jax.random.normal(keys[1], (n, 1, Dr), jnp.bfloat16)
    store.n_rows = n
    store.nbytes = sum(int(np.prod(t.shape)) * t.dtype.itemsize
                       for t in store._tables())
    return store


def make_rows_batch(cfg, B: int, rng, n: int):
    """Device-resident BaselineRowsBatch features (sans answer): random
    mention-side tensors + a [B, C] row matrix, floats in bf16."""
    import jax
    import jax.numpy as jnp

    C = cfg.num_candidates_model
    L, D = cfg.max_mention_sentence_len, cfg.bert_embed_dim
    R, Dr = cfg.resnet_num_region, cfg.resnet_embed_dim
    lens = rng.integers(6, L, size=B)
    start = rng.integers(1, 4, size=B)
    batch = (
        rng.standard_normal((B, L, D), dtype=np.float32),
        (np.arange(L)[None] < lens[:, None]).astype(np.int64),
        start.astype(np.int64),
        (start + rng.integers(1, 3, size=B)).astype(np.int64),
        rng.standard_normal((B, R, Dr), dtype=np.float32),
        rng.integers(0, n, (B, C)).astype(np.int32),
    )
    cast16 = lambda x: (jnp.asarray(x, jnp.bfloat16)
                        if np.issubdtype(x.dtype, np.floating)
                        else jnp.asarray(x))
    return tuple(jax.device_put(cast16(x)) for x in batch)


def main():
    tiny = "--tiny" in sys.argv
    import jax
    import jax.numpy as jnp

    from benchmarks._timing import rank_chain_time
    from drin_tpu.common.config import make_config
    from drin_tpu.models import get_model

    log(f"devices: {jax.devices()}")
    overrides = dict(dataset_root="/tmp/unused", compute_dtype="bfloat16")
    if tiny:
        overrides.update(bert_embed_dim=32, resnet_embed_dim=64,
                         max_mention_sentence_len=16, resnet_num_region=4,
                         mention_final_output_dim=32,
                         entity_final_output_dim=32,
                         transformer_num_layers=2, transformer_num_heads=2,
                         transformer_ffn_hidden_size=32)
    cfg = make_config("ghmfc", "wikimel", **overrides)
    n = 512 if tiny else N_ENTITIES
    B = 8 if tiny else 64
    rng = np.random.default_rng(0)

    model, kind = get_model(cfg)
    assert kind == "baseline"
    batch = make_rows_batch(cfg, B, rng, n)

    # init params through a text-only store's feats (the model sees the
    # same tuple shapes either way — image slot differs only in content)
    store_t = make_ghmfc_store(cfg, n, include=("text",))
    feats_fn_t = store_t.baseline_feats_fn()
    params = jax.jit(
        lambda b, t: model.init(jax.random.key(0), feats_fn_t(b, t))
    )(batch, feats_fn_t.tables)["params"]
    dev_params = jax.device_put(params)
    apply_fn = lambda p, feats: model.apply({"params": p}, feats)

    results = {}
    for name, include in (("text_image", ("text", "image")),
                          ("text_only", ("text",))):
        store = store_t if include == ("text",) else make_ghmfc_store(
            cfg, n, include=include)
        feats_fn = store.baseline_feats_fn()
        log(f"{name}: {store.nbytes / 1e6:.0f} MB resident; timing "
            f"B={B} rank...")
        dt = rank_chain_time(apply_fn, feats_fn, dev_params, batch,
                             feats_fn.tables, K=4, iters=10)
        results[name] = dt
        print(json.dumps({
            "measurement": "ghmfc_rank_store_ab", "store": name,
            "batch": B, "entities": n,
            "resident_mb": round(store.nbytes / 1e6, 1),
            "ms_per_rank": round(dt * 1e3, 3)}), flush=True)

    speedup = results["text_image"] / results["text_only"]
    print(json.dumps({"measurement": "ghmfc_rank_store_ab_summary",
                      "text_only_speedup": round(speedup, 3)}), flush=True)


if __name__ == "__main__":
    main()
