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
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks._tables import N_ENTITIES  # noqa: E402


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


def make_ghmfc_store_quantized(cfg, n: int, seed: int = 1):
    """int8 text-only variant: the same-seed random table quantized IN HBM
    with per-(row, slot) scales (device_store.quantize_entity_rows
    per_slot=True scheme) — no host transfer."""
    import jax
    import jax.numpy as jnp

    from drin_tpu.data.device_store import DeviceEntityStore

    D = cfg.bert_embed_dim
    rng = np.random.default_rng(0)
    tiny = {"entity_text_feature":
            rng.standard_normal((64, 2, D)).astype(np.float32)}
    store = DeviceEntityStore(cfg, tiny, dtype=jnp.bfloat16, quantize=True,
                              include=("text",))
    text = jax.random.normal(jax.random.key(seed), (n, 2, D), jnp.float32)
    # per-(row, slot) scales, the production pooled-text scheme — the one
    # shared quantizer (benchmarks/_tables.quantize_on_device)
    from benchmarks._tables import quantize_on_device

    store.text, store.text_scale = quantize_on_device(text, 2)
    store.n_rows = n
    store.nbytes = sum(int(np.prod(t.shape)) * t.dtype.itemsize
                       for t in store._tables())
    return store


def make_ghmfc_store_fused(cfg, n: int, storeq):
    """Fused-kernel text-only variant: ``storeq``'s int8 codes packed IN
    HBM into the [n, m, 128] slab + per-sub-row scales the Pallas
    gather+dequant kernel reads."""
    import jax
    import jax.numpy as jnp

    from drin_tpu.data.device_store import DeviceEntityStore

    D = cfg.bert_embed_dim
    rng = np.random.default_rng(0)
    tiny = {"entity_text_feature":
            rng.standard_normal((64, 2, D)).astype(np.float32)}
    store = DeviceEntityStore(cfg, tiny, dtype=jnp.bfloat16, quantize=True,
                              fused_gather=True, include=("text",))
    m = store.packed.shape[1]
    lo, hi, _, _ = store._layout["text"]
    sub = hi - lo

    @jax.jit
    def pack(text, tsc):
        codes = text.reshape(n, -1, 128)
        pad = jnp.zeros((n, m - sub, 128), jnp.int8)
        sc = jnp.repeat(tsc.reshape(n, -1), sub // tsc.reshape(n, -1).shape[1],
                        axis=1)
        sc = jnp.concatenate([sc, jnp.ones((n, m - sub), jnp.float32)], axis=1)
        return jnp.concatenate([codes, pad], axis=1), sc

    store.packed, store.packed_scales = pack(storeq.text, storeq.text_scale)
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

    if tiny:
        # the smoke mode's promise is CPU: without this the sitecustomize
        # hook's axon backend is the default and a "tiny" run dispatches to
        # the high-latency relay (and hangs through an outage)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from benchmarks._timing import rank_chain_time
    from drin_tpu.common.config import make_config
    from drin_tpu.models import get_model

    log(f"devices: {jax.devices()}")
    overrides = dict(dataset_root="/tmp/unused", compute_dtype="bfloat16")
    if tiny:
        # bert_embed_dim=128: each pooled text SLOT is then exactly one
        # 128-lane sub-row (fused_gather_supported needs slot % 128 == 0),
        # so the fused-slab variant stays testable at tiny scale
        overrides.update(bert_embed_dim=128, resnet_embed_dim=64,
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

    variants = [("text_image", lambda: make_ghmfc_store(
                     cfg, n, include=("text", "image"))),
                ("text_only", lambda: store_t)]
    if "--quant" in sys.argv:
        storeq = make_ghmfc_store_quantized(cfg, n)
        variants += [("text_only_int8", lambda: storeq),
                     ("text_only_fused",
                      lambda: make_ghmfc_store_fused(cfg, n, storeq))]

    results = {}
    for name, build in variants:
        store = build()
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

    summary = {"measurement": "ghmfc_rank_store_ab_summary",
               "text_only_speedup":
                   round(results["text_image"] / results["text_only"], 3)}
    if "text_only_fused" in results:
        summary["fused_vs_bf16"] = round(
            results["text_only_fused"] / results["text_only"], 3)
        summary["int8_vs_bf16"] = round(
            results["text_only_int8"] / results["text_only"], 3)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
