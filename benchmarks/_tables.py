# -*- coding: utf-8 -*-
"""Shared full-scale device-table fixture for the benchmark scripts.

WikiMEL-scale entity tables are generated ON DEVICE: shipping ~2.5GB of
synthetic f32 through a relay-attached host would measure the relay, not
the chip (a production host pays PCIe once at startup; BASELINE.md).

Invariant callers must keep: any ``feats_fn`` (drin_feats_fn /
baseline_feats_fn) or Ranker scoring fn must be (re)built AFTER the swap —
a previously-built one snapshots the placeholder 64-row tables and would
silently score against the stale store.
"""

from __future__ import annotations

import numpy as np

N_ENTITIES = 109_557  # WikiMEL global entity table rows (SURVEY §2.5)


def make_full_scale_store(cfg, n: int = N_ENTITIES, dtype=None, seed: int = 1):
    """A DeviceEntityStore whose tables are [n, ...] random bf16 arrays
    resident in HBM (built from a 64-row host placeholder, then swapped
    on-device)."""
    import jax
    import jax.numpy as jnp

    from drin_tpu.data.device_store import DeviceEntityStore

    dtype = dtype or jnp.bfloat16
    D, Dr, Te = cfg.bert_embed_dim, cfg.resnet_embed_dim, cfg.entity_object_topk
    rng = np.random.default_rng(0)
    tiny = {
        "entity_text_feature": rng.standard_normal((64, 2, D)).astype(np.float32),
        "entity_image_feature": rng.standard_normal((64, 1, Dr)).astype(np.float32),
        "entity_object_feature": rng.standard_normal((64, Te, 1, Dr)).astype(np.float32),
        "entity_object_score": rng.uniform(0, 1, (64, Te)).astype(np.float32),
    }
    store = DeviceEntityStore(cfg, tiny, dtype=dtype)
    keys = jax.random.split(jax.random.key(seed), 4)
    store.text = jax.random.normal(keys[0], (n, 2, D), dtype)
    store.image = jax.random.normal(keys[1], (n, 1, Dr), dtype)
    store.obj = jax.random.normal(keys[2], (n, Te, 1, Dr), dtype)
    store.obj_score = jax.random.uniform(keys[3], (n, Te), dtype)
    store.n_rows = n
    store.nbytes = sum(int(np.prod(t.shape)) * t.dtype.itemsize
                       for t in store._tables())
    return store


def make_device_rank_batch(cfg, B: int, rng, n: int = N_ENTITIES):
    """The device-resident rank request batch every rank benchmark times:
    random mention-side features plus a [B, C] matrix of random entity-table
    rows (the production WikiMEL input layout, drin/data.py:85-126 in the
    reference), floats cast to bf16 on device (serving dtype), integer
    tensors left untouched.  Shared by bench.py's secondary rank rows and
    benchmarks/serving.py's store A/Bs so the fixture layout can't drift
    between them."""
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g

    C = cfg.num_candidates_model
    feats, _ = g._random_drin_batch(cfg, B=B, rng=rng)
    rows = rng.integers(0, n, (B, C)).astype(np.int32)
    batch = feats[:7] + (rows,) + feats[12:14]
    cast16 = lambda x: (jnp.asarray(np.asarray(x), jnp.bfloat16)
                        if np.issubdtype(np.asarray(x).dtype, np.floating)
                        else jnp.asarray(np.asarray(x)))
    return tuple(jax.device_put(cast16(x)) for x in batch)


def quantize_on_device(x, lead: int = 1):
    """The ONE jitted device-side quantizer every full-scale benchmark
    store shares (ghmfc_store.py included): per-entity max-abs int8, the
    device_store.quantize_entity_rows scheme.  ``lead=2``: per-(row, slot)
    scales for the pooled text table (per_slot=True, ADVICE r4)."""
    import jax
    import jax.numpy as jnp

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def q(x, lead):
        flat = x.reshape(x.shape[:lead] + (-1,))
        s = jnp.max(jnp.abs(flat), axis=-1)
        s = jnp.where(s == 0, 1.0, s)
        codes = jnp.clip(jnp.round(flat / s[..., None] * 127.0), -127, 127)
        return codes.astype(jnp.int8).reshape(x.shape), (s / 127.0).astype(jnp.float32)

    return q(x, lead)


def make_full_scale_store_quantized(cfg, n: int = N_ENTITIES, seed: int = 1):
    """int8 variant of :func:`make_full_scale_store`: the same-seed random
    tables quantized IN HBM (:func:`quantize_on_device`) — no host
    transfer; the f32 intermediates are freed as each table is replaced."""
    import jax.numpy as jnp

    store = make_full_scale_store(cfg, n, dtype=jnp.float32, seed=seed)
    q = quantize_on_device
    store.quantized = True
    store.dtype = jnp.bfloat16  # dequantized gather rows in serving dtype
    store.text, store.text_scale = q(store.text, 2)
    store.image, store.image_scale = q(store.image)
    store.obj, store.obj_scale = q(store.obj)
    store.obj_score = store.obj_score.astype(jnp.bfloat16)
    store.nbytes = sum(int(np.prod(t.shape)) * t.dtype.itemsize
                       for t in store._tables())
    return store


def make_full_scale_store_fused(cfg, n: int = N_ENTITIES, seed: int = 1,
                                base=None):
    """Fused-kernel variant: the same-seed quantized tables packed IN HBM
    into the [n, m, 128] int8 slab + [n, m] per-sub-row scales the Pallas
    gather+dequant kernel reads (ops/pallas/gather.py) — no host transfer;
    per-table int8 intermediates are freed as the slab is assembled.

    ``base``: an existing :func:`make_full_scale_store_quantized` store to
    pack from (saves rebuilding it when the caller already measured the
    int8 store in the same session)."""
    import jax
    import jax.numpy as jnp

    from drin_tpu.data.device_store import DeviceEntityStore

    storeq = base or make_full_scale_store_quantized(cfg, n, seed=seed)
    D, Dr, Te = cfg.bert_embed_dim, cfg.resnet_embed_dim, cfg.entity_object_topk
    rng = np.random.default_rng(0)
    tiny = {
        "entity_text_feature": rng.standard_normal((64, 2, D)).astype(np.float32),
        "entity_image_feature": rng.standard_normal((64, 1, Dr)).astype(np.float32),
        "entity_object_feature": rng.standard_normal((64, Te, 1, Dr)).astype(np.float32),
        "entity_object_score": rng.uniform(0, 1, (64, Te)).astype(np.float32),
    }
    store = DeviceEntityStore(cfg, tiny, dtype=jnp.bfloat16, quantize=True,
                              fused_gather=True)
    m = store.packed.shape[1]
    subs = [(hi - lo) for (lo, hi, _, _) in
            (store._layout[k] for k in ("text", "image", "obj"))]

    @jax.jit
    def pack(text, image, obj, tsc, isc, osc):
        parts = [t.reshape(n, -1, 128) for t in (text, image, obj)]
        pad = jnp.zeros((n, m - sum(subs), 128), jnp.int8)
        packed = jnp.concatenate(parts + [pad], axis=1)
        scs = [jnp.repeat(s.reshape(n, -1), sub // s.reshape(n, -1).shape[1],
                          axis=1)
               for s, sub in zip((tsc, isc, osc), subs)]
        scs.append(jnp.ones((n, m - sum(subs)), jnp.float32))
        return packed, jnp.concatenate(scs, axis=1)

    store.packed, store.packed_scales = pack(
        storeq.text, storeq.image, storeq.obj,
        storeq.text_scale, storeq.image_scale, storeq.obj_scale)
    store.obj_score = storeq.obj_score
    store.n_rows = n
    store.nbytes = sum(int(np.prod(t.shape)) * t.dtype.itemsize
                       for t in store._tables())
    del storeq
    return store
