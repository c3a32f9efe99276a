# -*- coding: utf-8 -*-
"""Benchmark: offline preprocessing encoder throughput on one chip.

The reference's resnet/clip stages pin GPU batch size to **1**
(``/root/reference/preprocess/resnet.py:19``, ``clip.py:18``) and its bert
stage runs torch batches of 64; here every encoder is a jitted XLA program
at real batch sizes (preprocess/stages.py).  This measures the encoder
forward throughput that bounds each stage — the feature-extraction work for
WikiMEL's 788k entity images or the 109k-entity text table.

bf16 params/inputs, random weights (throughput is weight-independent),
chained-call device timing (BASELINE.md methodology).  One JSON line per
encoder.  NOT the driver benchmark (bench.py is).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from benchmarks._timing import timed_chain

    log(f"devices: {jax.devices()}")
    K = 4
    rng = np.random.default_rng(0)

    # ---- BERT-base text encoder at the 512-token stage shape -------------
    # fused attention mirrors what BertStage resolves on a single-device TPU
    from drin_tpu.encoders.bert import BertConfig, BertModel, resolve_fused_attention

    B = 64
    bert = BertModel(BertConfig(), fused_attention=resolve_fused_attention(None))
    ids = rng.integers(5, 28000, (2, 512)).astype(np.int32)
    params = jax.device_get(bert.init(jax.random.key(0), ids, np.ones((2, 512), np.int32))["params"])
    params = jax.device_put(jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16)
                                         if np.issubdtype(x.dtype, np.floating) else x, params))
    ids = jax.device_put(rng.integers(5, 28000, (B, 512)).astype(np.int32))
    mask = jax.device_put(np.ones((B, 512), np.int32))

    def bert_chain(eps, ids, params, mask, K=K):
        for _ in range(K):
            # float perturbation of a PARAM leaf: int-input perturbations
            # fold to identity and CSE collapses the chain (_timing.py)
            emb = params["embeddings"]
            p = dict(params, embeddings=dict(
                emb, word_embeddings=emb["word_embeddings"]
                + eps.astype(emb["word_embeddings"].dtype) * 1e-12))
            h, _ = bert.apply({"params": p}, ids, mask)
            eps = jnp.sum(h[0, 0, :8].astype(jnp.float32)) * 1e-9 + eps
        return eps

    dt = timed_chain(jax.jit(bert_chain), (ids, params, mask), K)
    print(json.dumps({"encoder": "bert-base-512tok", "batch": B,
                      "ms_per_batch": round(dt * 1e3, 2),
                      "texts_per_sec": round(B / dt, 1)}), flush=True)

    # ---- ResNet-152 image encoder at 224x224 ----------------------------
    from drin_tpu.encoders.resnet import ResNetConfig, ResNetModel

    B = 64
    resnet = ResNetModel(ResNetConfig())
    px0 = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)
    params = jax.device_get(resnet.init(jax.random.key(0), px0)["params"])
    params = jax.device_put(jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16)
                                         if np.issubdtype(x.dtype, np.floating) else x, params))
    px = jax.device_put(jnp.asarray(rng.standard_normal((B, 224, 224, 3)), jnp.bfloat16))

    def rn_chain(eps, px, params, K=K):
        for _ in range(K):
            out = resnet.apply({"params": params}, px + eps.astype(px.dtype) * 1e-12)
            pooled = out[1] if isinstance(out, tuple) else out
            eps = jnp.sum(jnp.asarray(pooled, jnp.float32).ravel()[:8]) * 1e-9 + eps
        return eps

    dt = timed_chain(jax.jit(rn_chain), (px, params), K)
    print(json.dumps({"encoder": "resnet152-224px", "batch": B,
                      "ms_per_batch": round(dt * 1e3, 2),
                      "images_per_sec": round(B / dt, 1)}), flush=True)

    # ---- CLIP ViT-B/32 vision tower at 224x224 --------------------------
    from drin_tpu.encoders.clip import CLIPVisionConfig, CLIPVisionTransformer

    B = 64
    vit = CLIPVisionTransformer(CLIPVisionConfig())
    px0 = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)
    params = jax.device_get(vit.init(jax.random.key(0), px0)["params"])
    params = jax.device_put(jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16)
                                         if np.issubdtype(x.dtype, np.floating) else x, params))
    px = jax.device_put(jnp.asarray(rng.standard_normal((B, 224, 224, 3)), jnp.bfloat16))

    def clip_chain(eps, px, params, K=K):
        for _ in range(K):
            pooled = vit.apply({"params": params}, px + eps.astype(px.dtype) * 1e-12)
            if isinstance(pooled, tuple):
                pooled = pooled[-1]
            eps = jnp.sum(jnp.asarray(pooled, jnp.float32).ravel()[:8]) * 1e-9 + eps
        return eps

    dt = timed_chain(jax.jit(clip_chain), (px, params), K)
    print(json.dumps({"encoder": "clip-vit-b32-224px", "batch": B,
                      "ms_per_batch": round(dt * 1e3, 2),
                      "images_per_sec": round(B / dt, 1)}), flush=True)


if __name__ == "__main__":
    main()
