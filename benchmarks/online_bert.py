# -*- coding: utf-8 -*-
"""Benchmark: GHMFC online-BERT training throughput (mentions/sec/chip).

The online path is the reference's only configuration that trains *through*
an encoder: per batch it runs BERT on the mention sentence plus the 12 zipped
candidate sentences — 13 sequential GPU calls in the reference
(``/root/reference/baselines/ghmfc.py:181-185, :221-224``).  Here the whole
train step (one batched BERT over [B*(1+S), 512] + fusion heads + triplet
loss + masked Adam) is ONE XLA program, so this workload is matmul-dense and
shows what the MXU actually sustains (vs the bandwidth-bound DRIN forward
bench.py measures).

Variants:
  * ``zipped-frozen``   — reference online semantics (S=12 zipped candidate
    sentences, frozen BERT): the headline.
  * ``direct-frozen``   — per-candidate [B, C, 64]-token batches
    (``num_entity_sentence=0``), the TPU-native layout.
  * ``zipped-finetune`` — ``finetune_bert=True`` with ``bert_remat`` so the
    backward fits in HBM (capability the reference's 10GB GPU budget cannot
    reach at these shapes).

NOT the driver benchmark (that is ``bench.py``); prints one JSON line per
variant.  Timing: chained train steps (each step consumes the previous
donated state, so the device executes them back-to-back) with a single final
host fetch — per-call transport overhead through a relay-attached host is
~0.3 ms against 100+ ms steps.
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


def make_batch(cfg, bert_cfg, B, rng, bucket_len: int = 0):
    """Random token batch at the config's online shapes (OnlineBatch order,
    minus the answer split).  ``bucket_len`` emulates the data layer's exact
    length bucketing (Config.online_length_buckets trims token tensors to
    the batch-max content length; typical zipped content is ~300 tokens →
    384-col bucket)."""
    L = bucket_len or cfg.max_bert_len
    C = cfg.num_candidates_model
    V = bert_cfg.vocab_size
    mids = rng.integers(5, V, (B, L)).astype(np.int32)
    mmask = np.ones((B, L), np.int32)
    mimg = rng.standard_normal((B, cfg.resnet_num_region, cfg.resnet_embed_dim)).astype(np.float32)
    if cfg.num_entity_sentence:
        S = cfg.num_entity_sentence
        per = (C + S - 1) // S
        eids = rng.integers(5, V, (B, S, L)).astype(np.int32)
        emask = np.ones((B, S, L), np.int32)
        # plausible SEP layout: candidates ~30 tokens apart
        sep = np.cumsum(rng.integers(20, 40, (B, S, per)), axis=-1).astype(np.int32)
        sep = np.minimum(sep, L - 1)
    else:
        Le = cfg.max_entity_attr_token_len
        eids = rng.integers(5, V, (B, C, Le)).astype(np.int32)
        emask = np.ones((B, C, Le), np.int32)
        sep = np.zeros((B,), np.int32)
    eimg = np.zeros((B,), np.float32)  # entity tower is text-only (linear)
    answer = np.eye(C, dtype=np.float32)[rng.integers(0, C - 1, B)][:, :-1]
    feats = (mids, mmask, np.ones((B,), np.int32), np.full((B,), 4, np.int32),
             mimg, eids, emask, sep, eimg)
    return feats + (answer,)


def run_variant(name: str, B: int, steps: int, bucket_len: int = 0, **cfg_kw):
    import jax

    from drin_tpu.common.config import make_config
    from drin_tpu.encoders.bert import BertConfig
    from drin_tpu.models.ghmfc import GHMFCOnline
    from drin_tpu.train import metrics as M
    from drin_tpu.train.trainer import build_step_fns, create_train_state

    cfg = make_config("ghmfc", "wikimel", dataset_root="/tmp/unused",
                      online_bert=True, batch_size=B,
                      compute_dtype="bfloat16", **cfg_kw)
    bert_cfg = BertConfig()  # bert-base-cased dims
    model = GHMFCOnline(cfg, bert_cfg)
    rng = np.random.default_rng(0)
    batch = make_batch(cfg, bert_cfg, B, rng, bucket_len)
    # init at B=2: params are batch-independent and init traces the forward
    # in f32, which at benchmark batch would blow HBM on its own
    init_batch = make_batch(cfg, bert_cfg, 2, np.random.default_rng(1), bucket_len)
    params = model.init(jax.random.key(0), init_batch[:-1])["params"]
    state, tx = create_train_state(params, cfg)
    fns = build_step_fns(lambda p, f: model.apply({"params": p}, f), cfg, tx)

    # halve the host->device upload: the step casts floating features to the
    # compute dtype anyway, so ship them as bf16
    import jax.numpy as jnp

    cast = lambda x: x.astype(jnp.bfloat16) if x.dtype == np.float32 else x
    dev_batch = tuple(jax.device_put(cast(x)) for x in batch[:-1]) + (
        jax.device_put(batch[-1]),)
    valid = jax.device_put(np.ones((B,), np.float32))
    mstate = M.init_state(cfg.metrics_topk)

    # tokens BERT processes per step
    S = cfg.num_entity_sentence
    L_eff = bucket_len or cfg.max_bert_len
    if S:
        tokens = B * (1 + S) * L_eff
    else:
        tokens = B * (L_eff + cfg.num_candidates_model * cfg.max_entity_attr_token_len)

    flops = None
    try:
        lowered = fns.train_step.lower(state, dev_batch, valid, mstate)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0)) or None
    except Exception as e:  # pragma: no cover - cost analysis is best-effort
        log(f"{name}: cost_analysis unavailable: {e!r}")

    # warmup (compiles if .compile() above didn't execute-path cache)
    state, loss, mstate = fns.train_step(state, dev_batch, valid, mstate)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss, mstate = fns.train_step(state, dev_batch, valid, mstate)
    final = float(loss)  # closes the chain with one host fetch
    dt = time.perf_counter() - t0
    per_step = dt / steps
    out = {
        "variant": name,
        "batch": B,
        "ms_per_step": round(per_step * 1e3, 1),
        "mentions_per_sec": round(B / per_step, 1),
        "tokens_per_sec": round(tokens / per_step, 0),
        "loss": round(final, 4),
    }
    if flops:
        out["tflops_per_sec"] = round(flops / per_step / 1e12, 1)
        out["step_gflop"] = round(flops / 1e9, 1)
    print(json.dumps(out), flush=True)
    return out


def main():
    import jax

    log(f"devices: {jax.devices()}")
    # B=64 zipped OOMs one v5e chip: the 13 x 512-token towers' attention
    # logits alone are [832, 12, 512, 512].  B=32 fits; mentions/s is the
    # comparable metric either way.
    for name, kw in (
        ("zipped-frozen", dict(B=32, steps=6, finetune_bert=False)),
        ("direct-frozen", dict(B=64, steps=6, finetune_bert=False,
                               num_entity_sentence=0)),
        ("zipped-finetune", dict(B=16, steps=4, finetune_bert=True,
                                 bert_remat=True)),
        ("zipped-frozen-fusedattn", dict(B=32, steps=6, finetune_bert=False,
                                         bert_fused_attention=True)),
        ("zipped-frozen-fusedattn-B64", dict(B=64, steps=6, finetune_bert=False,
                                             bert_fused_attention=True)),
        ("direct-frozen-fusedattn", dict(B=64, steps=6, finetune_bert=False,
                                         num_entity_sentence=0,
                                         bert_fused_attention=True)),
        ("zipped-finetune-fusedattn", dict(B=16, steps=4, finetune_bert=True,
                                           bert_remat=True,
                                           bert_fused_attention=True)),
        # all three levers stacked: flash fwd + flash bwd + the data layer's
        # 384-col length bucket (measured 662 ms/step, BASELINE.md)
        ("zipped-finetune-fusedattn-384", dict(B=16, steps=4, finetune_bert=True,
                                               bert_remat=True,
                                               bert_fused_attention=True,
                                               bucket_len=384)),
    ):
        try:
            run_variant(name, **kw)
        except Exception as e:
            log(f"{name} failed: {e!r}")


if __name__ == "__main__":
    main()
