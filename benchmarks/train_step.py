# -*- coding: utf-8 -*-
"""Benchmark: full DRIN train step on one chip, at production WikiMEL scale.

Two variants of the complete step (forward + triplet loss + backward + Adam
+ on-device metric counters) at the reference's training shapes (B=64,
C=101):

  * ``offline-features`` — entity features arrive in the batch (the
    reference's data path, ~90MB/batch from the host);
  * ``device-tables`` — the 109k-entity pooled tables live in HBM and the
    batch carries [B, C] int32 row indices; the gather happens inside the
    step (the production WikiMEL input path, train.py
    device_entity_tables).

Steps chain through the donated TrainState (true data dependence), one host
fetch at the end.  bf16 body, f32 masters.  One JSON line per variant.
NOT the driver benchmark (bench.py is).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from benchmarks._tables import N_ENTITIES
B = 64
STEPS = 30


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run(name, cfg, model, batch, feats_fn=None, steps=STEPS):
    import jax
    import jax.numpy as jnp

    from drin_tpu.train import metrics as M
    from drin_tpu.train.trainer import build_step_fns, create_train_state

    # init at B=2 (params are batch-independent; full-batch f32 init wastes HBM)
    small = tuple(x[:2] for x in batch[:-1])
    params = model.init(jax.random.key(0),
                        small if feats_fn is None else feats_fn(small))["params"]
    state, tx = create_train_state(params, cfg)
    fns = build_step_fns(lambda p, f: model.apply({"params": p}, f), cfg, tx,
                         feats_fn=feats_fn)
    cast = lambda x: (jnp.asarray(x, jnp.bfloat16)
                      if np.issubdtype(np.asarray(x).dtype, np.floating)
                      else jnp.asarray(x))
    # features ship bf16 (the step casts anyway); the answer stays f32
    dev = tuple(jax.device_put(cast(np.asarray(x))) for x in batch[:-1]) + (
        jax.device_put(np.asarray(batch[-1])),)
    valid = jax.device_put(np.ones((B,), np.float32))
    mstate = M.init_state(cfg.metrics_topk)

    state, loss, mstate = fns.train_step(state, dev, valid, mstate)  # compile
    float(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss, mstate = fns.train_step(state, dev, valid, mstate)
    final = float(loss)
    dt = (time.perf_counter() - t0) / steps
    print(json.dumps({
        "variant": name, "batch": B, "candidates": cfg.num_candidates_model,
        "ms_per_step": round(dt * 1e3, 2),
        "mentions_per_sec": round(B / dt, 1),
        "pairs_per_sec": round(B * cfg.num_candidates_model / dt, 1),
        "loss": round(final, 4)}), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from drin_tpu.common.config import make_config
    from drin_tpu.models.drin import DRIN

    log(f"devices: {jax.devices()}")
    cfg = make_config("drin", "wikimel", dataset_root="/tmp/unused",
                      compute_dtype="bfloat16")
    model = DRIN(cfg)
    rng = np.random.default_rng(0)
    feats, answer = g._random_drin_batch(cfg, B=B, rng=rng)
    run("offline-features", cfg, model, feats + (answer,))

    # device tables at WikiMEL scale, generated on-device (shared fixture;
    # benchmarks/_tables.py has the relay rationale + rebuild invariant)
    from benchmarks._tables import make_full_scale_store

    store = make_full_scale_store(cfg, N_ENTITIES)
    N = N_ENTITIES
    feats_fn = store.drin_feats_fn()  # fresh: snapshots the swapped tables
    rows = rng.integers(0, N, (B, cfg.num_candidates_model)).astype(np.int32)
    rows_batch = feats[:7] + (rows,) + feats[12:14] + (answer,)
    run("device-tables-109k", cfg, model, rows_batch, feats_fn=feats_fn)


if __name__ == "__main__":
    main()
