# -*- coding: utf-8 -*-
"""Benchmark: serving-path latency/throughput on one chip (serve.Ranker).

The reference has no serving path at all (SURVEY §0); this measures the
deployment story the rebuild adds: WikiMEL-scale (109k entities) device-
resident tables, stage-1 brute-force retrieval over the full table, and
full DRIN candidate ranking at request batch sizes.

Prints one JSON line per measurement.  Timing: K chained calls inside one
jitted program (scalar data dependency) + one host fetch — device time, not
relay transport (BASELINE.md methodology).  Every large array (params,
entity tables, retrieval table) is passed through the jit boundary as an
ARGUMENT — closure-captured device arrays become compile-time constants,
which hangs remote compilation at these sizes (the bug this benchmark
originally surfaced; fixed in trainer/serve/device_store).

NOT the driver benchmark (bench.py is).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from benchmarks._tables import N_ENTITIES  # WikiMEL global table size


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from drin_tpu.common.config import make_config
    from drin_tpu.models.drin import DRIN
    from drin_tpu.serve import Ranker

    log(f"devices: {jax.devices()}")
    cfg = make_config("drin", "wikimel", dataset_root="/tmp/unused",
                      compute_dtype="bfloat16")
    C = cfg.num_candidates_model
    D = cfg.bert_embed_dim

    rng = np.random.default_rng(0)
    # Full-scale tables generated ON DEVICE (shared fixture; see
    # benchmarks/_tables.py for the relay rationale and the rebuild-after-
    # swap invariant)
    from benchmarks._tables import make_full_scale_store

    model = DRIN(cfg)
    feats, _ = g._random_drin_batch(cfg, B=2, rng=rng)
    params = model.init(jax.random.key(0), feats)["params"]
    dt16 = jnp.bfloat16
    store = make_full_scale_store(cfg, N_ENTITIES)
    N = N_ENTITIES
    ranker = Ranker(cfg, params=params)  # tables bound via set_store below
    ranker.set_store(store)  # rebind the scoring fns to the device tables
    feats_fn = ranker._feats_fn
    tables = feats_fn.tables
    nbytes = sum(int(np.prod(t.shape)) * t.dtype.itemsize for t in tables)
    log(f"device tables: {nbytes / 1e6:.0f} MB resident ({N} entities, bf16)")

    # stage-1 retrieval: [B, D] x [D, N] cosine + top-k over the full table
    norm_table = jax.jit(lambda t: t / jnp.linalg.norm(t, axis=-1, keepdims=True))(
        ranker.store.text[:, 0])

    # retrieval sweeps share the chain implementation and exact-scan body
    # with bench.py's secondary retrieval rows (benchmarks/_timing) — same
    # no-drift contract as the rank rows below
    from benchmarks._timing import exact_retrieval_body, retrieve_chain_time

    K = 4
    for B in (1, 16):
        log(f"retrieve B={B}...")
        q0 = jax.device_put(jnp.asarray(rng.standard_normal((B, D)), dt16))
        dt = retrieve_chain_time(exact_retrieval_body, q0, (norm_table,),
                                 K=K, iters=16)
        print(json.dumps({
            "measurement": "stage1_retrieve", "batch": B, "entities": N_ENTITIES,
            "ms_per_query_batch": round(dt * 1e3, 3),
            "queries_per_sec": round(B / dt, 1)}), flush=True)

    # shortlist + exact-rescore retrieval modes (serve.retrieve):
    #   approx — bf16 scan + fused ApproxTopK shortlist (no precompute)
    #   int8   — int8 coarse scan (half the resident bytes) + same shortlist
    from drin_tpu.serve import quantize_rows, retrieve_quantized, retrieve_rescored

    qt, qscales = jax.jit(quantize_rows)(norm_table)
    kq, kc = 100, 400  # expand=4

    # every device table rides through jit as an ARGUMENT (compile-hang
    # hazard; see module docstring) — `body` receives them per call
    def approx_body(q, table):
        return retrieve_rescored(q, table, kq, kc)

    def int8_body(q, table, qt, scales):
        return retrieve_quantized(q, qt, scales, table, kq, kc)

    for B in (1, 16):
        q0 = jax.device_put(jnp.asarray(
            rng.standard_normal((B, D)), jnp.float32))
        for mode, body, extra in (("approx", approx_body, ()),
                                  ("int8", int8_body, (qt, qscales))):
            log(f"retrieve_{mode} B={B}...")
            dt = retrieve_chain_time(body, q0, (norm_table,) + extra,
                                     K=K, iters=16)
            print(json.dumps({
                "measurement": f"stage1_retrieve_{mode}", "batch": B,
                "entities": N_ENTITIES, "shortlist": kc,
                "ms_per_query_batch": round(dt * 1e3, 3),
                "queries_per_sec": round(B / dt, 1)}), flush=True)

    # full DRIN rank over device-resident tables (rows batch).  All four
    # rank-style measurements below (bf16 / int8 / fused store A/Bs + the
    # batcher trace replay) go through the ONE shared chain implementation
    # (benchmarks/_timing.rank_chain_time) and batch builder
    # (benchmarks/_tables.make_device_rank_batch) — also used by bench.py's
    # secondary rows, so the methodology cannot drift between scripts.
    from benchmarks._tables import make_device_rank_batch
    from benchmarks._timing import rank_chain_time

    apply_fn = lambda p, f: model.apply({"params": p}, f)
    dev_params = ranker.params
    rank_ms = {}  # per-batch-size ms, reused by the trace replay below
    for B in (1, 8, 64):
        log(f"drin_rank B={B}...")
        dev = make_device_rank_batch(cfg, B, rng, N)
        dt = rank_chain_time(apply_fn, feats_fn, dev_params, dev, tables,
                             K=K, iters=10)
        rank_ms[B] = dt * 1e3
        print(json.dumps({
            "measurement": "drin_rank", "batch": B, "candidates": C,
            "ms_per_batch": round(dt * 1e3, 3),
            "pairs_per_sec": round(B * C / dt, 1)}), flush=True)

    # int8 rank-stage store (device_store quantize): half the per-step
    # gather bytes of the bf16 store, ~2x entities per chip; the chain is
    # identical so the row is a direct A/B against drin_rank above
    from benchmarks._tables import make_full_scale_store_quantized

    storeq = make_full_scale_store_quantized(cfg, N_ENTITIES)
    rankerq = Ranker(cfg, params=params)
    rankerq.set_store(storeq)
    feats_fnq = rankerq._feats_fn
    tablesq = feats_fnq.tables
    nbytesq = sum(int(np.prod(t.shape)) * t.dtype.itemsize for t in tablesq)
    log(f"int8 device tables: {nbytesq / 1e6:.0f} MB resident "
        f"(vs {nbytes / 1e6:.0f} MB bf16)")
    for B in (1, 64):
        log(f"drin_rank_int8 B={B}...")
        dev = make_device_rank_batch(cfg, B, rng, N)
        dt = rank_chain_time(apply_fn, feats_fnq, dev_params, dev, tablesq,
                             K=K, iters=10)
        print(json.dumps({
            "measurement": "drin_rank_int8", "batch": B, "candidates": C,
            "resident_mb": round(nbytesq / 1e6),
            "ms_per_batch": round(dt * 1e3, 3),
            "pairs_per_sec": round(B * C / dt, 1)}), flush=True)

    # fused int8 store (device_store fused_gather): the Pallas gather+dequant
    # kernel (ops/pallas/gather.py) replaces XLA's gather -> materialize ->
    # dequantize -> materialize; same quantized data, so this row is a direct
    # A/B against drin_rank_int8 AND drin_rank above
    from benchmarks._tables import make_full_scale_store_fused

    del rankerq, feats_fnq, tablesq
    # pack the slab FROM the int8 store just measured (no 2.5GB f32 rebuild;
    # transient HBM = int8 tables + slab instead of full-scale f32 tables)
    storef = make_full_scale_store_fused(cfg, N_ENTITIES, base=storeq)
    del storeq
    rankerf = Ranker(cfg, params=params)
    rankerf.set_store(storef)
    feats_fnf = rankerf._feats_fn
    tablesf = feats_fnf.tables
    nbytesf = storef.nbytes
    log(f"fused int8 slab: {nbytesf / 1e6:.0f} MB resident")
    for B in (1, 64):
        log(f"drin_rank_fused B={B}...")
        dev = make_device_rank_batch(cfg, B, rng, N)
        dt = rank_chain_time(apply_fn, feats_fnf, dev_params, dev, tablesf,
                             K=K, iters=10)
        print(json.dumps({
            "measurement": "drin_rank_fused", "batch": B, "candidates": C,
            "resident_mb": round(nbytesf / 1e6),
            "ms_per_batch": round(dt * 1e3, 3),
            "pairs_per_sec": round(B * C / dt, 1)}), flush=True)
    del storef, rankerf, feats_fnf, tablesf

    # sustained concurrent serving: many client threads firing single-mention
    # requests — direct interleaved jit calls vs the micro-batching queue
    # (serve.BatchingRanker).  End-to-end wall clock including host work and
    # transport: this is the serving story, not pure device time.
    from benchmarks._timing import daemon_client_pool
    from drin_tpu.serve import BatchingRanker

    feats1, _ = g._random_drin_batch(cfg, B=1, rng=rng)
    rows1 = rng.integers(0, N, (1, C)).astype(np.int32)
    req = tuple(np.asarray(x, np.float32) if np.asarray(x).dtype == np.float64
                else np.asarray(x) for x in feats1[:7] + (rows1,) + feats1[12:14])
    n_req, n_clients = 192, 32
    br = BatchingRanker(ranker, max_batch=64, wait_ms=3.0, buckets=(1, 8, 16, 32, 64))
    # warm both programs (bucket shapes) before timing
    ranker.rank(req, 5)
    ranker.rank(tuple(np.repeat(x, 64, axis=0) for x in req), 5)
    for b in (8, 16, 32):
        ranker.rank(tuple(np.repeat(x, b, axis=0) for x in req), 5)
    for label, call in (("direct", lambda: ranker.rank(req, 5)),
                        ("micro-batched", lambda: br.rank(req, 5))):
        log(f"concurrent serve [{label}]...")
        import time as _time

        t0 = _time.perf_counter()
        # DAEMON clients (CLAUDE.md pool rule): a cf.ThreadPoolExecutor
        # worker stuck in a device call on a flapped relay would block both
        # the context-exit join and interpreter shutdown forever, eating the
        # device-replay section below; daemon workers die with the process
        daemon_client_pool(n_clients, n_req, call)
        dt = _time.perf_counter() - t0
        out = {"measurement": "serve_concurrent", "mode": label,
               "clients": n_clients, "requests": n_req,
               "requests_per_sec": round(n_req / dt, 1),
               "ms_per_request_sustained": round(dt / n_req * 1e3, 2)}
        if label == "micro-batched":
            out["device_calls"] = br._batches_run
            out["batch_buckets"] = br.batch_trace()
        print(json.dumps(out), flush=True)

    # device-side replay of the batcher's ACTUAL call trace: the wall-clock
    # numbers above are transport-bound on this relay-attached host
    # (BASELINE.md serving section), so they can't say what the chip itself
    # sustains.  Replay answers that with measurements, not inference: time
    # each bucket-size rank program the batcher really dispatched (chained
    # device calls, no per-request transport), then sum the trace's call
    # multiset — vs direct mode = n_req executions of the B=1 program.
    trace = br.batch_trace()
    sizes = sorted({1} | {int(key.split(":")[1]) for key in trace})
    # bucket sizes the drin_rank section already timed (same fixture,
    # store, chain and iters) are reused — re-running them would double
    # that section's device time on the contended shared chip for
    # identical numbers; only trace buckets not yet measured run here
    bucket_ms = {B: ms for B, ms in rank_ms.items() if B in sizes}
    for Bb in sizes:
        if Bb in bucket_ms:
            log(f"replay bucket B={Bb}: reusing drin_rank's measurement")
            continue
        log(f"replay bucket B={Bb}...")
        dev = make_device_rank_batch(cfg, Bb, rng, N)
        dt = rank_chain_time(apply_fn, feats_fn, dev_params, dev, tables,
                             K=K, iters=10)
        bucket_ms[Bb] = dt * 1e3
    batched_ms = sum(c * bucket_ms[int(key.split(":")[1])]
                     for key, c in trace.items())
    direct_ms = n_req * bucket_ms[1]
    print(json.dumps({
        "measurement": "serve_device_replay", "requests": n_req,
        "trace": trace,
        "bucket_ms": {str(b): round(ms, 3) for b, ms in bucket_ms.items()},
        "batched_device_ms": round(batched_ms, 2),
        "batched_requests_per_sec_device": round(n_req / (batched_ms / 1e3), 1),
        "direct_device_ms": round(direct_ms, 2),
        "direct_requests_per_sec_device": round(n_req / (direct_ms / 1e3), 1),
    }), flush=True)
    br.close()


if __name__ == "__main__":
    main()
