# -*- coding: utf-8 -*-
"""Serving tests: checkpoint-backed Ranker, full-table retrieval, and the
HTTP wrapper driven over a real socket."""

import json
import urllib.request

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from drin_tpu.data.dataset import MELFeatureDataset, load_wikimel_entity_tables
from drin_tpu.data.synthetic import make_synthetic_store, tiny_config
from drin_tpu.models.drin import DRIN


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("serve-store"))
    cfg = tiny_config("wikimel", "drin", preprocess_dir=d).replace(compute_dtype="float32")
    make_synthetic_store(cfg, n_mentions=10, n_entities=25, seed=13)
    tables = load_wikimel_entity_tables(cfg)
    ds = MELFeatureDataset(cfg, "train", tables)
    batch = next(ds.batches(4, kind="drin_rows"))
    model = DRIN(cfg)
    params = model.init(jax.random.key(0), _dense(ds, np.arange(4)))["params"]
    return cfg, tables, ds, params, batch


def _dense(ds, idx):
    return ds.drin_batch(idx)[:-1]


def test_ranker_scores_match_model(served):
    from drin_tpu.serve import Ranker

    cfg, tables, ds, params, batch = served
    r = Ranker(cfg, params=params, entity_tables=tables)
    scores = r.score(batch[:-1])
    model = DRIN(cfg)
    want = np.asarray(model.apply({"params": params}, _dense(ds, np.arange(4))))
    np.testing.assert_allclose(scores, want, rtol=1e-5, atol=1e-6)
    top_scores, top_idx = r.rank(batch[:-1], k=3)
    assert top_idx.shape == (4, 3)
    np.testing.assert_allclose(top_scores[:, 0], scores.max(-1), rtol=1e-6)


def test_ranker_checkpoint_roundtrip(served, tmp_path):
    import orbax.checkpoint as ocp

    from drin_tpu.serve import Ranker

    cfg, tables, ds, params, batch = served
    mgr = ocp.CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(7, args=ocp.args.StandardSave({"params": params}))
    mgr.wait_until_finished()
    r = Ranker(cfg, entity_tables=tables, checkpoint_dir=str(tmp_path / "ckpt"))
    scores = r.score(batch[:-1])
    want = Ranker(cfg, params=params, entity_tables=tables).score(batch[:-1])
    np.testing.assert_allclose(scores, want, rtol=1e-6)


def test_retrieve_full_table(served):
    from drin_tpu.serve import Ranker

    cfg, tables, ds, params, batch = served
    r = Ranker(cfg, params=params, entity_tables=tables)
    # query = an entity's own pooled text -> it must retrieve itself first
    table = np.asarray(tables["entity_text_feature"][:, 0])
    q = table[[3, 17]]
    scores, idx = r.retrieve(q, k=5)
    assert idx.shape == (2, 5)
    assert idx[0, 0] == 3 and idx[1, 0] == 17
    assert np.allclose(scores[:, 0], 1.0, atol=1e-3)


def test_retrieve_modes_match_exact(served):
    """The approx (shortlist + exact rescore) and int8 (coarse scan +
    rescore) modes return the same top-k as the exact scan — below the
    4096-row ApproxTopK threshold the shortlist is an exact superset
    (serve._shortlist), so equality is guaranteed, not probabilistic.
    Mode selection: default is EXACT (the no-opt-in contract); int8 after
    quantize_retrieval built the cache; set_store drops the quantized
    cache; unknown modes raise."""
    from drin_tpu.serve import Ranker
    from drin_tpu.data.device_store import DeviceEntityStore

    cfg, tables, ds, params, batch = served
    r = Ranker(cfg, params=params, entity_tables=tables)
    rng = np.random.default_rng(5)
    q = rng.standard_normal((3, tables["entity_text_feature"].shape[-1])).astype(np.float32)
    fs, fi = r.retrieve(q, k=5, mode="exact")
    as_, ai = r.retrieve(q, k=5, mode="approx")
    qs, qi = r.retrieve(q, k=5, mode="int8")
    np.testing.assert_array_equal(fi, ai)
    np.testing.assert_array_equal(fi, qi)
    np.testing.assert_allclose(as_, fs, rtol=2e-4, atol=1e-5)  # exact rescore
    np.testing.assert_allclose(qs, fs, rtol=2e-4, atol=1e-5)
    assert r._retrieval_q is not None
    # auto mode now picks the quantized path
    s2, i2 = r.retrieve(q, k=5)
    np.testing.assert_array_equal(i2, qi)
    # self-retrieval sanity through the int8 coarse scan
    table = np.asarray(tables["entity_text_feature"][:, 0])
    ss, si = r.retrieve(table[[3, 17]], k=2, mode="int8")
    assert si[0, 0] == 3 and si[1, 0] == 17
    with np.testing.assert_raises(ValueError):
        r.retrieve(q, k=5, mode="fuzzy")
    # set_store invalidates the quantized cache with the float one
    r.set_store(DeviceEntityStore(cfg, tables, dtype=np.float32), tables)
    assert r._retrieval_q is None


def test_sharded_retrieval_matches_exact(served):
    """Row-sharded retrieval over the 8-device mesh equals the
    single-device exact scan: each true top-k row is in its owning shard's
    local top-k, and below the 4096-row/shard threshold the per-shard
    shortlist is an exact superset (serve.ShardedRetrieval docstring).
    Covers the uneven row count (25 rows over 8 devices -> zero-padded
    tail shard), the int8 coarse path, mode dispatch through retrieve(),
    and set_store invalidation."""
    from drin_tpu.serve import Ranker
    from drin_tpu.data.device_store import DeviceEntityStore

    cfg, tables, ds, params, batch = served
    r = Ranker(cfg, params=params, entity_tables=tables)
    rng = np.random.default_rng(7)
    D = tables["entity_text_feature"].shape[-1]
    q = rng.standard_normal((3, D)).astype(np.float32)
    fs, fi = r.retrieve(q, k=5, mode="exact")       # single-device baseline
    sh = r.shard_retrieval()                        # all 8 virtual devices
    assert sh.n == 8 and sh.table.shape[0] % 8 == 0  # padded even split
    assert sh.n_valid == tables["entity_text_feature"].shape[0]
    for mode in ("exact", "approx"):
        ss, si = r.retrieve(q, k=5, mode=mode)
        np.testing.assert_array_equal(fi, si)
        np.testing.assert_allclose(ss, fs, rtol=2e-4, atol=1e-5)
    # int8 coarse scan: quant cache built on demand, self-queries hit
    table = np.asarray(tables["entity_text_feature"][:, 0])
    es, ei = r.retrieve(table[[3, 17]], k=2, mode="int8")
    assert sh.quant is not None
    assert ei[0, 0] == 3 and ei[1, 0] == 17
    np.testing.assert_allclose(es[:, 0], 1.0, atol=1e-2)
    with np.testing.assert_raises(ValueError):
        r.retrieve(q, k=5, mode="fuzzy")
    # k past the table edge clamps to the row count
    ks, ki = r.retrieve(q, k=len(table) + 9, mode="exact")
    assert ki.shape == (3, len(table))
    assert sorted(ki[0].tolist()) == list(range(len(table)))
    # set_store invalidates the sharded cache with the others
    r.set_store(DeviceEntityStore(cfg, tables, dtype=np.float32), tables)
    assert r._sharded is None


def test_sharded_exact_mode_is_exact_above_approx_threshold():
    """mode='exact' keeps its guarantee at ANY shard size: above 4096
    rows/shard _shortlist switches to approx_max_k, and the exact path must
    pin a true per-shard top_k instead (serve.ShardedRetrieval exact flag).
    N=9000 over 2 devices -> 4500 rows/shard, past the threshold."""
    from drin_tpu.serve import ShardedRetrieval

    rng = np.random.default_rng(11)
    N, D, B, k = 9000, 16, 3, 7
    t = rng.standard_normal((N, D)).astype(np.float32)
    tn = t / np.linalg.norm(t, axis=-1, keepdims=True)
    sr = ShardedRetrieval(jnp.asarray(tn), devices=jax.devices()[:2])
    q = rng.standard_normal((B, D)).astype(np.float32)
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    want = np.argsort(-(qn @ tn.T), axis=-1)[:, :k]
    s, i = sr(q, k, k, exact=True)
    np.testing.assert_array_equal(np.asarray(i), want)
    assert np.all(np.diff(np.asarray(s), axis=-1) <= 0)


def test_retrieve_expand_override(served):
    """retrieve(expand=) overrides the cache-build width per call; the
    default (None) uses the width the cache was built with.  Observable via
    the shortlist width kc baked into the jitted int8 program cache."""
    from drin_tpu.serve import Ranker

    cfg, tables, ds, params, batch = served
    r = Ranker(cfg, params=params, entity_tables=tables)
    n = tables["entity_text_feature"].shape[0]
    q = np.asarray(tables["entity_text_feature"][[3], 0])
    r.quantize_retrieval(expand=2)
    fs, fi = r.retrieve(q, k=5, mode="exact")
    s1, i1 = r.retrieve(q, k=5, mode="int8")              # kc = min(10, n)
    c1 = r._retrieve_q_jit._cache_size()
    s2, i2 = r.retrieve(q, k=5, mode="int8", expand=5)    # kc = min(25, n) = n
    np.testing.assert_array_equal(i1, fi)
    np.testing.assert_array_equal(i2, fi)
    # the per-call expand must REACH the jitted program: kc is a static
    # arg, so a distinct shortlist width compiles a NEW specialization
    # (result equality alone cannot detect a dead expand knob at this
    # table size — every width recovers the exact top-5)
    assert min(5 * 2, n) != min(5 * 5, n)
    assert r._retrieve_q_jit._cache_size() > c1, "per-call expand never reached the jit"
    s3, i3 = r.retrieve(q, k=5, mode="approx", expand=5)
    np.testing.assert_array_equal(i3, fi)
    c3 = r._retrieve_approx_jit._cache_size()
    r.retrieve(q, k=5, mode="approx", expand=4)
    assert r._retrieve_approx_jit._cache_size() > c3, "expand dead on the approx path"


def test_sharded_retrieval_hlo_structure():
    """Static guard on the sharded retrieval's compiled collectives (the
    only multi-chip perf signal on a 1-chip host): only the [n, B, k]-scale
    merge all-gather may move between devices — no collective touches a
    table- or even shard-scale operand (the scan and the shortlist rescore
    are shard-local by design)."""
    import jax.numpy as jnp
    from drin_tpu.serve import ShardedRetrieval
    from test_multichip import _collective_shapes

    rng = np.random.default_rng(0)
    N, D, B, k, kc = 800, 64, 4, 5, 20
    t = rng.standard_normal((N, D)).astype(np.float32)
    for quantized in (False, True):
        sr = ShardedRetrieval(jnp.asarray(t), devices=jax.devices()[:8],
                              quantize=quantized)
        q = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
        args = (q, sr.table) + (sr.quant if quantized else ())
        txt = sr._build(k, kc, quantized, False).lower(*args).compile().as_text()
        shard_elems = N // 8 * D
        merge_elems = 8 * B * k
        found = []
        for kind in ("all-gather", "all-reduce", "all-to-all",
                     "collective-permute"):
            for s in _collective_shapes(txt, kind):
                found.append((kind, s))
                assert s <= 2 * merge_elems, (
                    f"{kind} moves {s} elements (shard is {shard_elems})")
        assert found, "expected the [n, B, k] merge all-gather"
    # correctness of the standalone class at this scale too
    sr = ShardedRetrieval(jnp.asarray(t), devices=jax.devices()[:8])
    qn = t[:3] / np.linalg.norm(t[:3], axis=-1, keepdims=True)
    s, i = sr(qn, 4, 16)
    assert np.asarray(i)[:, 0].tolist() == [0, 1, 2]


def test_ranker_over_row_sharded_store(served):
    """Multi-chip serving of the RANK stage: a Ranker whose entity tables
    are row-sharded over the (4, 2) mesh (device_store shard_rows — n×
    table capacity, owner-gather + reduce-scatter in the jitted score)
    returns the replicated store's scores bit-for-tolerance, including
    request batches that don't divide the data axis (padded with row-0
    repeats and sliced back)."""
    from drin_tpu.parallel import mesh as pmesh
    from drin_tpu.serve import Ranker
    from drin_tpu.data.device_store import DeviceEntityStore

    cfg, tables, ds, params, batch = served
    r = Ranker(cfg, params=params, entity_tables=tables)
    base4 = r.score(batch[:-1])
    b3 = ds.drin_rows_batch(np.arange(3))
    base3 = r.score(b3[:-1])

    mesh = pmesh.make_mesh(devices=jax.devices()[:8], data=4, model=2)
    store = DeviceEntityStore(cfg, tables, dtype=np.float32, mesh=mesh,
                              shard_rows=True)
    r.set_store(store, tables)
    np.testing.assert_allclose(r.score(batch[:-1]), base4, rtol=1e-5, atol=1e-6)
    got3 = r.score(b3[:-1])  # B=3 does not divide data=4
    assert got3.shape == base3.shape
    np.testing.assert_allclose(got3, base3, rtol=1e-5, atol=1e-6)
    s, i = r.rank(b3[:-1], k=3)
    assert s.shape == (3, 3)
    np.testing.assert_allclose(s[:, 0], got3.max(-1), rtol=1e-6)

    # retrieval over the PADDED store must not see the zero pad rows: the
    # store pads 25 -> 26 rows (model=2) and a zero row would normalize to
    # NaN — which the real TPU backend's top_k sorts FIRST (the CPU mesh
    # sorts NaN last, so only these structural asserts catch it here)
    n = tables["entity_text_feature"].shape[0]
    assert store.text.shape[0] == n + 1 and store.n_rows == n  # padded
    rt = r._ensure_retrieval_table()
    assert rt.shape[0] == n
    assert bool(jnp.isfinite(rt).all())
    q = np.asarray(tables["entity_text_feature"][[3, 17], 0])
    for mode in ("exact", "approx", "int8"):
        rs, ri = r.retrieve(q, k=5, mode=mode)
        assert ri.max() < n and np.isfinite(rs).all()
        assert ri[0, 0] == 3 and ri[1, 0] == 17


def test_http_server_rank_and_health(served):
    from drin_tpu.serve import Ranker, serve_http, _encode_arrays

    cfg, tables, ds, params, batch = served
    r = Ranker(cfg, params=params, entity_tables=tables)
    fields = list(type(batch)._fields[:-1])
    server = serve_http(r, port=0, feat_fields=fields)  # port 0: OS-assigned
    port = server.server_address[1]
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health", timeout=10) as resp:
            assert json.loads(resp.read())["status"] == "ok"

        payload = _encode_arrays({name: np.asarray(v) for name, v in zip(fields, batch[:-1])})
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/rank",
            data=json.dumps({"features": payload, "k": 3}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            out = json.loads(resp.read())
        got = np.asarray(out["scores"])
        want, _ = r.rank(batch[:-1], k=3)
        np.testing.assert_allclose(got, want, rtol=1e-5)

        # bad request -> 400 with an error message, server stays alive
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/rank", data=b'{"features": "!!!"}',
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(bad, timeout=10)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "error" in json.loads(e.read())
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health", timeout=10) as resp:
            assert resp.status == 200
    finally:
        server.shutdown()


def test_batching_ranker_coalesces_and_matches(served):
    """Concurrent rank() calls through the micro-batching queue must return
    each caller's own correct rows AND actually coalesce into fewer device
    calls than requests (VERDICT r2 weak #6: serving previously had no
    concurrency story)."""
    import concurrent.futures as cf

    from drin_tpu.serve import BatchingRanker, Ranker

    cfg, tables, ds, params, batch = served
    r = Ranker(cfg, params=params, entity_tables=tables)
    br = BatchingRanker(r, max_batch=16, wait_ms=150.0)
    n_req = 12
    singles = [tuple(np.asarray(x)[i % 4 : i % 4 + 1] for x in batch[:-1])
               for i in range(n_req)]
    want = [r.rank(f, k=3) for f in singles]
    # release all callers together: without the barrier, thread startup on
    # a loaded 1-core host can stagger past the flush window, every request
    # flushes alone, and the coalescing assert flakes
    import threading

    bar = threading.Barrier(n_req)

    def call(f):
        bar.wait(timeout=60)
        return br.rank(f, k=3)

    try:
        with cf.ThreadPoolExecutor(n_req) as ex:
            got = list(ex.map(call, singles))
        for (gs, gi), (ws, wi) in zip(got, want):
            np.testing.assert_allclose(gs, ws, rtol=1e-5, atol=1e-6)
            np.testing.assert_array_equal(gi, wi)
        assert br._rows_run == n_req
        assert br._batches_run < n_req, (
            f"no coalescing: {br._batches_run} device calls for {n_req} requests")
        # the device-call trace records every dispatched (kind, PADDED
        # bucket): counts match batches_run, padded rows cover rows served
        trace = br.batch_trace()
        assert sum(trace.values()) == br._batches_run
        assert all(key.startswith("rank:") for key in trace)
        padded = sum(int(key.split(":")[1]) * c for key, c in trace.items())
        assert padded >= n_req
    finally:
        br.close()


def test_batching_ranker_coalesces_retrieve(served):
    """Concurrent retrieve() calls through the micro-batching queue coalesce
    into one full-table scan per (k, mode) group and return each caller's
    own correct rows; rank and retrieve requests share the window without
    cross-contamination."""
    import concurrent.futures as cf

    from drin_tpu.serve import BatchingRanker, Ranker

    cfg, tables, ds, params, batch = served
    r = Ranker(cfg, params=params, entity_tables=tables)
    table = np.asarray(tables["entity_text_feature"][:, 0])
    want = [r.retrieve(table[[i]], k=3, mode="exact") for i in range(10)]
    br = BatchingRanker(r, max_batch=16, wait_ms=150.0)
    one = tuple(np.asarray(x)[:1] for x in batch[:-1])
    # barrier: release all callers together (see the rank coalescing test)
    import threading

    bar = threading.Barrier(11)

    def ret(i):
        bar.wait(timeout=60)
        return br.retrieve(table[[i]], 3, "exact")

    def rank_one():
        bar.wait(timeout=60)
        return br.rank(one, 2)

    try:
        with cf.ThreadPoolExecutor(11) as ex:
            futs = [ex.submit(ret, i) for i in range(10)]
            frank = ex.submit(rank_one)
            got = [f.result(timeout=120) for f in futs]
            rs, ri = frank.result(timeout=120)
        for i, ((gs, gi), (ws, wi)) in enumerate(zip(got, want)):
            np.testing.assert_array_equal(gi, wi)
            assert gi[0, 0] == i  # self-retrieval hits its own row
            np.testing.assert_allclose(gs, ws, rtol=1e-5, atol=1e-5)
        assert ri.shape == (1, 2)
        assert br._batches_run < 11, (
            f"no coalescing: {br._batches_run} device calls for 11 requests")
    finally:
        br.close()


def test_batching_ranker_retrieve_expand_and_validation(served):
    """The per-call ``expand`` override reaches the device through the
    micro-batching front end (advisor finding: BatchingRanker.retrieve used
    to drop it), and an invalid expand fails loudly instead of silently
    returning empty shortlists."""
    from drin_tpu.serve import BatchingRanker, Ranker

    cfg, tables, ds, params, batch = served
    r = Ranker(cfg, params=params, entity_tables=tables)
    n = tables["entity_text_feature"].shape[0]
    q = np.asarray(tables["entity_text_feature"][[3], 0])
    r.quantize_retrieval(expand=2)
    # NOTE: k=3 here so the (k, kc) jit specializations are disjoint from
    # test_retrieve_expand_override's k=5 ones — the jit cache this test
    # observes is shared across Ranker instances in one process
    fs, fi = r.retrieve(q, k=3, mode="exact")
    br = BatchingRanker(r, max_batch=8, wait_ms=5.0)
    try:
        s1, i1 = br.retrieve(q, 3, "int8")                # build width (kc=6)
        c1 = r._retrieve_q_jit._cache_size()
        s2, i2 = br.retrieve(q, 3, "int8", expand=5)      # kc=15 -> new jit
        np.testing.assert_array_equal(i1, fi)
        np.testing.assert_array_equal(i2, fi)
        assert min(3 * 2, n) != min(3 * 5, n)
        assert r._retrieve_q_jit._cache_size() > c1, (
            "per-call expand never crossed the batching front end")
        with pytest.raises(ValueError, match="expand"):
            br.retrieve(q, 3, "int8", expand=0)
        # the dispatcher survives the rejected request
        s3, _ = br.retrieve(q, 3, "int8")
        np.testing.assert_allclose(s3, s1, rtol=1e-6)
    finally:
        br.close()
    with pytest.raises(ValueError, match="expand"):
        r.retrieve(q, k=3, mode="approx", expand=0)


def test_batching_ranker_mixed_k_and_errors(served):
    """Requests with different k are grouped per flush; a bad request fails
    only its own caller."""
    import concurrent.futures as cf

    from drin_tpu.serve import BatchingRanker, Ranker

    cfg, tables, ds, params, batch = served
    r = Ranker(cfg, params=params, entity_tables=tables)
    br = BatchingRanker(r, max_batch=8, wait_ms=100.0)
    one = tuple(np.asarray(x)[:1] for x in batch[:-1])
    bad = tuple(np.asarray(x)[:1] for x in batch[:-1])[:3]  # wrong arity
    try:
        with cf.ThreadPoolExecutor(4) as ex:
            f1 = ex.submit(br.rank, one, 2)
            f2 = ex.submit(br.rank, one, 5)
            fbad = ex.submit(br.rank, bad, 2)
            s1, i1 = f1.result(timeout=60)
            s2, i2 = f2.result(timeout=60)
            assert i1.shape == (1, 2) and i2.shape == (1, 5)
            with pytest.raises(Exception):
                fbad.result(timeout=60)
        # the server survives a failed flush group
        s3, _ = br.rank(one, 2)
        np.testing.assert_allclose(s3, s1, rtol=1e-6)
    finally:
        br.close()


def test_http_concurrent_rank_through_batcher(served):
    """serve_http with a BatchingRanker front end: concurrent HTTP /rank
    requests all get their own correct results."""
    import concurrent.futures as cf

    from drin_tpu.serve import BatchingRanker, Ranker, serve_http, _encode_arrays

    cfg, tables, ds, params, batch = served
    r = Ranker(cfg, params=params, entity_tables=tables)
    br = BatchingRanker(r, max_batch=16, wait_ms=100.0)
    fields = list(type(batch)._fields[:-1])
    server = serve_http(br, port=0, feat_fields=fields)
    port = server.server_address[1]

    def post(i):
        feats = {n: np.asarray(v)[i % 4 : i % 4 + 1] for n, v in zip(fields, batch[:-1])}
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/rank",
            data=json.dumps({"features": _encode_arrays(feats), "k": 3}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as resp:
            return i, json.loads(resp.read())

    try:
        with cf.ThreadPoolExecutor(8) as ex:
            results = list(ex.map(post, range(8)))
        full_scores = np.asarray(r.score(batch[:-1]))
        for i, out in results:
            got = np.asarray(out["scores"])[0]
            want = np.sort(full_scores[i % 4])[::-1][:3]
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    finally:
        server.shutdown()
        br.close()


def test_quantized_store_bundle_roundtrip(served, tmp_path):
    """A quantized-store Ranker's bundle persists DEQUANTIZED float tables
    (the artifact must reload into any store mode), and
    from_bundle(quantize_store=True) reproduces the quantized scores
    exactly (same int8 codes from the same dequantized floats)."""
    from drin_tpu.serve import Ranker

    cfg, tables, ds, params, batch = served
    rq = Ranker(cfg, params=params, entity_tables=tables, quantize_store=True)
    want = rq.score(batch[:-1])
    d = str(tmp_path / "qbundle")
    rq.save_bundle(d)
    r_float = Ranker.from_bundle(d)
    assert not r_float.store.quantized  # floats by default
    r_requant = Ranker.from_bundle(d, quantize_store=True)
    assert r_requant.store.quantized
    # float reload scores the DEQUANTIZED tables — equal to the quantized
    # ranker up to compute-dtype noise; re-quantized reload is exact
    np.testing.assert_allclose(r_float.score(batch[:-1]), want, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(r_requant.score(batch[:-1]), want, rtol=1e-6)


def test_quantize_store_guards(served):
    """quantize_store must never be silently ignored (review findings): a
    Ranker built without tables refuses the flag loudly, and the
    entity-projection fast path rebuilds the store WITH the old store's
    quantization (an operator who sized HBM for int8 must not silently get
    full-precision tables back)."""
    from drin_tpu.serve import Ranker

    cfg, tables, ds, params, batch = served
    with pytest.raises(ValueError, match="quantize_store"):
        Ranker(cfg, params=params, quantize_store=True)
    rq = Ranker(cfg, params=params, entity_tables=tables, quantize_store=True)
    rq.precompute_entity_projection()
    assert rq.store.quantized and rq.store.text.dtype == jnp.int8
    s, i = rq.rank(ds.drin_rows_batch(np.arange(2))[:-1], k=3)
    assert np.isfinite(np.asarray(s)).all() and i.shape == (2, 3)


def test_save_load_bundle_roundtrip(served, tmp_path):
    """save_bundle -> from_bundle reproduces scoring exactly: config,
    params and the device entity tables travel in one deployable dir."""
    from drin_tpu.serve import Ranker

    cfg, tables, ds, params, batch = served
    r = Ranker(cfg, params=params, entity_tables=tables)
    want = r.score(batch[:-1])
    r.save_bundle(str(tmp_path / "bundle"))
    r2 = Ranker.from_bundle(str(tmp_path / "bundle"))
    assert r2.cfg.model_type == cfg.model_type
    assert r2.cfg.num_candidates_data == cfg.num_candidates_data
    np.testing.assert_allclose(r2.score(batch[:-1]), want, rtol=1e-6)
    s, i = r2.rank(batch[:-1], k=3)
    ws, wi = r.rank(batch[:-1], k=3)
    np.testing.assert_allclose(s, ws, rtol=1e-6)
    np.testing.assert_array_equal(i, wi)
    # refreshing a bundle in place must overwrite, not crash
    r.save_bundle(str(tmp_path / "bundle"))
    r3 = Ranker.from_bundle(str(tmp_path / "bundle"))
    np.testing.assert_allclose(r3.score(batch[:-1]), want, rtol=1e-6)

    # a ROW-SHARDED store's bundle must not persist its zero pad rows as
    # phantom entities (25 rows padded to 26 on the model=2 axis)
    from drin_tpu.data.device_store import DeviceEntityStore
    from drin_tpu.parallel import mesh as pmesh

    mesh = pmesh.make_mesh(devices=jax.devices()[:8], data=4, model=2)
    r.set_store(DeviceEntityStore(cfg, tables, dtype=np.float32, mesh=mesh,
                                  shard_rows=True), tables)
    r.save_bundle(str(tmp_path / "bundle-sharded"))
    r4 = Ranker.from_bundle(str(tmp_path / "bundle-sharded"))
    n = tables["entity_text_feature"].shape[0]
    assert r4.store.n_rows == n and r4.store.text.shape[0] == n
    np.testing.assert_allclose(r4.score(batch[:-1]), want, rtol=1e-6)


def test_serve_cli_from_bundle(served, tmp_path):
    """The deployment CLI (python -m drin_tpu.serve) stands up the HTTP
    service from a bundle: /health answers, /retrieve with the sharded +
    int8 caches enabled returns correct rows, and serving-only keys are
    consumed without leaking into the Config."""
    import urllib.request

    from drin_tpu import serve
    from drin_tpu.serve import Ranker, _encode_arrays

    cfg, tables, ds, params, batch = served
    Ranker(cfg, params=params, entity_tables=tables).save_bundle(
        str(tmp_path / "bundle"))
    srv = serve.main([f"bundle={tmp_path / 'bundle'}", "port=0",
                      "shard_retrieval=true", "quantize_retrieval=true",
                      "retrieve_expand=4", "micro_batch=true"])
    try:
        port = srv.server_address[1]
        out = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/health", timeout=30).read())
        assert out["status"] == "ok" and out["model"] == cfg.model_type
        q = np.asarray(tables["entity_text_feature"][[2, 9], 0], np.float32)
        req = json.dumps({"query": _encode_arrays({"q": q}), "k": 3}).encode()
        out = json.loads(urllib.request.urlopen(urllib.request.Request(
            f"http://127.0.0.1:{port}/retrieve", req,
            {"Content-Type": "application/json"}), timeout=60).read())
        assert np.asarray(out["indices"])[:, 0].tolist() == [2, 9]
        stats = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=30).read())
        assert stats["micro_batched"] and stats["sharded_retrieval"]
        assert stats["batches_run"] >= 1 and stats["rows_run"] >= 2
        assert sum(stats["batch_buckets"].values()) == stats["batches_run"]
        assert stats["entity_rows"] == tables["entity_text_feature"].shape[0]
        assert stats["latency"]["count"] >= 1 and stats["latency"]["p50_ms"] > 0

        # /rank with NAMED npz fields: the CLI wires the positional field
        # order (rank_feat_fields), so clients can name arrays naturally —
        # alphabetical npz order alone would feed entity_rows into the
        # mention_text_feature slot
        from drin_tpu.serve import rank_feat_fields

        fields = rank_feat_fields(Ranker(cfg, params=params, entity_tables=tables))
        assert fields[0] == "mention_text_feature" and "answer" not in fields
        feats = {name: np.asarray(v) for name, v in zip(fields, batch[:-1])}
        req = json.dumps({"features": _encode_arrays(feats), "k": 3}).encode()
        out = json.loads(urllib.request.urlopen(urllib.request.Request(
            f"http://127.0.0.1:{port}/rank", req,
            {"Content-Type": "application/json"}), timeout=60).read())
        want_s, _ = Ranker(cfg, params=params,
                           entity_tables=tables).rank(batch[:-1], k=3)
        np.testing.assert_allclose(np.asarray(out["scores"]), want_s, rtol=1e-4)
    finally:
        srv.shutdown()
    # bundle mode refuses config overrides
    with pytest.raises(SystemExit):
        serve.main([f"bundle={tmp_path / 'bundle'}", "batch_size=4"])


def test_http_retrieve_endpoint(served):
    """POST /retrieve runs stage-1 retrieval over the full entity table and
    matches the programmatic Ranker.retrieve."""
    from drin_tpu.serve import Ranker, serve_http, _encode_arrays

    cfg, tables, ds, params, batch = served
    r = Ranker(cfg, params=params, entity_tables=tables)
    q = np.random.default_rng(3).standard_normal((2, cfg.bert_embed_dim)).astype(np.float32)
    want_s, want_i = r.retrieve(q, k=5)
    server = serve_http(r, port=0)
    port = server.server_address[1]
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/retrieve",
            data=json.dumps({"query": _encode_arrays({"q": q}), "k": 5}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as resp:
            out = json.loads(resp.read())
        np.testing.assert_allclose(np.asarray(out["scores"]), want_s, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(out["indices"]), want_i)
    finally:
        server.shutdown()


def test_ghmfc_entity_precompute_matches_model(tmp_path):
    """Serving fast path: precomputed [N, D] entity reprs + rank_rows must
    equal the full GHMFC forward, and retrieve() switches to model space."""
    from drin_tpu.serve import Ranker

    d = str(tmp_path / "store")
    cfg = tiny_config("wikimel", "ghmfc", preprocess_dir=d).replace(
        compute_dtype="float32")
    make_synthetic_store(cfg, n_mentions=10, n_entities=25, seed=14)
    tables = load_wikimel_entity_tables(cfg)
    ds = MELFeatureDataset(cfg, "train", tables)
    from drin_tpu.models import get_model

    model, kind = get_model(cfg)
    assert kind == "baseline"
    dense = ds.baseline_batch(np.arange(4))[:-1]
    params = model.init(jax.random.key(2), dense)["params"]
    r = Ranker(cfg, params=params, entity_tables=tables)
    reprs = r.precompute_entity_reprs(chunk=7)  # uneven chunks
    assert reprs.shape[0] == 25

    rows_batch = ds.baseline_rows_batch(np.arange(4))
    scores, idx = r.rank_rows(rows_batch[:5], rows_batch.entity_rows, k=3)
    want = np.asarray(model.apply({"params": params}, dense))
    np.testing.assert_allclose(scores[:, 0], want.max(-1), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(idx[:, 0], want.argmax(-1))

    # retrieval now runs in model space: an entity's own repr retrieves itself
    s2, i2 = r.retrieve(reprs[[5, 11]], k=3)
    assert i2[0, 0] == 5 and i2[1, 0] == 11

    # CLI surface: precompute_entities=true applies the same fast path on a
    # bundle-deployed GHMFC service (model-space /retrieve through HTTP)
    import json as _json
    import urllib.request

    from drin_tpu import serve
    from drin_tpu.serve import _encode_arrays

    r.save_bundle(str(tmp_path / "bundle"))
    srv = serve.main([f"bundle={tmp_path / 'bundle'}", "port=0",
                      "precompute_entities=true"])
    try:
        port = srv.server_address[1]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/retrieve",
            data=_json.dumps({"query": _encode_arrays({"q": reprs[[5, 11]]}),
                              "k": 3}).encode(),
            headers={"Content-Type": "application/json"})
        out = _json.loads(urllib.request.urlopen(req, timeout=60).read())
        assert np.asarray(out["indices"])[:, 0].tolist() == [5, 11]
    finally:
        srv.shutdown()


def test_ghmfc_fused_store_serving_end_to_end(tmp_path):
    """Ranker(fused_gather=True) for GHMFC: the store narrows to the
    text-only slab (no image/object tables resident — GHMFC's entity tower
    reads only text, reference ghmfc.py:202-251), scores match the XLA
    quantize_store Ranker to a few ULPs, and the bundle round-trips
    without image/object arrays."""
    from drin_tpu.serve import Ranker
    from drin_tpu.models import get_model

    d = str(tmp_path / "store")
    cfg = tiny_config("wikimel", "ghmfc", preprocess_dir=d,
                      bert_embed_dim=128, resnet_embed_dim=128,
                      entity_final_output_dim=128,
                      mention_final_output_dim=128).replace(
        compute_dtype="float32")
    make_synthetic_store(cfg, n_mentions=8, n_entities=30, seed=15)
    tables = load_wikimel_entity_tables(cfg)
    ds = MELFeatureDataset(cfg, "train", tables)
    model, kind = get_model(cfg)
    assert kind == "baseline"
    dense = ds.baseline_batch(np.arange(4))[:-1]
    params = model.init(jax.random.key(3), dense)["params"]

    rq = Ranker(cfg, params=params, entity_tables=tables, quantize_store=True)
    rf = Ranker(cfg, params=params, entity_tables=tables, quantize_store=True,
                fused_gather=True)
    assert rq.store.include == ("text",)  # GHMFC reads only the text table
    assert rf.store.fused and rf.store.obj_score is None
    b = ds.baseline_rows_batch(np.arange(5))
    np.testing.assert_allclose(rf.score(b[:-1]), rq.score(b[:-1]), atol=1e-6)

    # retrieval + the GHMFC precompute fast path run off the fused slab
    q = np.asarray(tables["entity_text_feature"][[3, 11], 0])
    s1, i1 = rf.retrieve(q, k=3, mode="exact")
    assert i1[0, 0] == 3 and i1[1, 0] == 11
    reprs = rf.precompute_entity_reprs(chunk=7)
    assert reprs.shape[0] == 30

    # bundle: no object arrays persisted, reload serves identically
    rf2 = Ranker(cfg, params=params, entity_tables=tables,
                 quantize_store=True, fused_gather=True)
    bd = str(tmp_path / "bundle")
    rf2.save_bundle(bd)
    import orbax.checkpoint as ocp
    restored = ocp.StandardCheckpointer().restore(
        str(tmp_path / "bundle" / "state"))
    assert "entity_object_feature" not in restored["tables"]
    assert "entity_image_feature" not in restored["tables"]
    r3 = Ranker.from_bundle(bd, quantize_store=True, fused_gather=True)
    np.testing.assert_allclose(r3.score(b[:-1]), rf2.score(b[:-1]), atol=1e-6)


def test_drin_entity_projection_matches(served):
    """DRIN serving projection: precomputing the entity-side linears into
    the tables must leave rows-batch scores unchanged."""
    from drin_tpu.serve import Ranker

    cfg, tables, ds, params, batch = served
    r0 = Ranker(cfg, params=params, entity_tables=tables)
    want = r0.score(batch[:-1])
    r = Ranker(cfg, params=params, entity_tables=tables)
    r.precompute_entity_projection()
    got = r.score(batch[:-1])
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)
    s, i = r.rank(batch[:-1], k=3)
    np.testing.assert_allclose(s[:, 0], want.max(-1), rtol=1e-5)


def test_rank_text_raw_strings(tmp_path):
    """Raw-text serving: sentences + char spans + candidate strings rank
    through the online model (tokenize -> span-convert -> score), matching
    the explicit feature-tuple path, over HTTP too."""
    from drin_tpu.data.online import assemble_online_feats
    from drin_tpu.data.synthetic import tiny_config
    from drin_tpu.encoders.bert import BertConfig
    from drin_tpu.models.ghmfc import GHMFCOnline
    from drin_tpu.serve import Ranker, serve_http
    from drin_tpu.text.wordpiece import BertTokenizer, build_tiny_vocab

    sentences = ["Alpha beta gamma delta", "Epsilon zeta eta theta"]
    cands = [["Alpha thing", "beta thing", "gamma"],
             ["zeta item", "eta item", "theta"]]
    vocab = build_tiny_vocab(sentences + [t for row in cands for t in row])
    vocab_path = str(tmp_path / "vocab.txt")
    inv = {v: k for k, v in vocab.items()}
    with open(vocab_path, "w") as f:
        for i in range(len(inv)):
            f.write(inv[i] + "\n")

    C = 3
    cfg = tiny_config("wikimel", "ghmfc").replace(
        online_bert=True, num_entity_sentence=0, finetune_bert=False,
        mention_final_layer_name="linear", bert_vocab=vocab_path,
        max_bert_len=32, max_entity_attr_token_len=8,
        num_candidates_data=C - 1, metrics_topk=(1,), compute_dtype="float32")
    bert_cfg = BertConfig(vocab_size=len(vocab), hidden_size=8,
                          num_hidden_layers=1, num_attention_heads=2,
                          intermediate_size=16, max_position_embeddings=32)
    model = GHMFCOnline(cfg, bert_cfg)
    tok = BertTokenizer(vocab_file=vocab_path, do_lower_case=False,
                        model_max_length=cfg.max_bert_len)
    spans = [(0, 5), (8, 12)]
    feats = assemble_online_feats(cfg, tok, sentences, spans, cands)
    params = model.init(jax.random.key(0), feats)["params"]
    r = Ranker(cfg, params=params, model=model)

    scores, idx = r.rank_text(sentences, spans, cands, k=2)
    assert scores.shape == idx.shape == (2, 2)
    # matches the feature-tuple path exactly
    want = r.score(feats)
    np.testing.assert_allclose(scores, np.sort(want, axis=1)[:, ::-1][:, :2], rtol=1e-6)

    # short candidate lists pad to C; long ones truncate
    s2, i2 = r.rank_text(sentences, spans, [["Alpha thing"], cands[1] + ["extra"]], k=1)
    assert s2.shape == (2, 1)

    # HTTP endpoint
    server = serve_http(r, port=0)
    try:
        port = server.server_address[1]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/rank_text",
            data=json.dumps({"sentences": sentences, "spans": [list(s) for s in spans],
                             "candidates": cands, "k": 2}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as resp:
            out = json.loads(resp.read())
        np.testing.assert_allclose(np.asarray(out["scores"]), scores, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(out["indices"]), idx)
    finally:
        server.shutdown()

    # concurrent raw-text requests through the micro-batching front end:
    # same-shape requests coalesce; a different-length sentence lands in its
    # own shape group instead of poisoning the flush
    import concurrent.futures as cf

    from drin_tpu.serve import BatchingRanker

    br = BatchingRanker(r, wait_ms=100.0)
    try:
        with cf.ThreadPoolExecutor(3) as ex:
            f1 = ex.submit(br.rank_text, [sentences[0]], [spans[0]], [cands[0]], 2)
            f2 = ex.submit(br.rank_text, [sentences[1]], [spans[1]], [cands[1]], 2)
            f3 = ex.submit(br.rank_text, ["Alpha beta gamma delta epsilon zeta eta theta " * 2],
                           [(0, 5)], [cands[0]], 2)
            for fut, row in ((f1, 0), (f2, 1)):
                s_, i_ = fut.result(timeout=120)
                np.testing.assert_allclose(s_[0], scores[row], rtol=1e-5)
                np.testing.assert_array_equal(i_[0], idx[row])
            s3, _ = f3.result(timeout=120)
            assert s3.shape == (1, 2)
    finally:
        br.close()


def test_set_store_rebinds_tables(served):
    """Swapping entity tables must change scoring results only via
    set_store — the tables are bound into the jitted fns at build time."""
    from drin_tpu.data.device_store import DeviceEntityStore
    from drin_tpu.serve import Ranker

    cfg, tables, ds, params, batch = served
    r = Ranker(cfg, params=params, entity_tables=tables)
    before = r.score(batch[:-1])

    rng = np.random.default_rng(3)
    new_tables = {k: np.asarray(v) + rng.standard_normal(np.asarray(v).shape).astype(np.float32)
                  if np.issubdtype(np.asarray(v).dtype, np.floating) else np.asarray(v)
                  for k, v in tables.items()}
    r.set_store(DeviceEntityStore(cfg, new_tables, dtype=np.float32))
    after = r.score(batch[:-1])
    assert not np.allclose(before, after), "set_store did not rebind the tables"
    want = np.asarray(Ranker(cfg, params=params, entity_tables=new_tables).score(batch[:-1]))
    np.testing.assert_allclose(after, want, rtol=1e-6)


def test_melhi_ranker_serves_end_to_end(tmp_path):
    """VERDICT r4 weak-#4: MELHI is servable, not merely guarded.  The
    wikidiverse baseline batch drives Ranker.rank and the HTTP front end
    (kind='baseline' shares GHMFC's offline batch contract,
    reference baselines/data.py:182-192 / melhi.py:44-84); the reference's
    wikimel restriction (melhi.py:12-15) fails at CONSTRUCTION with a named
    error, never downstream on a feature-tuple mismatch."""
    from drin_tpu.models import get_model
    from drin_tpu.serve import Ranker, rank_feat_fields, serve_http, _encode_arrays

    d = str(tmp_path / "store")
    cfg = tiny_config("wikidiverse", "melhi", preprocess_dir=d).replace(
        compute_dtype="float32")
    make_synthetic_store(cfg, n_mentions=8, n_entities=20, seed=7)
    ds = MELFeatureDataset(cfg, "train")
    batch = ds.baseline_batch(np.arange(3))
    model, kind = get_model(cfg)
    assert kind == "baseline"
    params = model.init(jax.random.key(0), batch[:-1])["params"]

    r = Ranker(cfg, params=params)
    scores = r.score(batch[:-1])
    want = np.asarray(model.apply({"params": params}, batch[:-1]))
    np.testing.assert_allclose(scores, want, rtol=1e-5, atol=1e-6)
    s, i = r.rank(batch[:-1], k=3)
    np.testing.assert_allclose(s[:, 0], want.max(-1), rtol=1e-6)

    fields = rank_feat_fields(r)
    assert fields[0] == "mention_text_feature" and "entity_text_feature" in fields
    server = serve_http(r, port=0, feat_fields=fields)
    port = server.server_address[1]
    try:
        payload = _encode_arrays(
            {name: np.asarray(v) for name, v in zip(fields, batch[:-1])})
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/rank",
            data=json.dumps({"features": payload, "k": 3}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=30) as resp:
            out = json.loads(resp.read())
        np.testing.assert_allclose(np.asarray(out["scores"]), s, rtol=1e-5)
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health", timeout=10) as resp:
            assert json.loads(resp.read())["model"] == "melhi"
    finally:
        server.shutdown()

    # wikimel + melhi: immediate, named refusal at construction
    cfg_wm = tiny_config("wikimel", "melhi", preprocess_dir=d)
    with pytest.raises(NotImplementedError, match="melhi.*wikidiverse"):
        Ranker(cfg_wm, params=params)


def test_online_ranker_keeps_retrieval_drops_rows_feats(served):
    """An online-BERT config must NOT install a rows feats_fn even when
    entity tables are supplied: the online model tokenizes entity text
    inside the forward (reference ghmfc.py:216-236) and its requests carry
    OnlineBatch token features — a rows-store feats_fn would unpack the
    wrong tuple on every /rank request.  The store itself IS still built:
    stage-1 /retrieve scans the raw pooled text table and is
    model-independent, so it must keep working on online servers."""
    from drin_tpu.data.online import OnlineBatch
    from drin_tpu.serve import Ranker, rank_feat_fields

    cfg, tables, ds, params, batch = served
    ocfg = tiny_config("wikimel", "ghmfc").replace(
        online_bert=True, num_entity_sentence=0, finetune_bert=False)
    # the trap this guards: the pooled-cache property is on by default for
    # wikimel, so without the online_bert guard a feats_fn WOULD be built
    assert ocfg.entity_pooling_cached
    r = Ranker(ocfg, params={"w": np.zeros((2, 2), np.float32)},
               entity_tables=tables)
    assert r.store is not None and r._feats_fn is None
    assert r.store.include == ("text",)  # retrieval scans only text
    # /rank field order advertises the online token-feature contract
    assert rank_feat_fields(r) == list(OnlineBatch._fields[:-1])
    # retrieval works (model-independent raw-text scan), exact + int8
    q = np.asarray(tables["entity_text_feature"][[3, 7], 0], np.float32)
    s, i = r.retrieve(q, k=3, mode="exact")
    assert i[0, 0] == 3 and i[1, 0] == 7
    # an int8 store is a valid ONLINE config too (int8 retrieval capacity)
    rq = Ranker(ocfg, params={"w": np.zeros((2, 2), np.float32)},
                entity_tables=tables, quantize_store=True)
    assert rq.store.quantized and rq._feats_fn is None
    sq, iq = rq.retrieve(q, k=3, mode="exact")
    assert iq[0, 0] == 3 and iq[1, 0] == 7
    # the offline-only precompute fast path refuses by name
    with pytest.raises(NotImplementedError, match="online"):
        r.precompute_entity_reprs()
    # a truly store-less server reports retrieval as a SERVER fault
    r0 = Ranker(ocfg, params={"w": np.zeros((2, 2), np.float32)})
    with pytest.raises(RuntimeError, match="entity tables"):
        r0.retrieve(q, k=3)


def test_online_ranker_bundle_roundtrip(served, tmp_path):
    """An online Ranker's bundle (text-only tables, no rows feats_fn)
    reconstructs a server whose retrieval matches the original exactly."""
    from drin_tpu.serve import Ranker

    cfg, tables, ds, params, batch = served
    ocfg = tiny_config("wikimel", "ghmfc").replace(
        online_bert=True, num_entity_sentence=0, finetune_bert=False)
    slim = {k: tables[k] for k in ("entity_text_feature", "entity_text_mask")}
    r = Ranker(ocfg, params={"w": np.zeros((2, 2), np.float32)},
               entity_tables=slim)
    r.save_bundle(str(tmp_path / "bundle"))
    r2 = Ranker.from_bundle(str(tmp_path / "bundle"))
    assert r2.cfg.online_bert and r2.store is not None and r2._feats_fn is None
    q = np.asarray(tables["entity_text_feature"][[4, 9], 0], np.float32)
    s1, i1 = r.retrieve(q, k=3, mode="exact")
    s2, i2 = r2.retrieve(q, k=3, mode="exact")
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)


def test_http_status_codes_classify_faults(served):
    """Server-side faults return 500; malformed payloads return 400 — a
    blanket 400 would make retry policies blame clients for backend
    faults."""
    import types
    import urllib.error

    from drin_tpu.serve import _encode_arrays, serve_http

    cfg = served[0]

    def boom_rank(feats, k):
        raise RuntimeError("device fell over")

    boom = types.SimpleNamespace(cfg=cfg, rank=boom_rank)
    server = serve_http(boom, port=0)
    port = server.server_address[1]

    def post(body: bytes):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/rank", data=body,
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                return resp.status, json.loads(resp.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    try:
        payload = _encode_arrays({"a": np.zeros((1, 2), np.float32)})
        ok_body = json.dumps({"features": payload, "k": 1}).encode()
        code, out = post(ok_body)
        assert code == 500 and "RuntimeError" in out["error"]
        code, out = post(b"{not json")
        assert code == 400
        code, out = post(json.dumps({"wrong_key": 1}).encode())
        assert code == 400 and "KeyError" in out["error"]
    finally:
        server.shutdown()


def test_batching_ranker_close_resolves_taken_window(served):
    """close() must not strand a window the dispatcher has taken but not yet
    submitted.  Arrange: pipeline_depth=2 flushes block the device while the
    dispatcher holds window 3 in _inflight.acquire(); close()'s first join
    times out, the flush pool shuts down, and the dispatcher's submit hits
    the closed pool — the fallback must flush INLINE so every caller's
    future resolves (before the fix those callers blocked forever in
    fut.result())."""
    import concurrent.futures as cf
    import threading
    import time
    import types

    from drin_tpu.serve import BatchingRanker

    cfg = served[0]
    release = threading.Event()
    started = []  # one entry per flush that reached the (blocked) device fn

    def rank(feats, k):
        started.append(None)
        release.wait(timeout=30)
        b = feats[0].shape[0]
        return np.zeros((b, k), np.float32), np.zeros((b, k), np.int64)

    dummy = types.SimpleNamespace(cfg=cfg, rank=rank)
    br = BatchingRanker(dummy, max_batch=1, wait_ms=1.0, buckets=(1,),
                        pipeline_depth=2)
    feats = (np.zeros((1, 3), np.float32),)

    def wait_for(cond, what, deadline=20.0):
        # observable-state sync, not wall-clock sleeps: fixed sleeps made
        # this exact regression test flaky on the contended 1-core host
        t0 = time.monotonic()
        while not cond():
            assert time.monotonic() - t0 < deadline, f"waiting for {what}"
            time.sleep(0.01)

    with cf.ThreadPoolExecutor(3) as ex:
        futs = [ex.submit(br.rank, feats, 2)]
        wait_for(lambda: len(started) >= 1, "flush 1 in flight (sem 2 -> 1)")
        futs.append(ex.submit(br.rank, feats, 2))
        wait_for(lambda: len(started) >= 2, "flush 2 in flight (sem 1 -> 0)")
        futs.append(ex.submit(br.rank, feats, 2))
        # window 3 dequeued; with both pipeline slots held the dispatcher
        # is now blocked in _inflight.acquire() holding the taken window
        wait_for(br._q.empty, "window 3 taken by the dispatcher")
        t = threading.Timer(0.5, release.set)
        t.start()
        try:
            br.close(timeout=0.2)
            for f in futs:
                s, i = f.result(timeout=30)
                assert s.shape == (1, 2)
        finally:
            t.cancel()
            release.set()


def test_projection_idempotent_after_bundle_roundtrip(served, tmp_path):
    """A projected bundle redeployed with ``project_entities=true`` (the
    same flag the first deploy used) must not double-project (review
    finding): the bundle persists ``entity_projected=true`` plus the
    PROJECTED tables, so a second ``precompute_entity_projection`` would
    push slot-0 text through the entity final layer again and feed the
    [N, gcn_embed_dim] image table to entity_image_linear's
    [resnet_embed_dim, ...] kernel.  The call is a no-op on an
    already-projected config."""
    from drin_tpu.serve import Ranker

    cfg, tables, ds, params, batch = served
    r = Ranker(cfg, params=params, entity_tables=tables)
    r.precompute_entity_projection()
    want = r.score(batch[:-1])
    r.save_bundle(str(tmp_path / "pb"))

    r2 = Ranker.from_bundle(str(tmp_path / "pb"))
    assert r2.cfg.entity_projected
    r2.precompute_entity_projection()  # the redeploy flag: must be a no-op
    assert r2.cfg.entity_projected
    np.testing.assert_allclose(r2.score(batch[:-1]), want, rtol=1e-5, atol=1e-6)


def test_shard_retrieval_releases_single_device_caches(served):
    """shard_retrieval must hand retrieval HBM over to the shards (review
    finding): ShardedRetrieval holds its own row-sharded copies, so keeping
    the full single-device [N, D] table (and int8 cache) pinned — or
    re-materializing it inside retrieve()'s sharded branch — would double
    resident bytes at exactly the table scales sharding exists for."""
    from drin_tpu.serve import Ranker

    cfg, tables, ds, params, batch = served
    r = Ranker(cfg, params=params, entity_tables=tables)
    rng = np.random.default_rng(11)
    D = tables["entity_text_feature"].shape[-1]
    q = rng.standard_normal((2, D)).astype(np.float32)
    fs, fi = r.retrieve(q, k=4, mode="exact")  # builds the single-device cache
    r.quantize_retrieval()                     # and the int8 cache
    assert r._retrieval_table is not None and r._retrieval_q is not None

    r.shard_retrieval()
    assert r._retrieval_table is None and r._retrieval_q is None
    ss, si = r.retrieve(q, k=4, mode="exact")
    np.testing.assert_array_equal(fi, si)
    np.testing.assert_allclose(ss, fs, rtol=2e-4, atol=1e-5)
    # the sharded-path retrieve must NOT have re-pinned the full table
    assert r._retrieval_table is None and r._retrieval_q is None
