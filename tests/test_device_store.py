# -*- coding: utf-8 -*-
"""Device-resident entity tables: in-step gather must equal the host-gather
path exactly (same pooled tables, same rows)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from drin_tpu.data.dataset import MELFeatureDataset, load_wikimel_entity_tables
from drin_tpu.data.device_store import DeviceEntityStore
from drin_tpu.data.synthetic import make_synthetic_store, tiny_config
from drin_tpu.models.drin import DRIN


@pytest.fixture(scope="module")
def wm(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("wm-dev"))
    cfg = tiny_config("wikimel", "drin", preprocess_dir=d)
    make_synthetic_store(cfg, n_mentions=10, n_entities=25, seed=11)
    tables = load_wikimel_entity_tables(cfg)
    ds = MELFeatureDataset(cfg, "train", tables)
    return cfg, tables, ds


def test_rows_path_equals_host_gather(wm):
    cfg, tables, ds = wm
    store = DeviceEntityStore(cfg, tables, dtype=jnp.float32)
    feats_fn = store.drin_feats_fn()

    idx = np.arange(4)
    host_batch = ds.drin_batch(idx)
    rows_batch = ds.drin_rows_batch(idx)

    model = DRIN(cfg)
    params = model.init(jax.random.key(0), host_batch[:-1])["params"]
    s_host = np.asarray(model.apply({"params": params}, host_batch[:-1]))
    s_rows = np.asarray(jax.jit(lambda p, f: model.apply({"params": p}, feats_fn(f)))(
        params, tuple(jnp.asarray(np.asarray(x)) for x in rows_batch[:-1])))
    np.testing.assert_allclose(s_rows, s_host, rtol=1e-6)
    np.testing.assert_array_equal(rows_batch.answer, host_batch.answer)


def test_rows_batch_is_small(wm):
    cfg, tables, ds = wm
    host = ds.drin_batch(np.arange(4))
    rows = ds.drin_rows_batch(np.arange(4))
    host_bytes = sum(np.asarray(x).nbytes for x in host)
    rows_bytes = sum(np.asarray(x).nbytes for x in rows)
    assert rows_bytes < host_bytes  # the point of the feature


def test_trainer_with_device_store(wm):
    from drin_tpu.train.trainer import Trainer

    cfg, tables, ds = wm
    store = DeviceEntityStore(cfg, tables, dtype=jnp.float32)
    feats_fn = store.drin_feats_fn()
    example = next(ds.batches(cfg.batch_size, kind="drin_rows", pad_to_full=True))
    model = DRIN(cfg)
    params = model.init(jax.random.key(0), feats_fn(tuple(np.asarray(x) for x in example[:-1])))["params"]
    apply_fn = lambda p, f: model.apply({"params": p}, f)
    tr = Trainer(cfg, apply_fn, params, feats_fn=feats_fn, log=lambda *a: None)
    out = tr._run_epoch(ds, "train", True, "drin_rows")
    assert np.isfinite(out["loss"])


def test_step_does_not_embed_tables_as_constants(wm):
    """Device tables must cross the jit boundary as ARGUMENTS.  Closure-
    captured tables get baked into the lowered program as dense constants —
    harmless at test sizes, but a multi-hundred-MB production table makes
    the compile hang (observed on the target chip; BASELINE.md serving
    notes).  Guard: lower a step against a ~13MB table and require the
    StableHLO text to stay small (an embedded dense literal would be tens
    of MB of text)."""
    from drin_tpu.train.trainer import build_step_fns, create_train_state

    cfg, _, ds = wm
    N = 26_000  # x 2 x 64 f32 = 13.3MB text table
    rng = np.random.default_rng(0)
    D, Dr, Te = cfg.bert_embed_dim, cfg.resnet_embed_dim, cfg.entity_object_topk
    big_tables = {
        "entity_text_feature": rng.standard_normal((N, 2, D)).astype(np.float32),
        "entity_image_feature": rng.standard_normal((N, 1, Dr)).astype(np.float32),
        "entity_object_feature": rng.standard_normal((N, Te, 1, Dr)).astype(np.float32),
        "entity_object_score": rng.uniform(0, 1, (N, Te)).astype(np.float32),
    }
    store = DeviceEntityStore(cfg, big_tables, dtype=jnp.float32)
    feats_fn = store.drin_feats_fn()
    assert feats_fn.tables is not None  # the pass-as-argument contract

    rows_batch = ds.drin_rows_batch(np.arange(4))
    model = DRIN(cfg)
    feats = feats_fn(tuple(jnp.asarray(np.asarray(x)) for x in rows_batch[:-1]))
    params = model.init(jax.random.key(0), feats)["params"]
    state, tx = create_train_state(params, cfg)
    fns = build_step_fns(lambda p, f: model.apply({"params": p}, f), cfg, tx,
                         feats_fn=feats_fn)
    batch = tuple(np.asarray(x) for x in rows_batch)
    lowered = fns.train_step.lower(state, batch, np.ones((4,), np.float32),
                                   __import__("drin_tpu.train.metrics",
                                              fromlist=["init_state"]).init_state(cfg.metrics_topk))
    text = lowered.as_text()
    total = sum(np.asarray(t).nbytes for t in feats_fn.tables)
    assert total > 5_000_000  # the table really is big
    assert len(text) < 2_000_000, (
        f"lowered program is {len(text)/1e6:.1f}MB of text - entity tables "
        "are being embedded as constants instead of passed as arguments")


def test_quantized_store_machinery_is_exact(wm):
    """int8 rank tables (VERDICT r3 next-#6): the quantized store's
    feats_fn must reproduce EXACTLY the features a host-side dequantize
    (q * scale) yields — quantization itself is the ONLY approximation;
    the gather/dequant machinery adds nothing."""
    from drin_tpu.data.device_store import quantize_entity_rows

    cfg, tables, ds = wm
    store = DeviceEntityStore(cfg, tables, dtype=jnp.float32, quantize=True)
    feats_fn = store.drin_feats_fn()
    rows_batch = ds.drin_rows_batch(np.arange(4))
    feats = jax.jit(feats_fn)(tuple(jnp.asarray(np.asarray(x)) for x in rows_batch[:-1]))
    rows = np.asarray(rows_batch.entity_rows)

    def host_deq(x, per_slot=False):
        q, s = quantize_entity_rows(np.asarray(x), per_slot=per_slot)
        lead = 2 if per_slot else 1
        flat = q.reshape(q.shape[:lead] + (-1,)).astype(np.float32) * s[..., None]
        return flat.reshape(q.shape)

    # the pooled text table quantizes with per-(row, slot) scales (ADVICE r4)
    np.testing.assert_array_equal(
        np.asarray(feats[7]),
        host_deq(tables["entity_text_feature"], per_slot=True)[rows])
    np.testing.assert_array_equal(np.asarray(feats[9]),
                                  host_deq(tables["entity_image_feature"])[rows])
    np.testing.assert_array_equal(np.asarray(feats[10]),
                                  host_deq(tables["entity_object_feature"])[rows])
    # obj_score is kept float (tiny)
    np.testing.assert_array_equal(
        np.asarray(feats[11]),
        np.asarray(tables["entity_object_score"], np.float32)[rows])


def test_quantized_store_memory_and_score_tolerance(wm):
    """The memory claim and the accuracy claim, together: ~0.6x the bf16
    store's resident bytes (~0.3x f32 -> ~2x entities per chip) and scores
    within a tolerance comparable to the bf16 rounding the serving path
    already accepts (measured: int8 max-abs divergence 0.0065 vs bf16's
    0.0084 on the same batch; scores span ~[0.2, 1.0])."""
    from drin_tpu.serve import Ranker

    cfg, tables, ds = wm
    cfg = cfg.replace(compute_dtype="float32")
    model = DRIN(cfg)
    params = model.init(jax.random.key(0), ds.drin_batch(np.arange(4))[:-1])["params"]
    s_f32 = DeviceEntityStore(cfg, tables, dtype=jnp.float32)
    s_bf16 = DeviceEntityStore(cfg, tables, dtype=jnp.bfloat16)
    s_q = DeviceEntityStore(cfg, tables, dtype=jnp.float32, quantize=True)
    assert s_q.nbytes < 0.65 * s_bf16.nbytes
    assert s_q.nbytes < 0.33 * s_f32.nbytes

    rf = Ranker(cfg, params=params, entity_tables=tables)
    rq = Ranker(cfg, params=params, entity_tables=tables, quantize_store=True)
    assert rq.store.quantized and rq.store.text.dtype == jnp.int8
    b = ds.drin_rows_batch(np.arange(6))
    sf, sq = rf.score(b[:-1]), rq.score(b[:-1])
    np.testing.assert_allclose(sq, sf, atol=0.03)
    assert (sf.argmax(-1) == sq.argmax(-1)).all()
    # retrieval over the quantized store dequantizes its source: indices
    # must match the float store's and never address pad/garbage rows
    q = np.asarray(tables["entity_text_feature"][[3, 17], 0])
    fs, fi = rf.retrieve(q, k=5, mode="exact")
    qs, qi = rq.retrieve(q, k=5, mode="exact")
    assert qi[0, 0] == 3 and qi[1, 0] == 17
    np.testing.assert_allclose(qs, fs, atol=0.02)


def test_quantized_store_composes_with_row_sharding(wm):
    """quantize=True + shard_rows=True: the owner-gather + dequant over the
    (4, 2) mesh must equal the replicated quantized store exactly (the
    cross-rank sum has exactly one nonzero term per element)."""
    from drin_tpu.parallel import mesh as pmesh

    cfg, tables, ds = wm
    mesh = pmesh.make_mesh(devices=jax.devices()[:8], data=4, model=2)
    s_rep = DeviceEntityStore(cfg, tables, dtype=jnp.float32, quantize=True)
    s_sh = DeviceEntityStore(cfg, tables, dtype=jnp.float32, quantize=True,
                             mesh=mesh, shard_rows=True)
    assert s_sh.text.dtype == jnp.int8
    rows_batch = ds.drin_rows_batch(np.arange(4))
    feats = tuple(jnp.asarray(np.asarray(x)) for x in rows_batch[:-1])
    f_rep = jax.jit(s_rep.drin_feats_fn())(feats)
    from jax.sharding import NamedSharding, PartitionSpec as P

    put = tuple(jax.device_put(np.asarray(x), NamedSharding(mesh, P()))
                for x in feats)
    f_sh = jax.jit(s_sh.drin_feats_fn())(put)
    for a, b in zip(f_rep, f_sh):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_float_table_accumulates_on_host(wm):
    """float_table's chunked path on a ROW-SHARDED quantized store must not
    rebuild the whole float table on one device (jnp.zeros would sit
    unsharded on the default chip — the single-device copy sharding exists
    to avoid): it accumulates on the host and matches the replicated
    store's dequant exactly on the unpadded rows."""
    from drin_tpu.parallel import mesh as pmesh

    cfg, tables, ds = wm
    mesh = pmesh.make_mesh(devices=jax.devices()[:8], data=4, model=2)
    s_rep = DeviceEntityStore(cfg, tables, dtype=jnp.float32, quantize=True)
    s_sh = DeviceEntityStore(cfg, tables, dtype=jnp.float32, quantize=True,
                             mesh=mesh, shard_rows=True)
    n = s_sh.n_rows
    whole = s_sh.float_table("text", chunk=7)  # forces the chunked path
    assert isinstance(whole, np.ndarray)  # host array, no device buffer
    np.testing.assert_array_equal(
        whole[:n], np.asarray(s_rep.float_table("text", chunk=7))[:n])
    # pad rows (row axis padded to the mesh multiple) dequantize to zero
    np.testing.assert_array_equal(whole[n:], np.zeros_like(whole[n:]))


def test_per_slot_scales_bound_cls_slot_error(wm):
    """ADVICE r4: the pooled text table's slots hold differently-scaled
    quantities; per-(row, slot) scales must keep the small slot's error
    bounded by ITS OWN magnitude, not the big slot's."""
    from drin_tpu.data.device_store import quantize_entity_rows

    rng = np.random.default_rng(3)
    big = 50.0 * rng.standard_normal((20, 768)).astype(np.float32)
    small = rng.standard_normal((20, 768)).astype(np.float32)
    table = np.stack([big, small], axis=1)  # [N, 2, D], 50x magnitude gap

    q_row, s_row = quantize_entity_rows(table)            # one scale per row
    q_slot, s_slot = quantize_entity_rows(table, per_slot=True)
    assert s_slot.shape == (20, 2) and s_row.shape == (20,)
    deq_row = q_row.astype(np.float32) * s_row[:, None, None]
    deq_slot = q_slot.astype(np.float32) * s_slot[..., None]
    err_row = np.abs(deq_row[:, 1] - small).max()
    err_slot = np.abs(deq_slot[:, 1] - small).max()
    # per-slot error is bounded by the small slot's own max/254
    assert err_slot <= np.abs(small).max() / 254 + 1e-6
    assert err_slot < err_row / 10  # row-shared scales were ~50x worse


def test_float_table_chunked_and_float_rows(wm):
    """float_table's chunked dequant (bounded transient HBM, ADVICE r4) and
    float_rows' slice/slot views must all agree exactly with the host
    dequantization."""
    cfg, tables, ds = wm
    store = DeviceEntityStore(cfg, tables, dtype=jnp.float32, quantize=True)

    whole = np.asarray(store.float_table("text"))          # single-pass (N<=chunk)
    chunked = np.asarray(store.float_table("text", chunk=7))  # uneven chunks
    np.testing.assert_array_equal(chunked, whole)

    rows = np.asarray(store.float_rows("text", 3, 11))
    np.testing.assert_array_equal(rows, whole[3:11])
    slot1 = np.asarray(store.float_rows("text", 0, 25, slot=1))
    np.testing.assert_array_equal(slot1, whole[:, 1])

    # non-quantized store: resident tables come back unchanged
    s_f = DeviceEntityStore(cfg, tables, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(s_f.float_table("text", chunk=7)),
                                  np.asarray(s_f.text))
    np.testing.assert_array_equal(np.asarray(s_f.float_rows("text", 2, 5, slot=0)),
                                  np.asarray(s_f.text)[2:5, 0])


def test_fused_gather_kernel_bit_equal():
    """ops/pallas/gather.gather_dequant (interpret mode) must be BIT-EQUAL
    to the XLA gather+dequant it replaces — incl. a row count that doesn't
    divide the block (pad rows gathered then sliced off) and repeated
    indices."""
    from drin_tpu.ops.pallas.gather import (fused_gather_supported,
                                            gather_dequant,
                                            pack_quantized_tables)

    rng = np.random.default_rng(7)
    N, chunks = 300, ((256, 2), (128, 1), (256, 1))
    D = sum(w for w, _ in chunks)
    assert fused_gather_supported(D, chunks)
    qt = [rng.integers(-127, 128, (N, w)).astype(np.int8) for w, _ in chunks]
    sc = [rng.uniform(0.01, 2.0, (N, s)).astype(np.float32)
          for _, s in chunks]
    packed, psc = pack_quantized_tables(qt, sc)
    assert packed.shape == (N, 8, 128)  # 5 data sub-rows pad to the 8-tile
    rows = rng.integers(0, N, (5, 7)).astype(np.int32)  # R=35, pads to 64
    rows[0, :3] = rows[0, 3]  # repeated indices

    outs = gather_dequant(jnp.asarray(packed), jnp.asarray(psc),
                          jnp.asarray(rows), chunks, jnp.float32,
                          interpret=True)
    for out, q, s, (w, ns) in zip(outs, qt, sc, chunks):
        assert out.shape == rows.shape + (w,)
        per = w // ns
        want = (q[rows].reshape(rows.shape + (ns, per)).astype(np.float32)
                * s[rows][..., None]).reshape(rows.shape + (w,))
        np.testing.assert_array_equal(np.asarray(out), want)

    # unsupported layouts are refused, not silently mis-lowered
    assert not fused_gather_supported(D + 64, chunks)
    assert not fused_gather_supported(D, ((256, 3), (128, 1), (256, 1)))

    # out-of-range indices degrade to jnp indexing semantics (wrap negatives
    # once, clamp the rest) — the same rows the XLA store paths gather; a
    # malformed serving request must never turn into an OOB HBM DMA
    bad = np.array([[-1, 0, N - 1, N, N + 7, -2 * N, 3, 5]], np.int32)
    outs = gather_dequant(jnp.asarray(packed), jnp.asarray(psc),
                          jnp.asarray(bad), chunks, jnp.float32,
                          interpret=True)
    fixed = np.clip(np.where(bad < 0, bad + N, bad), 0, N - 1)
    xla = np.asarray(jnp.asarray(qt[0])[jnp.asarray(bad)])
    np.testing.assert_array_equal(xla, qt[0][fixed])  # jnp semantics pinned
    for out, q, s, (w, ns) in zip(outs, qt, sc, chunks):
        per = w // ns
        want = (q[fixed].reshape(bad.shape + (ns, per)).astype(np.float32)
                * s[fixed][..., None]).reshape(bad.shape + (w,))
        np.testing.assert_array_equal(np.asarray(out), want)

    # R=0 (empty candidate list) returns empty arrays like the XLA paths
    # instead of crashing pallas_call with a zero-length grid
    empty = gather_dequant(jnp.asarray(packed), jnp.asarray(psc),
                           jnp.zeros((2, 0), jnp.int32), chunks,
                           jnp.float32, interpret=True)
    for out, (w, _) in zip(empty, chunks):
        assert out.shape == (2, 0, w)
    # non-integer indexers fail loudly like jnp indexing (a silent astype
    # would gather WRONG rows on malformed serving input)
    with pytest.raises(TypeError, match="integer"):
        gather_dequant(jnp.asarray(packed), jnp.asarray(psc),
                       jnp.asarray(rows, jnp.float32), chunks,
                       jnp.float32, interpret=True)
    # the public packer refuses unsupported layouts with the named
    # diagnostic, not a cryptic reshape error
    with pytest.raises(AssertionError, match="128-lane"):
        pack_quantized_tables([rng.integers(-127, 128, (N, 200)).astype(np.int8)],
                              [np.ones((N, 1), np.float32)])


@pytest.fixture(scope="module")
def wm128(tmp_path_factory):
    """128-lane-aligned feature dims (the fused kernel's layout rule);
    everything else stays the tiny schema."""
    d = str(tmp_path_factory.mktemp("wm-dev-128"))
    cfg = tiny_config("wikimel", "drin", preprocess_dir=d,
                      bert_embed_dim=128, resnet_embed_dim=128,
                      gcn_embed_dim=128, entity_final_output_dim=128,
                      mention_final_output_dim=128)
    make_synthetic_store(cfg, n_mentions=8, n_entities=40, seed=13)
    tables = load_wikimel_entity_tables(cfg)
    ds = MELFeatureDataset(cfg, "train", tables)
    return cfg, tables, ds


def test_fused_store_matches_quantized_store(wm128):
    """The fused store (packed int8 table + Pallas gather+dequant) must
    reproduce the standard quantized store's feature tuple BIT-EQUALLY:
    same quantization, same dequant math, only the data movement differs.
    Capacity is preserved (no second per-table copy)."""
    cfg, tables, ds = wm128
    s_q = DeviceEntityStore(cfg, tables, dtype=jnp.float32, quantize=True)
    s_f = DeviceEntityStore(cfg, tables, dtype=jnp.float32, quantize=True,
                            fused_gather=True)
    assert s_f.fused and s_f.text is None  # no per-table copies
    # resident bytes = the packed slab + per-sub-row scales + float scores:
    # the slab pads sub-rows to the 8-sublane tile (2x at these tiny dims;
    # 48/44 = +9% at the reference dims — device_store docstring)
    N, m = s_f.packed.shape[:2]
    assert s_f.nbytes == N * m * 128 + N * m * 4 + s_f.obj_score.nbytes

    rows_batch = ds.drin_rows_batch(np.arange(6))
    feats = tuple(jnp.asarray(np.asarray(x)) for x in rows_batch[:-1])
    f_q = jax.jit(s_q.drin_feats_fn())(feats)
    f_f = jax.jit(s_f.drin_feats_fn())(feats)
    assert len(f_q) == len(f_f)
    for a, b in zip(f_q, f_f):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # whole-table / slice views agree with the per-table quantized layout
    for name in ("text", "image", "obj"):
        np.testing.assert_array_equal(np.asarray(s_f.float_table(name, chunk=16)),
                                      np.asarray(s_q.float_table(name, chunk=16)))
    np.testing.assert_array_equal(np.asarray(s_f.float_rows("text", 3, 9, slot=1)),
                                  np.asarray(s_q.float_rows("text", 3, 9, slot=1)))

    # layout rules are enforced loudly, not silently wrong
    with pytest.raises(AssertionError):
        s_f.baseline_feats_fn()
    with pytest.raises(AssertionError):
        DeviceEntityStore(cfg, tables, dtype=jnp.float32, fused_gather=True)


def test_include_narrowed_store_skips_obj(wm):
    """Baseline (GHMFC) stores read only text+image (reference
    ghmfc.py:202-251): include=('text','image') must skip uploading the
    object tables entirely — smaller resident bytes, loud refusal on any
    object access, and a DRIN feats_fn request fails at build time."""
    cfg, tables, ds = wm
    for quantize in (False, True):
        full = DeviceEntityStore(cfg, tables, dtype=jnp.float32,
                                 quantize=quantize)
        slim = DeviceEntityStore(cfg, tables, dtype=jnp.float32,
                                 quantize=quantize,
                                 include=("text", "image"))
        assert slim.obj is None and slim.obj_score is None
        obj_bytes = sum(np.asarray(tables[k], np.float32).nbytes // (4 if quantize else 1)
                        for k in ("entity_object_feature",))
        assert slim.nbytes <= full.nbytes - obj_bytes
        with pytest.raises(AssertionError, match="include"):
            slim.float_table("obj")
        with pytest.raises(AssertionError, match="include"):
            slim.float_rows("obj", 0, 4)
        with pytest.raises(AssertionError, match="include"):
            slim.drin_feats_fn()
        # the baseline path is unchanged: feature tuples equal the full
        # store's (the object tables never fed it)
        rows_batch = ds.baseline_rows_batch(np.arange(4))
        feats = tuple(jnp.asarray(np.asarray(x)) for x in rows_batch[:-1])
        f_full = jax.jit(full.baseline_feats_fn())(feats)
        f_slim = jax.jit(slim.baseline_feats_fn())(feats)
        for a, b in zip(f_full, f_slim):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # GHMFC reads ONLY the text table (no entity-image branch,
        # reference ghmfc.py:202-251): a text-only store drops the image
        # bytes too, substitutes a zeros placeholder for the unused
        # entity_image slot, and the MODEL's scores are unchanged
        slim_t = DeviceEntityStore(cfg, tables, dtype=jnp.float32,
                                   quantize=quantize, include=("text",))
        assert slim_t.image is None and slim_t.image_scale is None
        img_bytes = np.asarray(tables["entity_image_feature"],
                               np.float32).nbytes // (4 if quantize else 1)
        assert slim_t.nbytes <= slim.nbytes - img_bytes
        with pytest.raises(AssertionError, match="include"):
            slim_t.float_table("image")
        f_text = jax.jit(slim_t.baseline_feats_fn())(feats)
        for i, (a, b) in enumerate(zip(f_full, f_text)):
            if i == 7:  # entity_image: zeros placeholder, never read
                assert not np.asarray(b).any()
            else:
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        from drin_tpu.models.ghmfc import GHMFC

        model = GHMFC(cfg)
        params = model.init(jax.random.key(0), f_full)["params"]
        np.testing.assert_array_equal(
            np.asarray(model.apply({"params": params}, f_full)),
            np.asarray(model.apply({"params": params}, f_text)))
    # unknown names and text-less layouts are refused
    with pytest.raises(AssertionError, match="include"):
        DeviceEntityStore(cfg, tables, dtype=jnp.float32, include=("image",))
    with pytest.raises(AssertionError, match="include"):
        DeviceEntityStore(cfg, tables, dtype=jnp.float32,
                          include=("text", "image", "banana"))


def test_text_only_host_load_feeds_text_only_store(wm):
    """The host loader mirrors the store narrowing
    (load_wikimel_entity_tables(include=...)): a text-only load never
    reads the image/object arrays (multi-GB of host RAM + startup I/O on
    a GHMFC/online serving host) and still feeds a text-only store whose
    feature tuples match the fully-loaded one."""
    from drin_tpu.data.dataset import load_wikimel_entity_tables
    from drin_tpu.data.device_store import include_for

    cfg, tables, ds = wm
    assert include_for("drin") == ("text", "image", "obj")
    assert include_for("baseline") == include_for("online") == ("text",)
    slim_tables = load_wikimel_entity_tables(cfg, include=("text",))
    assert "entity_image_feature" not in slim_tables
    assert "entity_object_feature" not in slim_tables
    s_full = DeviceEntityStore(cfg, tables, dtype=jnp.float32,
                               include=("text",))
    s_slim = DeviceEntityStore(cfg, slim_tables, dtype=jnp.float32,
                               include=("text",))
    rows_batch = ds.baseline_rows_batch(np.arange(4))
    feats = tuple(jnp.asarray(np.asarray(x)) for x in rows_batch[:-1])
    for a, b in zip(jax.jit(s_full.baseline_feats_fn())(feats),
                    jax.jit(s_slim.baseline_feats_fn())(feats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_text_only_store_composes_with_row_sharding(wm):
    """include=('text',) + shard_rows=True (the GHMFC training layout on a
    model>1 mesh — train.py narrows baseline stores like serve.Ranker):
    the owner-gather over the (4, 2) mesh must equal the replicated FULL
    store's baseline feats on every slot the model reads, with no
    image/object tables resident."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from drin_tpu.parallel import mesh as pmesh

    cfg, tables, ds = wm
    mesh = pmesh.make_mesh(devices=jax.devices()[:8], data=4, model=2)
    s_rep = DeviceEntityStore(cfg, tables, dtype=jnp.float32)
    s_sh = DeviceEntityStore(cfg, tables, dtype=jnp.float32, mesh=mesh,
                             shard_rows=True, include=("text",))
    assert s_sh.image is None and s_sh.obj is None and s_sh.sharded
    rows_batch = ds.baseline_rows_batch(np.arange(4))
    feats = tuple(jnp.asarray(np.asarray(x)) for x in rows_batch[:-1])
    f_rep = jax.jit(s_rep.baseline_feats_fn())(feats)
    put = tuple(jax.device_put(np.asarray(x), NamedSharding(mesh, P()))
                for x in feats)
    f_sh = jax.jit(s_sh.baseline_feats_fn())(put)
    for i, (a, b) in enumerate(zip(f_rep, f_sh)):
        if i == 7:  # entity_image: zeros placeholder, model never reads it
            assert not np.asarray(b).any()
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_baseline_store_matches_quantized(wm128):
    """The GHMFC fused layout (text ‖ image slab, include-narrowed) must
    reproduce the XLA quantized store's baseline feature tuple BIT-EQUALLY,
    and a DRIN-layout fused slab refuses baseline_feats_fn (gathering it
    would read the dead object chunk per row)."""
    cfg, tables, ds = wm128
    s_q = DeviceEntityStore(cfg, tables, dtype=jnp.float32, quantize=True,
                            include=("text", "image"))
    s_f = DeviceEntityStore(cfg, tables, dtype=jnp.float32, quantize=True,
                            fused_gather=True, include=("text", "image"))
    assert s_f.fused and s_f.text is None and s_f.obj_score is None
    # slab covers ONLY text+image sub-rows (plus 8-sublane tile pad)
    n_sub = (np.prod(tables["entity_text_feature"].shape[1:])
             + np.prod(tables["entity_image_feature"].shape[1:])) // 128
    assert s_f.packed.shape[1] == -(-int(n_sub) // 8) * 8

    rows_batch = ds.baseline_rows_batch(np.arange(6))
    feats = tuple(jnp.asarray(np.asarray(x)) for x in rows_batch[:-1])
    f_q = jax.jit(s_q.baseline_feats_fn())(feats)
    f_f = jax.jit(s_f.baseline_feats_fn())(feats)
    assert len(f_q) == len(f_f)
    for a, b in zip(f_q, f_f):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # float views agree across layouts for the packed tables
    for name in ("text", "image"):
        np.testing.assert_array_equal(np.asarray(s_f.float_table(name, chunk=16)),
                                      np.asarray(s_q.float_table(name, chunk=16)))
    np.testing.assert_array_equal(np.asarray(s_f.float_rows("text", 3, 9, slot=0)),
                                  np.asarray(s_q.float_rows("text", 3, 9, slot=0)))

    # the text-only fused layout (GHMFC's default) packs a one-chunk slab
    # and bit-matches the XLA text-only store (placeholder eif both sides)
    s_q_t = DeviceEntityStore(cfg, tables, dtype=jnp.float32, quantize=True,
                              include=("text",))
    s_f_t = DeviceEntityStore(cfg, tables, dtype=jnp.float32, quantize=True,
                              fused_gather=True, include=("text",))
    n_sub_t = int(np.prod(tables["entity_text_feature"].shape[1:])) // 128
    assert s_f_t.packed.shape[1] == -(-n_sub_t // 8) * 8
    f_q_t = jax.jit(s_q_t.baseline_feats_fn())(feats)
    f_f_t = jax.jit(s_f_t.baseline_feats_fn())(feats)
    for a, b in zip(f_q_t, f_f_t):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a DRIN-layout (three-chunk) fused slab refuses the baseline path
    s_drin = DeviceEntityStore(cfg, tables, dtype=jnp.float32, quantize=True,
                               fused_gather=True)
    with pytest.raises(AssertionError, match="include"):
        s_drin.baseline_feats_fn()


def test_fused_store_unaligned_dims_refused(wm):
    """Tiny (non-128-aligned) feature dims must be refused at construction
    — the XLA quantized path is the fallback, never a mis-lowered kernel."""
    cfg, tables, _ = wm
    with pytest.raises(AssertionError):
        DeviceEntityStore(cfg, tables, dtype=jnp.float32, quantize=True,
                          fused_gather=True)


def test_fused_store_serving_end_to_end(wm128):
    """Ranker(fused_gather=True): scores match the quantize_store Ranker
    to a few ULPs (the FEATURE TUPLE is bit-equal —
    test_fused_store_matches_quantized_store — but the Pallas call is an
    XLA fusion boundary, so downstream reassociation can differ by one
    ULP), the projection fast path preserves fused mode, and non-DRIN
    models are refused at construction."""
    from drin_tpu.serve import Ranker

    cfg, tables, ds = wm128
    cfg = cfg.replace(compute_dtype="float32")
    model = DRIN(cfg)
    params = model.init(jax.random.key(1), ds.drin_batch(np.arange(4))[:-1])["params"]
    rq = Ranker(cfg, params=params, entity_tables=tables, quantize_store=True)
    rf = Ranker(cfg, params=params, entity_tables=tables, quantize_store=True,
                fused_gather=True)
    assert rf.store.fused
    b = ds.drin_rows_batch(np.arange(5))
    np.testing.assert_allclose(rf.score(b[:-1]), rq.score(b[:-1]), atol=1e-6)

    # projection rebuild keeps the fused layout (like it keeps quantization)
    rf.precompute_entity_projection()
    assert rf.store.fused and rf.store.quantized
    rq.precompute_entity_projection()
    np.testing.assert_allclose(rf.score(b[:-1]), rq.score(b[:-1]), atol=1e-6)

    # models without a fused table layout are refused before the store
    # (or score fns) are built: melhi builds no pooled store at all
    # (wikidiverse entities are mention-aligned), so an explicit
    # fused/int8 request fails loudly rather than being ignored
    bl_cfg = cfg.replace(model_type="melhi", dataset_name="wikidiverse")
    with pytest.raises(ValueError, match="quantize_store"):
        Ranker(bl_cfg, params={}, entity_tables=tables,
               quantize_store=True, fused_gather=True)
    with pytest.raises(ValueError, match="fused_gather"):
        Ranker(bl_cfg, params={}, entity_tables=tables, fused_gather=True)
