# -*- coding: utf-8 -*-
"""Multi-chip SPMD tests on the virtual 8-device CPU mesh: the sharded
training step must equal the single-device step bit-for-bit (same program,
different layout), and the driver dry-run entry must pass."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from drin_tpu.data.synthetic import tiny_config
from drin_tpu.models.drin import DRIN
from drin_tpu.parallel import mesh as pmesh
from drin_tpu.train import metrics as M
from drin_tpu.train.trainer import build_step_fns, create_train_state

FIELDS = (
    "mention_text_feature", "mention_text_mask", "mention_start_pos",
    "mention_end_pos", "mention_image_feature", "mention_object_feature",
    "mention_object_score", "entity_text_feature", "entity_text_mask",
    "entity_image_feature", "entity_object_feature", "entity_object_score",
    "miet_similarity", "mtei_similarity", "answer",
)


def _setup(B=8):
    import __graft_entry__ as g

    cfg = tiny_config("wikimel", "drin").replace(
        num_candidates_data=7, batch_size=B, metrics_topk=(1, 5))
    model = DRIN(cfg)
    rng = np.random.default_rng(0)
    feats, answer = g._random_drin_batch(cfg, B=B, rng=rng)
    batch = feats + (answer,)
    params = model.init(jax.random.key(0), feats)["params"]
    apply_fn = lambda p, f: model.apply({"params": p}, f)
    return cfg, model, batch, params, apply_fn


def test_sharded_step_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    cfg, model, batch, params, apply_fn = _setup()
    valid = np.ones((cfg.batch_size,), np.float32)

    # fresh buffer copies per state: the steps donate their inputs
    host_params = jax.device_get(params)

    # single device
    state1, tx1 = create_train_state(jax.tree.map(jnp.asarray, host_params), cfg)
    fns1 = build_step_fns(apply_fn, cfg, tx1)
    m1 = M.init_state(cfg.metrics_topk)
    s1, loss1, m1 = fns1.train_step(state1, tuple(jnp.asarray(x) for x in batch),
                                    jnp.asarray(valid), m1)

    # 4x2 mesh (dp x candidate sharding)
    mesh = pmesh.make_mesh(devices=jax.devices()[:8], data=4, model=2)
    state2, tx2 = create_train_state(jax.tree.map(jnp.asarray, host_params), cfg)
    fns2 = build_step_fns(apply_fn, cfg, tx2, mesh, FIELDS, batch)
    put = pmesh.put_batch(batch, fns2.batch_shardings)
    m2 = jax.device_put(M.init_state(cfg.metrics_topk), fns2.replicated)
    state2 = jax.device_put(state2, fns2.replicated)
    s2, loss2, m2 = fns2.train_step(state2, put, jax.device_put(valid, fns2.valid_sharding), m2)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
    for k in cfg.metrics_topk:
        assert float(m1[f"correct_{k}"]) == float(jax.device_get(m2[f"correct_{k}"]))
    for a, b in zip(jax.tree.leaves(jax.device_get(s1.params)),
                    jax.tree.leaves(jax.device_get(s2.params))):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_entity_tensors_actually_sharded():
    """The heavy entity tensors must land candidate-sharded on the mesh (not
    silently replicated)."""
    cfg, model, batch, params, apply_fn = _setup()
    mesh = pmesh.make_mesh(devices=jax.devices()[:8], data=4, model=2)
    specs = pmesh.batch_specs(mesh, FIELDS, batch)
    by_name = dict(zip(FIELDS, specs))
    from jax.sharding import PartitionSpec as P

    assert by_name["entity_text_feature"] == P("data", "model")
    assert by_name["entity_image_feature"] == P("data", "model")
    assert by_name["mention_text_feature"] == P("data")
    # C=8 divides the model axis here; shard_shape confirms a real split
    sh = pmesh.batch_shardings(mesh, FIELDS, batch)
    etf = np.asarray(batch[7])
    assert sh[7].shard_shape(etf.shape)[1] == etf.shape[1] // 2


def _entity_tables(cfg, N, rng, pooled=True):
    D, Dr, Te = cfg.bert_embed_dim, cfg.resnet_embed_dim, cfg.entity_object_topk
    Le = cfg.max_entity_attr_token_len
    t = {
        "entity_text_feature": rng.standard_normal(
            (N, 2, D) if pooled else (N, Le, D)).astype(np.float32),
        "entity_image_feature": rng.standard_normal((N, 1, Dr)).astype(np.float32),
        "entity_object_feature": rng.standard_normal((N, Te, 1, Dr)).astype(np.float32),
        "entity_object_score": rng.uniform(0, 1, (N, Te)).astype(np.float32),
    }
    if not pooled:
        lens = rng.integers(2, Le, size=N)
        t["entity_text_mask"] = (np.arange(Le)[None] < lens[:, None]).astype(np.int64)
    return t


def test_sharded_entity_tables_match_replicated():
    """Row-sharded entity tables (P('model') on the row axis + in-step
    owner-gather/reduce-scatter) must be demonstrably sharded AND produce the
    same train step as the replicated tables."""
    from drin_tpu.data.device_store import DeviceEntityStore

    cfg, model, batch, params, apply_fn = _setup(B=8)
    mesh = pmesh.make_mesh(devices=jax.devices()[:8], data=4, model=2)
    C = cfg.num_candidates_model
    N = 31  # odd: exercises the row-padding path
    rng = np.random.default_rng(4)
    tables = _entity_tables(cfg, N, rng)
    rows = rng.integers(0, N, (8, C)).astype(np.int32)
    rows_fields = FIELDS[:7] + ("entity_rows", "miet_similarity", "mtei_similarity", "answer")
    rows_batch = batch[:7] + (rows, batch[12], batch[13], batch[14])
    host_params = jax.device_get(params)

    results = {}
    for shard in (False, True):
        store = DeviceEntityStore(
            cfg, tables, dtype=np.float32, mesh=mesh, shard_rows=shard,
            sharding=None if shard else pmesh.replicated(mesh))
        if shard:
            # each model-rank holds half the (padded) rows — a real split
            assert store.text.sharding.shard_shape(store.text.shape)[0] == 16
        else:
            assert store.text.shape[0] == N
        ff = store.drin_feats_fn()
        st, tx = create_train_state(jax.tree.map(jnp.asarray, host_params), cfg)
        fns = build_step_fns(apply_fn, cfg, tx, mesh, rows_fields, rows_batch, ff)
        put = pmesh.put_batch(rows_batch, fns.batch_shardings)
        m = jax.device_put(M.init_state(cfg.metrics_topk), fns.replicated)
        st = jax.device_put(st, fns.replicated)
        valid = jax.device_put(np.ones((8,), np.float32), fns.valid_sharding)
        st, loss, m = fns.train_step(st, put, valid, m)
        results[shard] = (float(loss), jax.device_get(st.params))
    np.testing.assert_allclose(results[False][0], results[True][0], rtol=1e-6)
    for a, b in zip(jax.tree.leaves(results[False][1]), jax.tree.leaves(results[True][1])):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_sharded_nonpooled_table_gather_exact():
    """The non-pooled token-level table (the ~20GB case the sharding exists
    for) gathers bit-exactly vs a host-side fancy-index, including the
    text mask, and supports a full train step on the mesh."""
    from drin_tpu.data.device_store import DeviceEntityStore
    import __graft_entry__ as g

    cfg = tiny_config("wikimel", "drin").replace(
        num_candidates_data=7, batch_size=8, metrics_topk=(1, 5),
        cache_entity_pooling=False)
    assert not cfg.entity_pooling_cached
    mesh = pmesh.make_mesh(devices=jax.devices()[:8], data=4, model=2)
    C = cfg.num_candidates_model
    rng = np.random.default_rng(5)
    N = 26
    tables = _entity_tables(cfg, N, rng, pooled=False)
    store = DeviceEntityStore(cfg, tables, dtype=np.float32, mesh=mesh, shard_rows=True)
    feats, answer = g._random_drin_batch(cfg, B=8, rng=rng)
    rows = rng.integers(0, N, (8, C)).astype(np.int32)
    rows_batch = feats[:7] + (rows, feats[12], feats[13])
    got = store.drin_feats_fn()(tuple(jnp.asarray(np.asarray(x)) for x in rows_batch))
    np.testing.assert_array_equal(np.asarray(got[7]), tables["entity_text_feature"][rows])
    np.testing.assert_array_equal(np.asarray(got[8]), tables["entity_text_mask"][rows])
    np.testing.assert_array_equal(np.asarray(got[9]), tables["entity_image_feature"][rows])
    np.testing.assert_array_equal(np.asarray(got[10]), tables["entity_object_feature"][rows])
    np.testing.assert_array_equal(np.asarray(got[11]), tables["entity_object_score"][rows])

    model = DRIN(cfg)
    params = model.init(jax.random.key(0), got)["params"]
    st, tx = create_train_state(params, cfg)
    rows_fields = FIELDS[:7] + ("entity_rows", "miet_similarity", "mtei_similarity", "answer")
    full = rows_batch + (answer,)
    fns = build_step_fns(lambda p, f: model.apply({"params": p}, f), cfg, tx,
                         mesh, rows_fields, full, store.drin_feats_fn())
    put = pmesh.put_batch(full, fns.batch_shardings)
    m = jax.device_put(M.init_state(cfg.metrics_topk), fns.replicated)
    st = jax.device_put(st, fns.replicated)
    valid = jax.device_put(np.ones((8,), np.float32), fns.valid_sharding)
    _, loss, m = fns.train_step(st, put, valid, m)
    assert np.isfinite(float(loss))


def _collective_shapes(hlo_text: str, kind: str):
    """Element counts of every ``kind`` collective's result in compiled HLO."""
    import re

    out = []
    for dt, dims in re.findall(r"(\w+)\[([0-9,]*)\][^=]*? " + kind + r"\(", hlo_text):
        out.append(int(np.prod([int(d) for d in dims.split(",") if d] or [1])))
    return out


def test_sharded_gather_hlo_structure():
    """Static guard on the row-sharded table path's compiled collectives
    (device_store.py design intent; the only multi-chip perf signal
    available on a 1-chip host): the post-GSPMD train step must keep one
    reduce-scatter per table (the psum_scatter combine over C) and must NOT
    contain any table-scale all-gather/all-reduce — a partitioner regression
    that re-replicates the table would show up exactly there."""
    from drin_tpu.data.device_store import DeviceEntityStore
    import __graft_entry__ as g

    cfg = tiny_config("wikimel", "drin").replace(
        num_candidates_data=7, batch_size=8, metrics_topk=(1, 5),
        cache_entity_pooling=False)
    mesh = pmesh.make_mesh(devices=jax.devices()[:8], data=4, model=2)
    C = cfg.num_candidates_model
    rng = np.random.default_rng(5)
    N = 512  # table rows >> batch so table-vs-activation sizes can't collide
    tables = _entity_tables(cfg, N, rng, pooled=False)
    store = DeviceEntityStore(cfg, tables, dtype=np.float32, mesh=mesh, shard_rows=True)
    feats, answer = g._random_drin_batch(cfg, B=8, rng=rng)
    rows = rng.integers(0, N, (8, C)).astype(np.int32)
    rows_batch = feats[:7] + (rows, feats[12], feats[13])
    ff = store.drin_feats_fn()
    got = ff(tuple(jnp.asarray(np.asarray(x)) for x in rows_batch))
    model = DRIN(cfg)
    params = model.init(jax.random.key(0), got)["params"]
    st, tx = create_train_state(params, cfg)
    rows_fields = FIELDS[:7] + ("entity_rows", "miet_similarity", "mtei_similarity", "answer")
    full = rows_batch + (answer,)
    fns = build_step_fns(lambda p, f: model.apply({"params": p}, f), cfg, tx,
                         mesh, rows_fields, full, ff)
    put = pmesh.put_batch(full, fns.batch_shardings)
    m = jax.device_put(M.init_state(cfg.metrics_topk), fns.replicated)
    st = jax.device_put(st, fns.replicated)
    valid = jax.device_put(np.ones((8,), np.float32), fns.valid_sharding)
    txt = fns.train_step.lower(st, put, valid, m).compile().as_text()

    n_tables = 5  # text, mask, image, object, object_score
    rs = _collective_shapes(txt, "reduce-scatter")
    assert len(rs) >= n_tables, f"expected >= {n_tables} reduce-scatters, got {rs}"
    # the text table is the one row-sharding exists for: its per-rank shard
    # is the size floor no legitimate activation collective approaches
    text_shard_elems = int(np.prod(store.text.shape)) // mesh.shape["model"]
    for kind in ("all-gather", "all-reduce"):
        sizes = _collective_shapes(txt, kind)
        big = [s for s in sizes if s >= text_shard_elems // 2]
        assert not big, (f"table-scale {kind} in the compiled step: {big} elems "
                         f"(text shard = {text_shard_elems}) — the sharded "
                         f"gather no longer keeps the table in place")


def test_candidate_sharded_batch_hlo_structure():
    """Same static guard for the plain candidate-sharded batch path: the
    entity-side [B, C, ...] tensors stay sharded over (data, model) — no
    all-gather may rebuild a full entity batch tensor (only small
    cross-candidate activation gathers are expected)."""
    cfg, model, batch, params, apply_fn = _setup()
    mesh = pmesh.make_mesh(devices=jax.devices()[:8], data=4, model=2)
    st, tx = create_train_state(params, cfg)
    fns = build_step_fns(apply_fn, cfg, tx, mesh, FIELDS, batch)
    put = pmesh.put_batch(batch, fns.batch_shardings)
    m = jax.device_put(M.init_state(cfg.metrics_topk), fns.replicated)
    st = jax.device_put(st, fns.replicated)
    valid = jax.device_put(np.ones((8,), np.float32), fns.valid_sharding)
    txt = fns.train_step.lower(st, put, valid, m).compile().as_text()
    # largest sharded batch tensor (entity text [B, C, Le, D]) full size
    ent_elems = int(np.prod(np.asarray(batch[7]).shape))
    for kind in ("all-gather", "all-reduce"):
        sizes = _collective_shapes(txt, kind)
        big = [s for s in sizes if s >= ent_elems]
        assert not big, (f"full entity-batch {kind} in the compiled step: "
                         f"{big} elems (entity batch = {ent_elems})")


def test_dryrun_multichip_entry():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dryrun_multichip_driver_contract():
    """Run ``python __graft_entry__.py multichip 8`` as a fresh subprocess
    WITHOUT this suite's conftest env (no XLA_FLAGS / JAX_PLATFORMS) — exactly
    how the driver invokes it. dryrun_multichip itself must force the cpu
    platform and the virtual device count before touching any jax API."""
    import os
    import pathlib
    import subprocess
    import sys

    repo = pathlib.Path(__file__).resolve().parents[1]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_CPU_DEVICES")}
    proc = subprocess.run(
        [sys.executable, str(repo / "__graft_entry__.py"), "multichip", "8"],
        capture_output=True, text=True, timeout=600, env=env, cwd=str(repo),
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "dryrun_multichip ok" in proc.stdout


def test_metric_psum():
    """psum_state over the data axis == summing per-device counters."""
    from functools import partial

    mesh = pmesh.make_mesh(devices=jax.devices()[:8], data=8, model=1)
    topk = (1,)

    @partial(jax.shard_map, mesh=mesh, in_specs=jax.sharding.PartitionSpec("data"),
             out_specs=jax.sharding.PartitionSpec())
    def per_device_counts(x):
        st = {"correct_1": jnp.sum(x), "total": jnp.asarray(x.shape[0], jnp.float32)}
        return M.psum_state(st, "data")

    x = np.arange(16, dtype=np.float32)
    st = per_device_counts(x)
    assert float(st["correct_1"]) == x.sum()
    assert float(st["total"]) == 16.0


@pytest.mark.parametrize("nd,nm", [(8, 1), (2, 4)])
def test_other_mesh_shapes(nd, nm):
    """Pure-DP and candidate-heavy mesh shapes compile and run the full
    train step (the 4x2 default is covered above)."""
    cfg, model, batch, params, apply_fn = _setup(B=8)
    mesh = pmesh.make_mesh(devices=jax.devices()[:8], data=nd, model=nm)
    state, tx = create_train_state(jax.tree.map(jnp.asarray, jax.device_get(params)), cfg)
    fns = build_step_fns(apply_fn, cfg, tx, mesh, FIELDS, batch)
    put = pmesh.put_batch(batch, fns.batch_shardings)
    m = jax.device_put(M.init_state(cfg.metrics_topk), fns.replicated)
    state = jax.device_put(state, fns.replicated)
    valid = jax.device_put(np.ones((cfg.batch_size,), np.float32), fns.valid_sharding)
    _, loss, m = fns.train_step(state, put, valid, m)
    assert np.isfinite(float(loss))
    assert int(jax.device_get(m["total"])) == cfg.batch_size


def test_candidate_padding_matches_unpadded():
    """Prime candidate counts (WikiMEL C=101) shard over the model axis via
    zero-padding + in-model masking: the padded sharded train step must equal
    the unpadded single-device step."""
    import __graft_entry__ as g

    cfg = tiny_config("wikimel", "drin").replace(
        num_candidates_data=10, batch_size=8, metrics_topk=(1, 5))  # C=11 prime
    C = cfg.num_candidates_model
    model = DRIN(cfg)
    rng = np.random.default_rng(11)
    feats, answer = g._random_drin_batch(cfg, B=8, rng=rng)
    batch = feats + (answer,)
    params = model.init(jax.random.key(0), feats)["params"]
    apply_fn = lambda p, f: model.apply({"params": p}, f)
    host_params = jax.device_get(params)
    valid = np.ones((8,), np.float32)

    # single device, unpadded
    st1, tx1 = create_train_state(jax.tree.map(jnp.asarray, host_params), cfg)
    fns1 = build_step_fns(apply_fn, cfg, tx1)
    m1 = M.init_state(cfg.metrics_topk)
    st1, loss1, m1 = fns1.train_step(st1, tuple(jnp.asarray(x) for x in batch),
                                     jnp.asarray(valid), m1)

    # (2, 4) mesh: C=11 pads to 12 and the entity tensors REALLY shard
    mesh = pmesh.make_mesh(devices=jax.devices()[:8], data=2, model=4)
    cp = pmesh.padded_candidate_count(C, 4)
    assert cp == 12
    padded = pmesh.pad_candidates_to(batch, FIELDS, C, cp)
    assert padded[7].shape[1] == 12
    assert padded[-1].shape == batch[-1].shape  # answer untouched
    specs = dict(zip(FIELDS, pmesh.batch_specs(mesh, FIELDS, padded)))
    from jax.sharding import PartitionSpec as P

    assert specs["entity_text_feature"] == P("data", "model")
    st2, tx2 = create_train_state(jax.tree.map(jnp.asarray, host_params), cfg)
    fns2 = build_step_fns(apply_fn, cfg, tx2, mesh, FIELDS, padded)
    put = pmesh.put_batch(padded, fns2.batch_shardings)
    m2 = jax.device_put(M.init_state(cfg.metrics_topk), fns2.replicated)
    st2 = jax.device_put(st2, fns2.replicated)
    st2, loss2, m2 = fns2.train_step(st2, put, jax.device_put(valid, fns2.valid_sharding), m2)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
    for k in cfg.metrics_topk:
        assert float(m1[f"correct_{k}"]) == float(jax.device_get(m2[f"correct_{k}"]))
    for a, b in zip(jax.tree.leaves(jax.device_get(st1.params)),
                    jax.tree.leaves(jax.device_get(st2.params))):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_trainer_autopads_candidates(wm_cfg):
    """Trainer pads the candidate dim automatically when C doesn't divide the
    model axis, end to end through fit/test."""
    from drin_tpu.data.dataset import create_datasets
    from drin_tpu.models import get_model
    from drin_tpu.train.trainer import Trainer

    cfg = wm_cfg.replace(batch_size=4)  # C=8; model axis ify? use model=...
    # C=8 divides 2 — force a non-dividing case instead
    cfg = cfg.replace(num_candidates_data=8, metrics_topk=(1, 5))  # C=9 prime-ish
    from drin_tpu.data.synthetic import make_synthetic_store
    import tempfile

    cfg = cfg.replace(preprocess_dir=tempfile.mkdtemp())
    make_synthetic_store(cfg, n_mentions=8, n_entities=20, seed=17)
    train_ds, valid_ds, test_ds = create_datasets(cfg)
    model, kind = get_model(cfg)
    mesh = pmesh.make_mesh(devices=jax.devices()[:8], data=2, model=4)
    example = next(test_ds.batches(cfg.batch_size, kind=kind, pad_to_full=True))
    params = model.init(jax.random.key(0), tuple(np.asarray(x) for x in example[:-1]))["params"]
    logs = []
    tr = Trainer(cfg, lambda p, f: model.apply({"params": p}, f), params, mesh,
                 batch_fields=type(example)._fields, example_batch=example,
                 log=logs.append)
    assert tr._cand_pad == (9, 12)
    res = tr.fit(train_ds, valid_ds, 1, kind=kind)
    assert np.isfinite(res[0]["loss"])
    out = tr.test(test_ds, kind=kind)
    assert np.isfinite(out["loss"])
    assert any("padded 9 -> 12" in str(l) for l in logs)


@pytest.mark.parametrize("model_type", ["ghmfc", "melhi"])
def test_baseline_padding_on_mesh_matches_single(tmp_path, model_type):
    """GHMFC/MELHI with a non-dividing candidate count: the auto-padded mesh
    trainer reproduces the single-device epoch exactly."""
    import tempfile

    from drin_tpu.data.dataset import create_datasets
    from drin_tpu.data.synthetic import make_synthetic_store
    from drin_tpu.models import get_model
    from drin_tpu.train.trainer import Trainer

    cfg = tiny_config("wikidiverse", model_type, preprocess_dir=str(tmp_path)).replace(
        num_candidates_data=9, metrics_topk=(1, 5), batch_size=4)  # C=10, axis=4
    make_synthetic_store(cfg, n_mentions=8, seed=23)
    train_ds, valid_ds, test_ds = create_datasets(cfg)
    model, kind = get_model(cfg)
    example = next(test_ds.batches(cfg.batch_size, kind=kind, pad_to_full=True))
    params = model.init(jax.random.key(0), tuple(np.asarray(x) for x in example[:-1]))["params"]
    host_params = jax.device_get(params)
    apply_fn = lambda p, f: model.apply({"params": p}, f)

    results = []
    for mesh in (None, pmesh.make_mesh(devices=jax.devices()[:8], data=2, model=4)):
        tr = Trainer(cfg, apply_fn, jax.tree.map(jnp.asarray, host_params), mesh,
                     batch_fields=type(example)._fields, example_batch=example,
                     log=lambda *a: None)
        if mesh is not None:
            assert tr._cand_pad == (10, 12)
        results.append(tr._run_epoch(train_ds, "train", True, kind))
    # full-epoch comparison: Adam amplifies cross-device reduction-order
    # drift, so this is float-tolerance (single-STEP bit-equality is covered
    # by test_candidate_padding_matches_unpadded)
    np.testing.assert_allclose(results[0]["loss"], results[1]["loss"], rtol=2e-4)
    assert results[0]["accs"] == pytest.approx(results[1]["accs"], rel=1e-6)


def test_online_ghmfc_on_mesh_matches_single_device():
    """The online-BERT GHMFC (trains THROUGH the encoder) runs sharded on the
    mesh and matches the single-device step — entity token tensors shard over
    the model axis like the offline features do."""
    from drin_tpu.encoders.bert import BertConfig
    from drin_tpu.models.ghmfc import GHMFCOnline

    B, C, Le = 8, 8, 12
    cfg = tiny_config("wikimel", "ghmfc").replace(
        num_candidates_data=C - 1, batch_size=B, metrics_topk=(1, 5),
        online_bert=True, num_entity_sentence=0, finetune_bert=True,
        mention_final_layer_name="linear", max_mention_sentence_len=16)
    bert_cfg = BertConfig(vocab_size=64, hidden_size=16, num_hidden_layers=1,
                          num_attention_heads=2, intermediate_size=32,
                          max_position_embeddings=64)
    model = GHMFCOnline(cfg, bert_cfg)
    rng = np.random.default_rng(31)
    Lm = 24
    mids = np.zeros((B, Lm), np.int64)
    mmask = np.zeros((B, Lm), np.int64)
    for b in range(B):
        n = rng.integers(8, Lm)
        mids[b, 0], mids[b, 1 : n - 1], mids[b, n - 1] = 1, rng.integers(5, 64, n - 2), 2
        mmask[b, :n] = 1
    eids = np.zeros((B, C, Le), np.int64)
    emask = np.zeros((B, C, Le), np.int64)
    for b in range(B):
        for c in range(C):
            n = rng.integers(4, Le)
            eids[b, c, 0], eids[b, c, 1 : n - 1], eids[b, c, n - 1] = 1, rng.integers(5, 64, n - 2), 2
            emask[b, c, :n] = 1
    answer = np.eye(C, dtype=np.float32)[rng.integers(0, C - 1, B)][:, :-1]
    batch = (
        mids, mmask, np.full((B,), 2, np.int64), np.full((B,), 4, np.int64),
        rng.standard_normal((B, 4, cfg.resnet_embed_dim)).astype(np.float32),
        eids, emask, np.zeros((B,), np.int64),
        np.zeros((B,), np.float32), answer,
    )
    fields = ("mention_ids", "mention_mask", "mention_start_pos", "mention_end_pos",
              "mention_image_feature", "entity_ids", "entity_mask",
              "entity_sep_idx", "entity_image_feature", "answer")
    params = model.init(jax.random.key(0), batch[:-1])["params"]
    host_params = jax.device_get(params)
    apply_fn = lambda p, f: model.apply({"params": p}, f)
    valid = np.ones((B,), np.float32)

    st1, tx1 = create_train_state(jax.tree.map(jnp.asarray, host_params), cfg)
    fns1 = build_step_fns(apply_fn, cfg, tx1)
    m1 = M.init_state(cfg.metrics_topk)
    st1, loss1, m1 = fns1.train_step(st1, tuple(jnp.asarray(x) for x in batch),
                                     jnp.asarray(valid), m1)

    mesh = pmesh.make_mesh(devices=jax.devices()[:8], data=4, model=2)
    st2, tx2 = create_train_state(jax.tree.map(jnp.asarray, host_params), cfg)
    fns2 = build_step_fns(apply_fn, cfg, tx2, mesh, fields, batch)
    put = pmesh.put_batch(batch, fns2.batch_shardings)
    m2 = jax.device_put(M.init_state(cfg.metrics_topk), fns2.replicated)
    st2 = jax.device_put(st2, fns2.replicated)
    st2, loss2, m2 = fns2.train_step(st2, put, jax.device_put(valid, fns2.valid_sharding), m2)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for k in cfg.metrics_topk:
        assert float(m1[f"correct_{k}"]) == float(jax.device_get(m2[f"correct_{k}"]))
    # score matrices equal (post-Adam params are sign-noise on the near-zero
    # grads of unused BERT vocab rows, so forward scores are the stable check)
    params_dev = jax.device_put(jax.tree.map(jnp.asarray, host_params))
    s1 = np.asarray(apply_fn(params_dev, tuple(jnp.asarray(x) for x in batch[:-1])))
    _, _, s2 = fns2.eval_step(jax.device_put(jax.tree.map(jnp.asarray, host_params),
                                             fns2.replicated),
                              put, jax.device_put(valid, fns2.valid_sharding),
                              jax.device_put(M.init_state(cfg.metrics_topk), fns2.replicated))
    np.testing.assert_allclose(s1, np.asarray(jax.device_get(s2)), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("shard_rows", [False, True])
def test_device_tables_with_candidate_padding(shard_rows):
    """The production WikiMEL multi-chip configuration: device-resident
    entity tables (replicated or row-sharded) + a prime candidate count
    padded over the model axis, in one train step, equal to the unpadded
    single-device dense step."""
    from drin_tpu.data.device_store import DeviceEntityStore
    import __graft_entry__ as g

    # replicated tables ride the pooled cache; the SHARDED case runs the
    # non-pooled token-level table — the production WikiMEL combination the
    # row-sharding exists for (a `not shard_rows or True` typo previously
    # pinned both parametrizations to the pooled path, leaving
    # non-pooled + candidate padding untested)
    cfg = tiny_config("wikimel", "drin").replace(
        num_candidates_data=10, batch_size=8, metrics_topk=(1, 5),
        cache_entity_pooling=not shard_rows)
    C = cfg.num_candidates_model  # 11, prime
    rng = np.random.default_rng(41)
    N = 23
    tables = _entity_tables(cfg, N, rng, pooled=not shard_rows)
    rows = rng.integers(0, N, (8, C)).astype(np.int32)
    feats, answer = g._random_drin_batch(cfg, B=8, rng=rng)
    model = DRIN(cfg)

    # dense single-device oracle: host-gather the same rows
    dense = list(feats)
    dense[7] = tables["entity_text_feature"][rows]
    dense[8] = (tables["entity_text_mask"][rows] if shard_rows
                else np.zeros((8,), np.int64))
    dense[9] = tables["entity_image_feature"][rows]
    dense[10] = tables["entity_object_feature"][rows]
    dense[11] = tables["entity_object_score"][rows]
    dense = tuple(dense)
    params = model.init(jax.random.key(0), dense)["params"]
    host_params = jax.device_get(params)
    apply_fn = lambda p, f: model.apply({"params": p}, f)
    valid = np.ones((8,), np.float32)
    st1, tx1 = create_train_state(jax.tree.map(jnp.asarray, host_params), cfg)
    fns1 = build_step_fns(apply_fn, cfg, tx1)
    _, loss1, _ = fns1.train_step(st1, tuple(jnp.asarray(x) for x in dense + (answer,)),
                                  jnp.asarray(valid), M.init_state(cfg.metrics_topk))

    # mesh: rows batch, candidate-padded, tables on device
    mesh = pmesh.make_mesh(devices=jax.devices()[:8], data=2, model=4)
    store = DeviceEntityStore(cfg, tables, dtype=np.float32, mesh=mesh,
                              shard_rows=shard_rows,
                              sharding=None if shard_rows else pmesh.replicated(mesh))
    rows_fields = FIELDS[:7] + ("entity_rows", "miet_similarity", "mtei_similarity", "answer")
    rows_batch = feats[:7] + (rows, feats[12], feats[13], answer)
    cp = pmesh.padded_candidate_count(C, 4)
    padded = pmesh.pad_candidates_to(rows_batch, rows_fields, C, cp)
    assert padded[7].shape == (8, cp)
    st2, tx2 = create_train_state(jax.tree.map(jnp.asarray, host_params), cfg)
    fns2 = build_step_fns(apply_fn, cfg, tx2, mesh, rows_fields, padded,
                          store.drin_feats_fn())
    put = pmesh.put_batch(padded, fns2.batch_shardings)
    m2 = jax.device_put(M.init_state(cfg.metrics_topk), fns2.replicated)
    st2 = jax.device_put(st2, fns2.replicated)
    _, loss2, m2 = fns2.train_step(st2, put,
                                   jax.device_put(valid, fns2.valid_sharding), m2)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)


def test_hybrid_mesh_layout_and_step():
    """make_hybrid_mesh keeps the model axis inside each 'slice' (candidate
    collectives ride ICI; only DP reductions span slices/DCN) and the train
    step on it matches the single-device step."""
    cfg, model, batch, params, apply_fn = _setup()
    devs = jax.devices()[:8]
    fake_slices = [devs[:4], devs[4:]]  # simulate 2 slices on the CPU mesh
    mesh = pmesh.make_hybrid_mesh(fake_slices, model=2)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {"data": 4, "model": 2}
    # model-axis neighbors co-located in one slice; data axis spans both
    for row in mesh.devices:
        assert all(d in fake_slices[0] for d in row) or all(d in fake_slices[1] for d in row)
    first_col = [mesh.devices[i, 0] for i in range(4)]
    assert any(d in fake_slices[0] for d in first_col) and any(d in fake_slices[1] for d in first_col)

    valid = np.ones((cfg.batch_size,), np.float32)
    host_params = jax.device_get(params)
    state1, tx1 = create_train_state(jax.tree.map(jnp.asarray, host_params), cfg)
    fns1 = build_step_fns(apply_fn, cfg, tx1)
    _, loss1, _ = fns1.train_step(state1, tuple(jnp.asarray(x) for x in batch),
                                  jnp.asarray(valid), M.init_state(cfg.metrics_topk))

    state2, tx2 = create_train_state(jax.tree.map(jnp.asarray, host_params), cfg)
    fns2 = build_step_fns(apply_fn, cfg, tx2, mesh, FIELDS, batch)
    put = pmesh.put_batch(batch, fns2.batch_shardings)
    m2 = jax.device_put(M.init_state(cfg.metrics_topk), fns2.replicated)
    state2 = jax.device_put(state2, fns2.replicated)
    _, loss2, m2 = fns2.train_step(state2, put, jax.device_put(valid, fns2.valid_sharding), m2)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
    assert int(jax.device_get(m2["total"])) == cfg.batch_size


def test_hybrid_mesh_honors_data_width():
    """An explicit data width (cfg.mesh_data) limits the hybrid mesh instead
    of silently grabbing every device; left-out devices warn."""
    import warnings

    devs = jax.devices()[:8]
    fake_slices = [devs[:4], devs[4:]]
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        mesh = pmesh.make_hybrid_mesh(fake_slices, model=1, data=4)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {"data": 4, "model": 1}
    assert any("left out" in str(x.message) for x in w)
    with pytest.raises(AssertionError, match="must divide"):
        pmesh.make_hybrid_mesh(fake_slices, model=1, data=3)


def test_hybrid_mesh_refuses_half_idle_pod():
    """An IMPLICIT layout that would idle >= half the pod (one badly
    degraded slice dragging every slice's contribution down) must refuse
    with an actionable message instead of silently training on a fraction
    of the devices; an explicit data width stays a warn-only deliberate
    choice (test_hybrid_mesh_honors_data_width)."""
    devs = jax.devices()[:8]
    lopsided = [devs[:6], devs[6:]]  # smallest slice = 2 -> 4/8 used
    with pytest.raises(ValueError, match="idle"):
        pmesh.make_hybrid_mesh(lopsided, model=2)


def test_max_pooling_survives_candidate_padding():
    """entity_final_pooling='max' (non-cacheable token-level path): the
    zero-padded fake candidates have empty pooling spans, which used to pool
    to finfo.min and NaN-poison every real score through the GCN's
    cross-candidate means."""
    import __graft_entry__ as g

    cfg = tiny_config("wikimel", "drin").replace(
        num_candidates_data=5, batch_size=4, metrics_topk=(1,),
        entity_final_pooling="max", cache_entity_pooling=False)
    assert not cfg.entity_pooling_cached
    C = cfg.num_candidates_model
    model = DRIN(cfg)
    feats, answer = g._random_drin_batch(cfg, B=4, rng=np.random.default_rng(3))
    params = model.init(jax.random.key(0), feats)["params"]
    want = np.asarray(model.apply({"params": params}, feats))
    assert np.isfinite(want).all()

    cp = pmesh.padded_candidate_count(C, 4)  # 6 -> 8: two fake candidates
    assert cp > C
    padded = pmesh.pad_candidates_to(feats + (answer,), FIELDS, C, cp)
    got = np.asarray(model.apply({"params": params}, padded[:-1]))
    assert np.isfinite(got).all(), "fake candidates poisoned the scores"
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
