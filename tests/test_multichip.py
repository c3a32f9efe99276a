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
