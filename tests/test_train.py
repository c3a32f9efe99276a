# -*- coding: utf-8 -*-
"""Training harness tests: loss descent, the fit/test schedule, ragged-batch
masking, checkpoint/resume, and all three models end-to-end."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from drin_tpu.data.dataset import create_datasets
from drin_tpu.data.synthetic import make_synthetic_store, tiny_config
from drin_tpu.models import get_model
from drin_tpu.train.trainer import Trainer
from drin_tpu.train.loss import triplet_loss
from drin_tpu.train import metrics as M


def _make_trainer(cfg, **kw):
    train_ds, valid_ds, test_ds = create_datasets(cfg)
    model, kind = get_model(cfg)
    example = next(test_ds.batches(cfg.batch_size, kind=kind, pad_to_full=True))
    params = model.init(jax.random.key(0), tuple(np.asarray(x) for x in example[:-1]))["params"]
    apply_fn = lambda p, f: model.apply({"params": p}, f)
    train_apply_fn = lambda p, f, rng: model.apply(
        {"params": p}, f, deterministic=False, rngs={"dropout": rng})
    tr = Trainer(cfg, apply_fn, params, batch_fields=type(example)._fields,
                 example_batch=example, log=lambda *a: None,
                 train_apply_fn=train_apply_fn, **kw)
    return tr, (train_ds, valid_ds, test_ds), kind


def test_fit_reduces_loss(wd_cfg):
    cfg = wd_cfg.replace(learning_rate=3e-3)
    tr, (train_ds, valid_ds, test_ds), kind = _make_trainer(cfg)
    first = tr._run_epoch(train_ds, "train", True, kind)["loss"]
    for _ in range(4):
        last = tr._run_epoch(train_ds, "train", True, kind)["loss"]
        tr.epoch += 1
    assert last < first, (first, last)
    out = tr.test(test_ds, kind=kind)
    assert np.isfinite(out["loss"])


@pytest.mark.parametrize("dataset_name", ["wikidiverse", "wikimel"])
def test_entity_text_type_name_offline(tmp_path, dataset_name):
    """entity_text_type='name' must flow through the offline store surface:
    synthetic store writes entity-name-feature and the loader reads it
    (reference baselines/data.py:100-105 parameterizes the field name)."""
    import os

    cfg = tiny_config(dataset_name, "drin", preprocess_dir=str(tmp_path)).replace(
        entity_text_type="name")
    make_synthetic_store(cfg, n_mentions=8, n_entities=20, seed=3)
    assert not any("attr" in f for f in os.listdir(tmp_path)), "store must be name-typed"
    tr, (train_ds, valid_ds, test_ds), kind = _make_trainer(cfg)
    res = tr.fit(train_ds, valid_ds, 1, kind=kind)
    assert np.isfinite(res[0]["loss"])


@pytest.mark.parametrize("model_type", ["ghmfc", "melhi"])
def test_baselines_train_end_to_end(tmp_path, model_type):
    cfg = tiny_config("wikidiverse", model_type, preprocess_dir=str(tmp_path))
    make_synthetic_store(cfg, n_mentions=10, seed=2)
    tr, (train_ds, valid_ds, test_ds), kind = _make_trainer(cfg)
    res = tr.fit(train_ds, valid_ds, 1, kind=kind)
    assert np.isfinite(res[0]["loss"])
    out = tr.test(test_ds, kind=kind)
    assert np.isfinite(out["loss"])


def test_ragged_batch_masking_matches_unpadded(wd_cfg):
    """A padded ragged batch with a valid mask must produce the same loss and
    metric counters as the raw unpadded batch."""
    from drin_tpu.data.dataset import MELFeatureDataset
    from drin_tpu.parallel.mesh import pad_batch_to
    from drin_tpu.models.drin import DRIN

    ds = MELFeatureDataset(wd_cfg, "valid")
    n = len(ds) - (len(ds) % 4) + 3 if len(ds) % 4 == 0 else len(ds)
    # take a 3-row batch, pad to 4
    batch = ds.drin_batch(np.arange(3))
    model = DRIN(wd_cfg)
    params = model.init(jax.random.key(1), batch[:-1])["params"]

    scores_raw = model.apply({"params": params}, batch[:-1])
    loss_raw = triplet_loss(jnp.asarray(batch.answer), scores_raw, wd_cfg.triplet_margin)
    st_raw = M.update(M.init_state(wd_cfg.metrics_topk), scores_raw,
                      jnp.asarray(batch.answer), wd_cfg.metrics_topk)

    padded, valid = pad_batch_to(batch, 4)
    scores_pad = model.apply({"params": params}, padded[:-1])
    loss_pad = triplet_loss(jnp.asarray(padded.answer), scores_pad,
                            wd_cfg.triplet_margin, jnp.asarray(valid))
    st_pad = M.update(M.init_state(wd_cfg.metrics_topk), scores_pad,
                      jnp.asarray(padded.answer), wd_cfg.metrics_topk, jnp.asarray(valid))

    np.testing.assert_allclose(float(loss_pad), float(loss_raw), rtol=1e-5)
    for k in wd_cfg.metrics_topk:
        np.testing.assert_allclose(float(st_pad[f"correct_{k}"]), float(st_raw[f"correct_{k}"]))
    assert float(st_pad["total"]) == float(st_raw["total"]) == 3.0


def test_bf16_training(wd_cfg):
    """Mixed precision: bf16 model body over f32 master params trains to a
    finite, decreasing loss with accuracies near the f32 run."""
    cfg = wd_cfg.replace(compute_dtype="bfloat16", learning_rate=3e-3)
    tr, (train_ds, valid_ds, test_ds), kind = _make_trainer(cfg)
    first = tr._run_epoch(train_ds, "train", True, kind)["loss"]
    for _ in range(3):
        last = tr._run_epoch(train_ds, "train", True, kind)["loss"]
    assert np.isfinite(last) and last < first
    # params stayed f32 masters
    assert all(np.asarray(p).dtype != np.dtype("bfloat16")
               for p in jax.tree.leaves(jax.device_get(tr.state.params)))


def test_profiler_flag_writes_trace(tmp_path, wd_cfg):
    """cfg.profiling traces the fit chunk via jax.profiler (the reference
    gates torch.profiler behind the same flag, train.py:64-70)."""
    import os

    cfg = wd_cfg.replace(profiling=True, profile_dir=str(tmp_path / "prof"))
    tr, (train_ds, valid_ds, _), kind = _make_trainer(cfg)
    tr.fit(train_ds, valid_ds, 1, kind=kind)
    files = [os.path.join(r, f) for r, _, fs in os.walk(cfg.profile_dir) for f in fs]
    assert files, "no profiler trace written"


def test_profiler_windowed_schedule(tmp_path, wd_cfg):
    """The windowed schedule (reference torch.profiler wait=1/warmup=1/
    active=3/repeat=2, train.py:64-70) must trace exactly ``repeat`` small
    step windows — one cycle{n} trace dir each — not the whole fit."""
    import os

    cfg = wd_cfg.replace(profiling=True, profile_dir=str(tmp_path / "prof-win"))
    assert (cfg.profile_wait, cfg.profile_warmup, cfg.profile_active,
            cfg.profile_repeat) == (1, 1, 3, 2)
    tr, (train_ds, valid_ds, _), kind = _make_trainer(cfg)
    # 12 mentions / batch 4 = 3 train steps/epoch; 4 epochs = 12 steps covers
    # the 2 x (1+1+3)-step schedule
    tr.fit(train_ds, valid_ds, 4, kind=kind)
    cycles = sorted(d for d in os.listdir(cfg.profile_dir) if d.startswith("cycle"))
    assert cycles == ["cycle0", "cycle1"], cycles
    for c in cycles:
        files = [f for r, _, fs in os.walk(os.path.join(cfg.profile_dir, c)) for f in fs]
        assert files, f"no trace written for {c}"
    # nothing outside the windows: the only top-level entries are the cycles
    assert sorted(os.listdir(cfg.profile_dir)) == cycles


def test_profiler_midwindow_chunk_end_finalizes_cycle(tmp_path, wd_cfg):
    """A fit chunk ending mid-active-window finalizes that cycle (partial
    trace counts toward repeat); the next chunk opens a FRESH cycle dir —
    never a second dump into the same cycle{n}."""
    import os

    cfg = wd_cfg.replace(profiling=True, profile_dir=str(tmp_path / "pmw"))
    tr, (train_ds, valid_ds, _), kind = _make_trainer(cfg)
    # 3 train steps/chunk: the window (skip=2, active=3) is still open when
    # the chunk ends
    tr.fit(train_ds, valid_ds, 1, kind=kind)
    assert sorted(os.listdir(cfg.profile_dir)) == ["cycle0"]
    tr.fit(train_ds, valid_ds, 1, kind=kind)
    cycles = sorted(os.listdir(cfg.profile_dir))
    assert cycles == ["cycle0", "cycle1"], cycles
    for c in cycles:  # exactly one trace session dump per cycle dir
        sessions = os.listdir(os.path.join(cfg.profile_dir, c, "plugins", "profile"))
        assert len(sessions) == 1, (c, sessions)


def test_output_test_result_single_pass(tmp_path, wd_cfg):
    """``test()`` with output_test_result must evaluate the split ONCE —
    eval_step already returns scores + metric state, so the dump and the
    epoch metrics share one pass."""
    import math

    cfg = wd_cfg.replace(output_test_result=True)
    tr, (_, _, test_ds), kind = _make_trainer(
        cfg, output_test_result_path=str(tmp_path / "tr.txt"))
    calls = []
    orig = tr.fns.eval_step
    tr.fns = tr.fns._replace(eval_step=lambda *a: (calls.append(1), orig(*a))[1])
    out = tr.test(test_ds, kind=kind)
    assert np.isfinite(out["loss"]) and out["accs"]
    assert len(calls) == math.ceil(len(test_ds) / cfg.batch_size), len(calls)
    lines = (tmp_path / "tr.txt").read_text().strip().splitlines()
    assert len(lines) == len(test_ds)


def test_store_config_mismatch_is_actionable(tmp_path, wd_cfg):
    """A store built for a different candidate count must fail with a clear
    message naming the knob, not a raw reshape traceback."""
    import pytest

    from drin_tpu.data.dataset import MELFeatureDataset

    bad = wd_cfg.replace(num_candidates_data=9)
    with pytest.raises(ValueError, match="num_candidates_data"):
        MELFeatureDataset(bad, "train")


def _tiny_online_setup(finetune: bool, B=4, C=5, Le=10, Lm=16):
    """Tiny GHMFCOnline (direct mode) + random token batch for one step."""
    import optax

    from drin_tpu.data.synthetic import tiny_config
    from drin_tpu.encoders.bert import BertConfig
    from drin_tpu.models.ghmfc import GHMFCOnline
    from drin_tpu.train.trainer import build_step_fns, create_train_state

    cfg = tiny_config("wikimel", "ghmfc").replace(
        num_candidates_data=C - 1, batch_size=B, metrics_topk=(1,),
        online_bert=True, num_entity_sentence=0, finetune_bert=finetune,
        mention_final_layer_name="linear", max_mention_sentence_len=8)
    bert_cfg = BertConfig(vocab_size=32, hidden_size=8, num_hidden_layers=1,
                          num_attention_heads=2, intermediate_size=16,
                          max_position_embeddings=32)
    model = GHMFCOnline(cfg, bert_cfg)
    rng = np.random.default_rng(7)
    mids = rng.integers(1, 32, (B, Lm)).astype(np.int64)
    mmask = np.ones((B, Lm), np.int64)
    eids = rng.integers(1, 32, (B, C, Le)).astype(np.int64)
    emask = np.ones((B, C, Le), np.int64)
    feats = (mids, mmask, np.ones((B,), np.int64), np.full((B,), 3, np.int64),
             np.zeros((B,), np.float32), eids, emask, np.zeros((B,), np.int64),
             np.zeros((B,), np.float32))
    answer = np.eye(C, dtype=np.float32)[rng.integers(0, C - 1, B)][:, :-1]
    params = model.init(jax.random.key(0), feats)["params"]
    host_params = jax.device_get(params)  # train_step donates the originals
    apply_fn = lambda p, f: model.apply({"params": p}, f)
    state, tx = create_train_state(params, cfg)
    fns = build_step_fns(apply_fn, cfg, tx)
    return optax, host_params, state, fns, feats + (answer,)


def test_frozen_bert_excluded_from_adam():
    """``finetune_bert=False``: the in-forward BERT subtree carries no Adam
    moment buffers (optax.masked — the reference's torch Adam likewise never
    steps requires_grad=False params, ghmfc.py:16-17) and its params are
    bit-identical after a train step, while the heads still move."""
    optax, params, state, fns, batch = _tiny_online_setup(finetune=False)
    moments = state.opt_state.inner_state[0]  # MaskedState -> ScaleByAdamState
    assert isinstance(moments.mu["bert"], optax.MaskedNode)
    assert not isinstance(moments.mu["mention_encoder"], optax.MaskedNode)
    new_state, loss, _ = fns.train_step(
        state, batch, np.ones((4,), np.float32), M.init_state((1,)))
    assert np.isfinite(float(loss))
    jax.tree.map(np.testing.assert_array_equal, jax.device_get(new_state.params["bert"]),
                 params["bert"])
    head_moved = jax.tree.leaves(jax.tree.map(
        lambda a, b: bool(np.any(np.asarray(a) != np.asarray(b))),
        jax.device_get(new_state.params["mention_encoder"]),
        params["mention_encoder"]))
    assert any(head_moved)


def test_finetune_bert_updates_bert():
    """``finetune_bert=True`` keeps BERT in the optimizer and moves it."""
    optax, params, state, fns, batch = _tiny_online_setup(finetune=True)
    moments = state.opt_state[0]  # plain chain: ScaleByAdamState first
    assert not isinstance(moments.mu["bert"], optax.MaskedNode)
    new_state, loss, _ = fns.train_step(
        state, batch, np.ones((4,), np.float32), M.init_state((1,)))
    assert np.isfinite(float(loss))
    moved = jax.tree.leaves(jax.tree.map(
        lambda a, b: bool(np.any(np.asarray(a) != np.asarray(b))),
        jax.device_get(new_state.params["bert"]), params["bert"]))
    assert any(moved)


def test_bert_remat_preserves_finetune_numerics():
    """``bert_remat=True`` (jax.checkpoint per BERT layer) must reproduce the
    fine-tuning loss and gradients to float tolerance — it only trades memory
    for recompute.  (Post-Adam params are NOT compared: the first Adam update
    is ~g/|g| which amplifies last-bit grad differences near zero.)"""
    _, params_a, state_a, fns_a, batch = _tiny_online_setup(finetune=True)
    _, _, state_b, fns_b, batch_b = _tiny_online_setup_remat()
    loss_a, _, scores_a = fns_a.eval_step(state_a.params, batch,
                                          np.ones((4,), np.float32), M.init_state((1,)))
    loss_b, _, scores_b = fns_b.eval_step(state_b.params, batch_b,
                                          np.ones((4,), np.float32), M.init_state((1,)))
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(scores_a), np.asarray(scores_b), rtol=1e-5, atol=1e-6)
    # grads through the full train-step loss, compared directly
    new_a, _, _ = fns_a.train_step(state_a, batch, np.ones((4,), np.float32),
                                   M.init_state((1,)))
    new_b, _, _ = fns_b.train_step(state_b, batch_b, np.ones((4,), np.float32),
                                   M.init_state((1,)))
    mu_a = new_a.opt_state[0].mu  # first-step Adam mu = (1-b1) * grad
    mu_b = new_b.opt_state[0].mu
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-4, atol=1e-7),
        jax.device_get(mu_a), jax.device_get(mu_b))


def _tiny_online_setup_remat():
    """Same tiny online model as _tiny_online_setup(finetune=True) but with
    bert_remat enabled (identical init → comparable step outputs)."""
    import optax

    from drin_tpu.data.synthetic import tiny_config
    from drin_tpu.encoders.bert import BertConfig
    from drin_tpu.models.ghmfc import GHMFCOnline
    from drin_tpu.train.trainer import build_step_fns, create_train_state

    B, C, Le, Lm = 4, 5, 10, 16
    cfg = tiny_config("wikimel", "ghmfc").replace(
        num_candidates_data=C - 1, batch_size=B, metrics_topk=(1,),
        online_bert=True, num_entity_sentence=0, finetune_bert=True,
        mention_final_layer_name="linear", max_mention_sentence_len=8,
        bert_remat=True)
    bert_cfg = BertConfig(vocab_size=32, hidden_size=8, num_hidden_layers=1,
                          num_attention_heads=2, intermediate_size=16,
                          max_position_embeddings=32)
    model = GHMFCOnline(cfg, bert_cfg)
    rng = np.random.default_rng(7)
    mids = rng.integers(1, 32, (B, Lm)).astype(np.int64)
    eids = rng.integers(1, 32, (B, C, Le)).astype(np.int64)
    feats = (mids, np.ones((B, Lm), np.int64), np.ones((B,), np.int64),
             np.full((B,), 3, np.int64), np.zeros((B,), np.float32), eids,
             np.ones((B, C, Le), np.int64), np.zeros((B,), np.int64),
             np.zeros((B,), np.float32))
    answer = np.eye(C, dtype=np.float32)[rng.integers(0, C - 1, B)][:, :-1]
    params = model.init(jax.random.key(0), feats)["params"]
    host_params = jax.device_get(params)
    apply_fn = lambda p, f: model.apply({"params": p}, f)
    state, tx = create_train_state(params, cfg)
    fns = build_step_fns(apply_fn, cfg, tx)
    return optax, host_params, state, fns, feats + (answer,)


def test_checkpoint_save_restore(tmp_path, wd_cfg):
    cfg = wd_cfg.replace(enable_checkpointing=True, checkpoint_dir=str(tmp_path / "ckpt"))
    tr, (train_ds, valid_ds, test_ds), kind = _make_trainer(cfg)
    tr.fit(train_ds, valid_ds, 1, kind=kind)
    saved_params = jax.device_get(tr.state.params)
    saved_step = int(tr.state.step)
    assert saved_step > 0

    # a fresh trainer with the same config resumes from the checkpoint
    tr2, _, _ = _make_trainer(cfg)
    assert int(tr2.state.step) == saved_step
    assert tr2.epoch == 1
    for a, b in zip(jax.tree.leaves(saved_params), jax.tree.leaves(jax.device_get(tr2.state.params))):
        np.testing.assert_array_equal(a, b)


def test_checkpoint_resume_continues_trajectory(tmp_path, wd_cfg):
    """Interrupted-and-resumed training must reproduce the uninterrupted run
    bit-for-bit: fit(2)+fit(2) in one trainer == fit(2), checkpoint, fresh
    trainer restore, fit(2).  Pins epoch-seeded shuffle continuation, the
    step counter through restore, and the per-chunk optimizer-reset
    semantics interacting with resume."""
    cfg = wd_cfg.replace(enable_checkpointing=True,
                         checkpoint_dir=str(tmp_path / "cont-a"))
    tr, (train_ds, valid_ds, _), kind = _make_trainer(cfg)
    tr.fit(train_ds, valid_ds, 2, kind=kind)
    tr.fit(train_ds, valid_ds, 2, kind=kind)
    want = jax.device_get(tr.state.params)

    cfg2 = wd_cfg.replace(enable_checkpointing=True,
                          checkpoint_dir=str(tmp_path / "cont-b"))
    tr2a, _, _ = _make_trainer(cfg2)
    tr2a.fit(train_ds, valid_ds, 2, kind=kind)
    tr2b, _, _ = _make_trainer(cfg2)  # restores the chunk-1 checkpoint
    assert tr2b.epoch == 2 and int(tr2b.state.step) == int(tr2a.state.step)
    tr2b.fit(train_ds, valid_ds, 2, kind=kind)
    jax.tree.map(np.testing.assert_array_equal, want,
                 jax.device_get(tr2b.state.params))


def test_output_test_result_dump(tmp_path, wd_cfg):
    """The golden-output hook (reference train.py:40-43): every test score
    vector + label lands in the dump file."""
    cfg = wd_cfg.replace(output_test_result=True)
    tr, (_, _, test_ds), kind = _make_trainer(
        cfg, output_test_result_path=str(tmp_path / "test-result.txt"))
    tr.test(test_ds, kind=kind)
    lines = (tmp_path / "test-result.txt").read_text().strip().splitlines()
    assert len(lines) == len(test_ds)
    first = lines[0].split("|")
    assert len(first[0].split()) == cfg.num_candidates_model


def test_sigterm_checkpoints_and_stops(tmp_path, wd_cfg):
    """Preemption safety: SIGTERM during fit stops at the next train STEP
    boundary (not the epoch end — grace windows are seconds), saves a
    mid-epoch checkpoint keyed by global step, and raises
    KeyboardInterrupt; a fresh trainer resumes from it."""
    import os
    import signal

    cfg = wd_cfg.replace(enable_checkpointing=True,
                         checkpoint_dir=str(tmp_path / "ckpt-sig"))
    tr, (train_ds, valid_ds, _), kind = _make_trainer(cfg)

    class SignalingDataset:
        """Delivers SIGTERM after the first train batch of the first epoch."""

        def __init__(self, ds):
            self.ds = ds
            self.sent = False

        def make_batch(self, idx, kind):
            batch = self.ds.make_batch(idx, kind)
            if not self.sent:
                self.sent = True
                os.kill(os.getpid(), signal.SIGTERM)
            return batch

        def __len__(self):
            return len(self.ds)

    with pytest.raises(KeyboardInterrupt):
        tr.fit(SignalingDataset(train_ds), valid_ds, 5, kind=kind)
    assert tr.epoch == 0          # stopped INSIDE the first epoch
    step = int(tr.state.step)
    assert step >= 1              # at least the signalled step ran

    tr2, _, _ = _make_trainer(cfg)  # resumes from the mid-epoch checkpoint
    assert tr2.epoch == 0 and int(tr2.state.step) == step


def test_sigterm_during_validation_stops_within_the_pass(tmp_path, wd_cfg):
    """A signal landing during the VALID pass must be acted on at the next
    eval-step boundary (save + stop), not ride out the whole valid pass plus
    another full train epoch — epoch-scale waits outlive TPU preemption
    grace windows (advisor finding, trainer._run_epoch eval branch)."""
    import os
    import signal

    cfg = wd_cfg.replace(enable_checkpointing=True,
                         checkpoint_dir=str(tmp_path / "ckpt-sig-valid"))
    tr, (train_ds, valid_ds, _), kind = _make_trainer(cfg)

    calls = {"valid_batches": 0}

    class SignalingValidDataset:
        """8x index-repeated valid split (long enough that draining it is
        observable); SIGTERM as the FIRST batch is assembled."""

        def __init__(self, ds):
            self.ds = ds

        def make_batch(self, idx, kind):
            if calls["valid_batches"] == 0:
                os.kill(os.getpid(), signal.SIGTERM)
            calls["valid_batches"] += 1
            return self.ds.make_batch(np.asarray(idx) % len(self.ds), kind)

        def __len__(self):
            return 8 * len(self.ds)

    with pytest.raises(KeyboardInterrupt):
        tr.fit(train_ds, SignalingValidDataset(valid_ds), 5, kind=kind)
    assert tr.epoch == 0  # stopped inside the FIRST epoch's valid pass
    # the valid pass broke at a step boundary instead of draining the split
    # (prefetch may assemble a couple of batches past the signalled one)
    n_valid_batches = -(-8 * len(valid_ds) // cfg.batch_size)
    assert calls["valid_batches"] < n_valid_batches, "valid pass drained fully"
    assert calls["valid_batches"] <= 2 + cfg.prefetch_depth
    step = int(tr.state.step)
    tr2, _, _ = _make_trainer(cfg)  # the epoch-boundary checkpoint is durable
    assert tr2.epoch == 0 and int(tr2.state.step) == step


def test_masked_opt_state_checkpoint_roundtrip(tmp_path):
    """The frozen-BERT masked Adam state (MaskedNode placeholders) must
    survive an Orbax save/restore cycle bit-for-bit."""
    import optax
    import orbax.checkpoint as ocp

    _, _, state, fns, batch = _tiny_online_setup(finetune=False)
    new_state, _, _ = fns.train_step(state, batch, np.ones((4,), np.float32),
                                     M.init_state((1,)))
    payload = {"params": new_state.params, "opt_state": new_state.opt_state,
               "step": new_state.step}
    mgr = ocp.CheckpointManager(str(tmp_path))
    mgr.save(1, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, payload)
    restored = mgr.restore(1, args=ocp.args.StandardRestore(abstract))
    assert isinstance(restored["opt_state"].inner_state[0].mu["bert"], optax.MaskedNode)
    jax.tree.map(
        np.testing.assert_array_equal,
        jax.device_get(restored["opt_state"]), jax.device_get(new_state.opt_state))
    jax.tree.map(np.testing.assert_array_equal,
                 jax.device_get(restored["params"]), jax.device_get(new_state.params))


def test_dropout_active_in_training_only(tmp_path):
    """The reference trains in torch train mode with transformer_dropout=0.1
    (active for GHMFC's default multimodal config); our train path must be
    stochastic under different rng keys while eval stays deterministic."""
    from drin_tpu.data.synthetic import make_synthetic_store, tiny_config
    from drin_tpu.models import get_model

    cfg = tiny_config("wikidiverse", "ghmfc", preprocess_dir=str(tmp_path))
    assert cfg.mention_final_layer_name == "multimodal"
    assert cfg.transformer_dropout > 0
    make_synthetic_store(cfg, n_mentions=6, seed=4)
    model, kind = get_model(cfg)
    from drin_tpu.data.dataset import create_datasets

    _, _, test_ds = create_datasets(cfg)
    batch = next(test_ds.batches(4, kind=kind, pad_to_full=True))
    feats = tuple(np.asarray(x) for x in batch[:-1])
    params = model.init(jax.random.key(0), feats)["params"]

    s1 = np.asarray(model.apply({"params": params}, feats, deterministic=False,
                                rngs={"dropout": jax.random.key(1)}))
    s2 = np.asarray(model.apply({"params": params}, feats, deterministic=False,
                                rngs={"dropout": jax.random.key(2)}))
    assert not np.allclose(s1, s2), "dropout had no effect on the train forward"
    d1 = np.asarray(model.apply({"params": params}, feats))
    d2 = np.asarray(model.apply({"params": params}, feats))
    np.testing.assert_array_equal(d1, d2)


def test_restore_rejects_path_like_resume_from():
    """resume_from takes a STEP number; a path-like value must fail with an
    error naming the contract, not int()'s bare 'invalid literal'."""
    class _Mgr:
        def wait_until_finished(self):
            pass

        def latest_step(self):
            return None

    t = Trainer.__new__(Trainer)
    t._ckpt_mgr = _Mgr()
    with pytest.raises(ValueError, match="STEP number"):
        t.restore("checkpoints/2000")
    # no step and no checkpoints yet: restore is a no-op, not an error
    assert t.restore(None) is None


def test_restore_without_checkpointing_raises_named_error():
    """restore() on a Trainer built with enable_checkpointing=false must
    fail with an error naming the missing config knob, not an
    AttributeError off the None manager (review finding; save() silently
    no-ops by design, but restoring from nowhere is a caller error)."""
    t = Trainer.__new__(Trainer)
    t._ckpt_mgr = None
    with pytest.raises(RuntimeError, match="enable_checkpointing"):
        t.restore(2000)
    with pytest.raises(RuntimeError, match="enable_checkpointing"):
        t.restore(None)
