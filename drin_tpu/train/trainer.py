# -*- coding: utf-8 -*-
"""Train/eval harness: jitted SPMD steps + the reference's epoch schedule.

Replaces the reference's Lightning harness (``train.py:20-122``) with a
functional JAX design:

  * one jitted ``train_step``/``eval_step`` holding model forward, triplet
    loss, Adam update and metric-counter accumulation — a single XLA program
    per step (the reference dispatches each module eagerly),
  * batch tensors sharded over a (data, model) mesh (SURVEY §2.11: new
    capability; the reference pins ``devices=1``),
  * metric counters live on-device and are summed once per epoch,
  * Orbax checkpointing behind ``cfg.enable_checkpointing`` (the reference
    disables checkpointing entirely, train.py:115),
  * ``jax.profiler`` traces behind ``cfg.profiling`` (the reference uses
    torch.profiler with the same flag-gating, train.py:64-70).
"""

from __future__ import annotations

import datetime
import os
import sys
import threading
import time
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from drin_tpu.common.config import Config
from drin_tpu.parallel import mesh as pmesh
from drin_tpu.train import metrics as M
from drin_tpu.train.loss import triplet_loss


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def create_train_state(params, cfg: Config) -> tuple[TrainState, optax.GradientTransformation]:
    # plain Adam, torch-default betas/eps (reference train.py:55-56)
    tx = optax.adam(cfg.learning_rate)
    if not cfg.finetune_bert and isinstance(params, dict) and "bert" in params:
        # Frozen in-forward BERT (online path, models/ghmfc.GHMFCOnline):
        # exclude its subtree from Adam so no moment buffers are allocated
        # and no zero-updates are applied for its ~110M params.  Matches the
        # reference, where torch Adam skips requires_grad=False params
        # (ghmfc.py:16-17); grads for the subtree are exact zeros via
        # stop_gradient either way.
        tx = optax.masked(tx, {k: k != "bert" for k in params})
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)), tx


class StepFns(NamedTuple):
    train_step: Callable
    eval_step: Callable
    batch_shardings: Optional[tuple]
    valid_sharding: Optional[Any]
    replicated: Optional[Any]


def build_step_fns(apply_fn: Callable, cfg: Config, tx: optax.GradientTransformation,
                   mesh=None, batch_fields: Optional[tuple] = None,
                   example_batch: Optional[tuple] = None,
                   feats_fn: Optional[Callable] = None,
                   train_apply_fn: Optional[Callable] = None) -> StepFns:
    """Compile-ready step functions.

    ``apply_fn(params, feats) -> scores [B, C]``.  Steps take the full batch
    tuple (answer last, reference contract train.py:32-33) plus a [B] valid
    mask for static-shape ragged batches.  ``feats_fn`` maps the raw batch
    features to model features inside jit (e.g. the device-resident entity
    table gather, data/device_store.py).  When ``feats_fn`` exposes a
    ``.tables`` pytree (device-resident entity tables), those arrays are
    passed through the jit boundary as call arguments — closing over them
    would embed the (possibly multi-GB) tables in the lowered program as
    constants, which hangs compilation at production table sizes.
    """
    topk = tuple(cfg.metrics_topk)
    compute_dtype = jnp.dtype(cfg.compute_dtype)
    tables = getattr(feats_fn, "tables", None)

    def loss_and_metrics(params, batch, valid, mstate, tbl, rng=None):
        feats, answer = batch[:-1], batch[-1]
        if feats_fn is not None:
            feats = feats_fn(feats) if tbl is None else feats_fn(feats, tbl)
        # train path with dropout: the reference trains in torch train mode
        # (transformer_dropout=0.1 active for the multimodal/transformer
        # configs); eval stays deterministic
        fwd = apply_fn if rng is None else (lambda p, f: train_apply_fn(p, f, rng))
        if compute_dtype != jnp.float32:
            # mixed precision: f32 master params + bf16 model body; the
            # casts are differentiable so grads/optimizer stay f32
            cast = lambda x: x.astype(compute_dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x
            feats = tuple(cast(x) for x in feats)
            scores = fwd(jax.tree.map(cast, params), feats).astype(jnp.float32)
        else:
            scores = fwd(params, feats)
        loss = triplet_loss(answer, scores, cfg.triplet_margin, valid)
        mstate = M.add_loss(M.update(mstate, scores, answer, topk, valid), loss)
        return loss, (mstate, scores)

    def train_step(state: TrainState, batch, valid, mstate, tbl):
        rng = (jax.random.fold_in(jax.random.key(cfg.seed), state.step)
               if train_apply_fn is not None else None)
        (loss, (mstate, _)), grads = jax.value_and_grad(loss_and_metrics, has_aux=True)(
            state.params, batch, valid, mstate, tbl, rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss, mstate

    def eval_step(params, batch, valid, mstate, tbl):
        # also returns the raw [B, C] score matrix so the test-result dump
        # (reference train.py:40-43) shares this one compiled program
        loss, (mstate, scores) = loss_and_metrics(params, batch, valid, mstate, tbl)
        return loss, mstate, scores

    def bind_tables(jitted):
        # the caller-facing steps keep the 4-arg signature; tables ride as a
        # hidden trailing argument so they stay jit *parameters*
        fn = lambda *args: jitted(*args, tables)
        fn.lower = lambda *args: jitted.lower(*args, tables)
        return fn

    if mesh is None:
        return StepFns(
            bind_tables(jax.jit(train_step, donate_argnums=(0, 3))),
            bind_tables(jax.jit(eval_step, donate_argnums=(3,))),
            None, None, None,
        )

    from jax.sharding import NamedSharding, PartitionSpec as P

    assert batch_fields is not None and example_batch is not None
    bspecs = pmesh.batch_shardings(mesh, batch_fields, example_batch)
    rep = pmesh.replicated(mesh)
    vshard = NamedSharding(mesh, P(pmesh.DATA_AXIS))
    # tables keep whatever layout the store put them in (replicated or
    # row-sharded over the model axis)
    tbl_shardings = jax.tree.map(lambda a: a.sharding, tables)
    # multi-process: the dump path fetches scores on every host, so they must
    # come back replicated (a batch-sharded array is not fully addressable)
    score_shard = rep if jax.process_count() > 1 else vshard
    train_jit = jax.jit(
        train_step,
        in_shardings=(rep, bspecs, vshard, rep, tbl_shardings),
        out_shardings=(rep, rep, rep),
        donate_argnums=(0, 3),
    )
    eval_jit = jax.jit(
        eval_step,
        in_shardings=(rep, bspecs, vshard, rep, tbl_shardings),
        out_shardings=(rep, rep, score_shard),
        donate_argnums=(3,),
    )
    return StepFns(bind_tables(train_jit), bind_tables(eval_jit), bspecs, vshard, rep)


# ---------------------------------------------------------------------------


def _now() -> str:
    return datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S")


class WindowedProfiler:
    """Step-windowed ``jax.profiler`` traces, mirroring the reference's
    torch.profiler schedule(wait=1, warmup=1, active=3, repeat=2) stepped
    once per train batch (reference train.py:64-70, :101-109).  Each cycle
    skips ``wait + warmup`` steps, traces ``active`` steps into its own
    ``cycle{n}`` subdirectory, and the schedule ends after ``repeat`` cycles
    — so a num_epoch=30 fit produces a handful of small usable traces, not
    one multi-gigabyte whole-fit dump.  ``active == 0`` or ``repeat == 0``
    falls back to tracing the entire fit."""

    def __init__(self, cfg: Config):
        self.dir = cfg.profile_dir
        os.makedirs(self.dir, exist_ok=True)
        self.skip = max(cfg.profile_wait, 0) + max(cfg.profile_warmup, 0)
        self.active = cfg.profile_active
        self.repeat = cfg.profile_repeat
        self.windowed = self.active > 0 and self.repeat > 0
        self.pos = 0
        self.cycles = 0
        self.tracing = False
        if not self.windowed:
            jax.profiler.start_trace(self.dir)
            self.tracing = True

    def before_step(self):
        if not self.windowed or self.tracing or self.cycles >= self.repeat:
            return
        if self.pos >= self.skip:
            jax.profiler.start_trace(os.path.join(self.dir, f"cycle{self.cycles}"))
            self.tracing = True

    def after_step(self):
        if not self.windowed:
            return
        self.pos += 1
        if self.tracing and self.pos >= self.skip + self.active:
            jax.profiler.stop_trace()
            self.tracing = False
            self.cycles += 1
            self.pos = 0

    def begin_fit(self):
        """Re-entry for the next fit chunk: the instance persists across
        chunks so cycle numbering continues and ``repeat`` bounds the TOTAL
        trace count for the run (not per chunk); whole-fit mode restarts
        its trace for the new chunk."""
        if not self.windowed and not self.tracing:
            jax.profiler.start_trace(self.dir)
            self.tracing = True

    def stop(self):
        if self.tracing:
            jax.profiler.stop_trace()
            self.tracing = False
            if self.windowed:
                # a chunk ending mid-active-window finalizes that cycle: the
                # partial trace counts toward `repeat` and the next chunk
                # starts a fresh wait/warmup into its own cycle dir (never a
                # second dump into the same cycle{n})
                self.cycles += 1
                self.pos = 0


class Trainer:
    """Epoch-loop harness with the reference's logging/eval protocol."""

    SPLITS = ("train", "valid", "test")

    def __init__(self, cfg: Config, apply_fn: Callable, params, mesh=None,
                 batch_fields: Optional[tuple] = None, example_batch: Optional[tuple] = None,
                 feats_fn: Optional[Callable] = None, log=print,
                 output_test_result_path: str = "test-result.txt",
                 train_apply_fn: Optional[Callable] = None):
        self.cfg = cfg
        self.apply_fn = apply_fn
        self.feats_fn = feats_fn
        self.mesh = mesh
        self._is_main = jax.process_index() == 0
        self.log = log if self._is_main else (lambda *a, **k: None)
        # candidate padding: when C doesn't divide the model axis (WikiMEL's
        # C=101 is prime) pad the candidate dim so entity tensors CAN shard;
        # the models mask the fakes and slice scores back (mesh.pad_candidates_to)
        self._fields = batch_fields
        self._cand_pad = None
        if mesh is not None and batch_fields is not None:
            nm = mesh.shape[pmesh.MODEL_AXIS]
            C = cfg.num_candidates_model
            cp = pmesh.padded_candidate_count(C, nm)
            if nm > 1 and cp != C:
                self._cand_pad = (C, cp)
                example_batch = pmesh.pad_candidates_to(example_batch, batch_fields, C, cp)
                self.log(f"candidate dim padded {C} -> {cp} to shard over the "
                         f"{nm}-way model axis")
        state, tx = create_train_state(params, cfg)
        self.state = state
        self._tx = tx
        self.fns = build_step_fns(apply_fn, cfg, tx, mesh, batch_fields, example_batch,
                                  feats_fn, train_apply_fn)
        self.epoch = 0
        # multi-process SPMD: every host runs this same loop; each assembles
        # only the global-batch rows its devices own (parallel/distributed.py)
        self._proc_rows = None
        if mesh is not None and jax.process_count() > 1:
            from drin_tpu.parallel import distributed as dist

            self._proc_rows = dist.process_row_range(self.fns.valid_sharding, cfg.batch_size)
        self._ckpt_mgr = None
        self._profiler = None
        self._interrupted = {}  # set by fit()'s signal handler
        self._test_result_path = output_test_result_path
        if cfg.enable_checkpointing:
            import orbax.checkpoint as ocp

            self._ckpt_mgr = ocp.CheckpointManager(
                os.path.abspath(cfg.checkpoint_dir),
                options=ocp.CheckpointManagerOptions(max_to_keep=cfg.keep_checkpoints),
            )
            if cfg.resume_from is not None or self._ckpt_mgr.latest_step() is not None:
                self.restore(cfg.resume_from)

    # -- checkpointing (new capability; reference train.py:115 disables) ---
    def save(self, wait: bool = True):
        """Checkpoint the train state, keyed by global step.

        ``wait=False`` returns as soon as Orbax has snapshotted the arrays
        off the device (safe against the next step's donation) and writes
        the disk bytes in the background — fit()'s per-epoch saves use
        this so the next epoch's compute hides the write latency, and
        fit() waits once at exit (and immediately on preemption) so a
        returned fit is always durable.  The default stays synchronous for
        direct callers."""
        if self._ckpt_mgr is None:
            return
        import orbax.checkpoint as ocp

        payload = {"params": self.state.params, "opt_state": self.state.opt_state,
                   "step": self.state.step, "epoch": np.int32(self.epoch)}
        self._ckpt_mgr.save(int(self.state.step), args=ocp.args.StandardSave(payload))
        if wait:
            self._ckpt_mgr.wait_until_finished()

    def restore(self, step: Optional[int] = None):
        import orbax.checkpoint as ocp

        if self._ckpt_mgr is None:
            raise RuntimeError(
                "restore() needs checkpointing: construct the Trainer with "
                "enable_checkpointing=true (save() silently no-ops without "
                "it, but restoring from nowhere is always a caller error)")
        # an async save from THIS manager may still be in flight
        self._ckpt_mgr.wait_until_finished()
        if step is not None:
            try:
                step = int(step)
            except (TypeError, ValueError):
                raise ValueError(
                    "resume_from takes the checkpoint STEP number (e.g. "
                    "resume_from=2000; checkpoints are keyed by global "
                    f"step under checkpoint_dir), not a path: got {step!r}"
                ) from None
        else:
            step = self._ckpt_mgr.latest_step()
        if step is None:
            return
        abstract = {
            "params": jax.tree.map(ocp.utils.to_shape_dtype_struct, self.state.params),
            "opt_state": jax.tree.map(ocp.utils.to_shape_dtype_struct, self.state.opt_state),
            "step": jax.ShapeDtypeStruct((), jnp.int32),
            "epoch": jax.ShapeDtypeStruct((), jnp.int32),
        }
        restored = self._ckpt_mgr.restore(step, args=ocp.args.StandardRestore(abstract))
        self.state = TrainState(restored["params"], restored["opt_state"], restored["step"])
        self.epoch = int(restored["epoch"])
        self.log(f"resumed from checkpoint step={step} epoch={self.epoch}")

    # ------------------------------------------------------------------
    def _put(self, batch, valid):
        """Host batch (this process's rows) -> device arrays for the step."""
        if self.mesh is None:
            return tuple(jnp.asarray(np.asarray(x)) for x in batch), jnp.asarray(valid)
        if self._proc_rows is not None:
            from drin_tpu.parallel import distributed as dist

            B = self.cfg.batch_size
            put = dist.put_global_batch(batch, self.fns.batch_shardings, B)
            (vput,) = dist.put_global_batch([valid], (self.fns.valid_sharding,), B)
            return put, vput
        put = pmesh.put_batch(batch, self.fns.batch_shardings)
        return put, jax.device_put(valid, self.fns.valid_sharding)

    def _index_batches(self, n: int, shuffle: bool, seed: int):
        """Global batch indices + valid mask, identical on every process
        (same seed -> same permutation); ragged tails repeat the tail's
        first index so shapes stay static for jit."""
        B = self.cfg.batch_size
        order = np.random.default_rng(seed).permutation(n) if shuffle else np.arange(n)
        for i in range(0, n, B):
            idx = order[i : i + B]
            valid = np.zeros((B,), np.float32)
            valid[: len(idx)] = 1.0
            if len(idx) < B:
                idx = np.concatenate([idx, np.broadcast_to(idx[:1], (B - len(idx),))])
            yield idx, valid

    def _assemble(self, dataset, kind: str, idx: np.ndarray, valid: np.ndarray):
        rs, re = self._proc_rows or (0, self.cfg.batch_size)
        if getattr(dataset, "accepts_bucket_idx", False):
            # online datasets derive the length-bucket shape from the GLOBAL
            # batch indices so every process trims to the same shape
            batch = dataset.make_batch(idx[rs:re], kind, bucket_idx=idx)
        else:
            batch = dataset.make_batch(idx[rs:re], kind)
        if self._cand_pad is not None:
            batch = pmesh.pad_candidates_to(batch, self._fields, *self._cand_pad)
        return self._put(batch, valid[rs:re] if self._proc_rows is not None else valid)

    def _run_epoch(self, dataset, split: str, train: bool, kind: str):
        cfg = self.cfg
        split_i = self.SPLITS.index(split)
        correction = cfg.acc_correction[split_i]
        mstate = M.init_state(cfg.metrics_topk)
        if self.mesh is not None:
            mstate = jax.device_put(mstate, self.fns.replicated)
        self.log(f"{_now()} {split} epoch {self.epoch} start")
        n_batches = 0
        t0 = time.time()
        shuffle = train and cfg.shuffle_train_data and not cfg.debug
        from drin_tpu.data.prefetch import Prefetcher

        def assemble(args):
            return self._assemble(dataset, kind, *args)

        source = self._index_batches(len(dataset), shuffle, cfg.seed + self.epoch)
        # The running loss rides inside the donated on-device metric state;
        # the loop never blocks on a per-step host fetch — the only syncs are
        # the status-line refreshes every ``log_interval_steps``.
        log_every = 1 if cfg.debug else max(cfg.log_interval_steps, 1)
        profiler = self._profiler if train else None
        # context manager: an exception in the step (or an early break on
        # preemption) closes the worker thread and releases its queued
        # device-resident batches instead of leaking them for the process
        # lifetime (prefetch.Prefetcher.close)
        with Prefetcher(source, assemble, depth=cfg.prefetch_depth) as pf:
            for batch, valid in pf:
                if train:
                    if profiler is not None:
                        profiler.before_step()
                    self.state, _, mstate = self.fns.train_step(self.state, batch, valid, mstate)
                    if profiler is not None:
                        profiler.after_step()
                    if self._interrupted:
                        # preemption grace windows are seconds — stop at the
                        # STEP boundary; fit() saves immediately after
                        break
                else:
                    _, mstate, _ = self.fns.eval_step(self.state.params, batch, valid, mstate)
                    if self._interrupted:
                        # a signal during the (uninterruptible-per-step) valid
                        # pass must not wait for the NEXT train epoch: stop at
                        # this eval-step boundary too; fit() saves right after
                        break
                n_batches += 1
                if n_batches % log_every == 0 and self._is_main:
                    m = jax.device_get(mstate)
                    accs = M.compute(m, cfg.metrics_topk, correction)
                    acc_str = ", ".join(f"top{k}: {float(v):.4f}" for k, v in accs.items())
                    print(f"\r{split} loss: {float(M.mean_loss(m)):.4f}, {acc_str}",
                          end="", file=sys.stderr, flush=True)
        return self._finalize_epoch(mstate, split, time.time() - t0)

    def _finalize_epoch(self, mstate, split: str, dt: float):
        cfg = self.cfg
        correction = cfg.acc_correction[self.SPLITS.index(split)]
        mstate = jax.device_get(mstate)
        accs = {k: float(v) for k, v in M.compute(mstate, cfg.metrics_topk, correction).items()}
        total = float(mstate["total"])
        mean_loss = float(M.mean_loss(mstate))
        pairs_per_sec = total * cfg.num_candidates_model / max(dt, 1e-9)
        if self._is_main:
            print("", file=sys.stderr)
        acc_str = ", ".join(f"top{k}: {v:.4f}" for k, v in accs.items())
        self.log(
            f"{_now()} {split} epoch {self.epoch} done: loss {mean_loss:.4f}, "
            f"{acc_str} ({total:.0f} mentions, {pairs_per_sec:,.0f} pairs/s)"
        )
        return {"loss": mean_loss, "accs": accs, "pairs_per_sec": pairs_per_sec}

    def fit(self, train_ds, valid_ds, num_epochs: int, kind: str = "drin"):
        """One fit chunk: ``num_epochs`` epochs of train+valid (reference
        create_trainer, train.py:112-122).

        Preemption safety (new capability; the reference has no failure
        handling, SURVEY §5.3): with checkpointing enabled, SIGTERM/SIGINT
        during fit stops at the next train STEP boundary and checkpoints
        immediately before re-raising — epoch-scale waits would outlive a
        TPU-VM preemption grace window.  The save keys by global step, and
        restore re-runs the interrupted epoch from its start with the saved
        mid-epoch weights (epoch-granular data order, step-granular
        progress)."""
        import signal

        cfg = self.cfg
        results = []
        if cfg.reset_optimizer_per_fit:
            # reference semantics: a fresh Lightning Trainer per chunk
            # re-runs configure_optimizers at every fit (train.py:55-56,
            # :141-144), restarting Adam's moments/step count each chunk
            opt_state = self._tx.init(self.state.params)
            if self.mesh is not None:
                opt_state = jax.device_put(opt_state, self.fns.replicated)
            self.state = TrainState(self.state.params, opt_state, self.state.step)
        if cfg.profiling and self._is_main:
            # one profiler for the whole run: windowed cycles continue across
            # fit chunks instead of rewriting cycle0 every chunk
            if self._profiler is None:
                self._profiler = WindowedProfiler(cfg)
            else:
                self._profiler.begin_fit()

        interrupted = self._interrupted = {}
        prev_handlers = {}

        def _on_signal(signum, frame):
            interrupted["signum"] = signum

        in_main = threading.current_thread() is threading.main_thread()
        if self._ckpt_mgr is not None and in_main:
            for sig in (signal.SIGTERM, signal.SIGINT):
                prev_handlers[sig] = signal.signal(sig, _on_signal)
        try:
            for _ in range(num_epochs):
                self._run_epoch(train_ds, "train", True, kind)
                if interrupted:
                    # _run_epoch broke at the step boundary; save NOW (the
                    # save keys by global step, so the mid-epoch state gets
                    # its own checkpoint) and stop before the valid pass
                    self.save()
                    self.log(f"signal {interrupted['signum']} received: "
                             f"checkpoint saved at step {int(self.state.step)}"
                             f" (epoch {self.epoch}), stopping")
                    raise KeyboardInterrupt
                results.append(self._run_epoch(valid_ds, "valid", False, kind))
                if interrupted:
                    # signal landed during the valid pass — train state is at
                    # the epoch boundary; save and stop within one eval step
                    # of the signal instead of riding out another train epoch
                    self.save()
                    self.log(f"signal {interrupted['signum']} received during "
                             f"validation: checkpoint saved at step "
                             f"{int(self.state.step)} (epoch {self.epoch}), stopping")
                    raise KeyboardInterrupt
                self.epoch += 1
                # async: the next epoch's compute overlaps the disk write
                self.save(wait=False)
        finally:
            self._interrupted = {}
            for sig, h in prev_handlers.items():
                signal.signal(sig, h)
            if self._ckpt_mgr is not None:
                # a returned (or raising) fit leaves every save durable
                self._ckpt_mgr.wait_until_finished()
            if self._profiler is not None:
                self._profiler.stop()  # instance kept: cycles span chunks
        return results

    def test(self, test_ds, kind: str = "drin"):
        if self.cfg.output_test_result:
            return self._dump_test_results(test_ds, kind)
        return self._run_epoch(test_ds, "test", False, kind)

    def _dump_test_results(self, dataset, kind: str):
        """Single-pass test epoch that ALSO writes raw score vectors + labels
        (reference train.py:16-17,40-43) — the golden-output hook for parity
        diffing.  ``eval_step`` already returns both scores and metric state,
        so one pass over the split serves both the dump and the epoch
        metrics; it shares the compiled ``eval_step`` (mesh shardings, padded
        static-shape batches), adding no extra XLA programs."""
        cfg = self.cfg
        mstate = M.init_state(cfg.metrics_topk)
        if self.mesh is not None:
            mstate = jax.device_put(mstate, self.fns.replicated)
        self.log(f"{_now()} test epoch {self.epoch} start")
        t0 = time.time()
        f = open(self._test_result_path, "w") if self._is_main else None
        try:
            for idx, valid in self._index_batches(len(dataset), False, 0):
                put, vput = self._assemble(dataset, kind, idx, valid)
                _, mstate, scores = self.fns.eval_step(self.state.params, put, vput, mstate)
                if f is None:
                    continue
                b = int(valid.sum())
                scores = np.asarray(jax.device_get(scores))[:b]
                labels = dataset.labels(idx[:b])
                for row, lab in zip(scores, labels):
                    f.write(" ".join(f"{v:.6f}" for v in row) + f" | {lab}\n")
        finally:
            if f is not None:
                f.close()
        return self._finalize_epoch(mstate, "test", time.time() - t0)
