# -*- coding: utf-8 -*-
"""Serving: load a trained checkpoint and rank candidates for mention
batches — the deployment path the reference lacks entirely (SURVEY §0: no
serving, no checkpointing).

Two layers:

  * :class:`Ranker` — programmatic API.  Entity tables live in device HBM
    (bf16 by default); requests carry mention-side features plus candidate
    row indices; one jitted program scores and returns top-k.  A
    ``retrieve`` mode scores a mention representation against the FULL
    entity table (brute-force cosine over HBM, the stage-1 retrieval the
    reference folds into ``acc_correction`` instead of running).
  * :func:`serve_http` — a minimal stdlib JSON-over-HTTP wrapper for smoke
    deployments (POST /rank with base64 npz payloads).
"""

from __future__ import annotations

import base64
import io
import json
import os
import sys
import threading
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from drin_tpu.common.config import Config
from drin_tpu.data.device_store import DeviceEntityStore, include_for
from drin_tpu.models import get_model


def quantize_rows(t):
    """Per-row max-abs int8 quantization of a [N, D] table.

    Returns ``(q, scale)`` with ``q`` int8 and ``scale`` float32 [N, 1] such
    that ``q * scale ~= t``.  Zero rows get scale 1 so they dequantize to
    zero instead of NaN."""
    s = jnp.max(jnp.abs(t), axis=-1, keepdims=True).astype(jnp.float32)
    s = jnp.where(s == 0, 1.0, s)
    q = jnp.clip(jnp.round(t.astype(jnp.float32) / s * 127.0), -127, 127)
    return q.astype(jnp.int8), s / 127.0


def _shortlist(scores, kc):
    """Shortlist indices [B, kc] for the rescore pass.  ApproxTopK only
    pays off (and only has calibrated recall) at scale — below 4096
    columns the exact ``top_k`` is cheap and makes the shortlist a
    superset guarantee, so small tables keep exact retrieval semantics."""
    if scores.shape[-1] < 4096:
        return jax.lax.top_k(scores, kc)[1]
    return jax.lax.approx_max_k(scores, kc)[1]


def _rescore_topk(qn, table, cand, k):
    """Gather the shortlist rows and rescore them at full precision; the
    returned top-k scores/order are exact over the shortlist."""
    rows = jnp.take(table, cand, axis=0)          # [B, kc, D]
    exact = jnp.einsum("bd,bkd->bk", qn.astype(table.dtype), rows)
    s2, i2 = jax.lax.top_k(exact.astype(jnp.float32), k)
    return s2, jnp.take_along_axis(cand, i2, axis=1)


def retrieve_rescored(q, table, k, kc):
    """bf16 scan + ``approx_max_k`` shortlist + exact rescore (jit with
    static ``k``/``kc``).

    XLA's ApproxTopK custom call fuses the shortlist selection into the
    scan's output pass, eliminating the exact ``top_k``'s separate sweep
    over the [B, N] score matrix — measured 1.251 -> 0.928 ms for B=16
    over 109k entities (BASELINE.md).  Shortlist membership is approximate
    (recall_target 0.95 per element, and a true top-``k`` item is only
    lost if it misses the ``kc``-wide shortlist entirely); the final
    scores/order are exact over the shortlist."""
    qn = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    scores = qn.astype(table.dtype) @ table.T          # [B, N] bf16
    return _rescore_topk(qn, table, _shortlist(scores, kc), k)


def _normalize_quantize_query(qn):
    """Max-abs int8 quantization of row-normalized queries ``qn`` [B, D];
    returns ``(qq int8, qscale f32 [B, 1])`` with ``qq * qscale ~= qn``."""
    qs = jnp.max(jnp.abs(qn), axis=-1, keepdims=True)
    qs = jnp.where(qs == 0, 1.0, qs)
    qq = jnp.clip(jnp.round(qn / qs * 127.0), -127, 127).astype(jnp.int8)
    return qq, qs / 127.0


def _coarse_int8(qn, qt, scales):
    """int8 coarse scores [B, N] of row-normalized queries ``qn`` against
    the quantized table ``qt``/``scales`` (:func:`quantize_rows`).

    The int32 accumulation rides the MXU; the coarse comparison dtype is
    **bf16 on purpose** — the int8 quantization error (~1e-2 on unit
    vectors) dwarfs bf16 rounding, and non-bf16 ``top_k`` inputs cost 3x
    on the shortlist pass (BASELINE.md retrieval dead-ends)."""
    qq, qscale = _normalize_quantize_query(qn)
    acc = jax.lax.dot_general(qq, qt, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.bfloat16)
            * qscale.astype(jnp.bfloat16)
            * scales[:, 0][None, :].astype(jnp.bfloat16))


def retrieve_quantized(q, qt, scales, table, k, kc):
    """int8 coarse scan + ``approx_max_k`` shortlist + exact rescore (jit
    with static ``k``/``kc``).

    ``qt``/``scales`` from :func:`quantize_rows` over the row-normalized
    [N, D] retrieval table; ``table`` is that full-precision table.  The
    int8 [B, D] x [D, N] scan halves the HBM bytes of the bf16 scan (the
    memory lever: the resident retrieval table shrinks 2x); the coarse
    scores are compared in bf16 (their int8 error dwarfs bf16 rounding)
    so the shortlist selection rides the same fused ApproxTopK as
    :func:`retrieve_rescored`.  Final scores/order are exact over the
    shortlist."""
    qn = (q / jnp.linalg.norm(q, axis=-1, keepdims=True)).astype(jnp.float32)
    coarse = _coarse_int8(qn, qt, scales)
    return _rescore_topk(qn, table, _shortlist(coarse, kc), k)


RETRIEVE_AXIS = "retrieve"


class ShardedRetrieval:
    """Stage-1 retrieval over a row-sharded table on a 1-axis device mesh.

    Scale-out for entity tables beyond one chip's HBM (the serving analogue
    of the row-sharded train-step gather, data/device_store.py): each device
    scans only its own [N/n, D] row shard, shortlists locally, rescores its
    OWN full-precision rows and keeps a local top-k; one [n, B, k]
    all-gather merges the per-shard winners.  Activations ride ICI — the
    table never moves (HLO-guarded by
    tests/test_serve.py::test_sharded_retrieval_hlo_structure).

    Exactness: every true top-k row is by construction in its owning
    shard's local top-k, so whenever the per-shard shortlist is exact the
    merged result equals the single-device exact scan — tie-break
    included, because the merge concatenates shards in ascending-row order
    and ``top_k`` prefers the first occurrence.  ``exact=True`` pins a
    true per-shard ``top_k`` shortlist at ANY shard size (the mode's
    guarantee); otherwise shards below 4096 rows are exact anyway
    (serve._shortlist) and at scale each shard rides the same fused
    ApproxTopK shortlist + exact rescore as the single-chip modes.
    ``quantize=True`` additionally builds the per-shard int8 coarse-scan
    cache (:func:`quantize_rows` semantics).

    ``table`` is used as given (callers pass pre-normalized rows, matching
    ``Ranker._ensure_retrieval_table``); queries are normalized inside.
    Rows are zero-padded to an even split; padded rows are masked to -inf
    and can never surface."""

    def __init__(self, table, devices=None, quantize: bool = False):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        devices = list(devices if devices is not None else jax.devices())
        self.n = len(devices)
        self.mesh = Mesh(np.asarray(devices), (RETRIEVE_AXIS,))
        self._sharding = NamedSharding(self.mesh, P(RETRIEVE_AXIS))
        t = jnp.asarray(table)
        self.n_valid = int(t.shape[0])
        nl = -(-self.n_valid // self.n)
        pad = nl * self.n - self.n_valid
        if pad:
            t = jnp.concatenate([t, jnp.zeros((pad,) + t.shape[1:], t.dtype)])
        self.table = jax.device_put(t, self._sharding)
        self.quant = None
        if quantize:
            self.ensure_quant()
        self._fns: dict = {}

    def ensure_quant(self):
        """Build the row-sharded int8 cache (shard-local: quantize_rows is
        per-row, so XLA keeps the row sharding with zero communication)."""
        if self.quant is None:
            s = self._sharding
            self.quant = jax.jit(quantize_rows, out_shardings=(s, s))(self.table)

    def _build(self, k: int, kc: int, quantized: bool, exact_mode: bool):
        from jax.sharding import PartitionSpec as P

        n, n_valid = self.n, self.n_valid
        nl = self.table.shape[0] // n
        kl = min(kc, nl)          # per-shard shortlist width
        kk = min(k, kl)           # per-shard survivors into the merge
        padded = n * nl != n_valid

        def body(q, t, *qargs):
            me = jax.lax.axis_index(RETRIEVE_AXIS)
            base = me * nl
            qn = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
            if quantized:
                qt, scales = qargs
                coarse = _coarse_int8(qn, qt, scales)
            else:
                coarse = qn.astype(t.dtype) @ t.T          # [B, nl]
            if padded:  # mask the zero-padded tail rows of the last shard
                valid = (base + jnp.arange(nl))[None, :] < n_valid
                coarse = jnp.where(valid, coarse, -jnp.inf)
            # mode="exact" must keep its guarantee at ANY shard size:
            # _shortlist switches to approx_max_k above 4096 rows/shard, so
            # the exact path pins a true per-shard top_k instead (every true
            # global top-k row is in its owning shard's local top-kl)
            if exact_mode:
                cand = jax.lax.top_k(coarse, kl)[1]        # [B, kl] local rows
            else:
                cand = _shortlist(coarse, kl)              # [B, kl] local rows
            rows = jnp.take(t, cand, axis=0)               # shard-local gather
            exact = jnp.einsum("bd,bkd->bk", qn.astype(t.dtype),
                               rows).astype(jnp.float32)
            if padded:
                exact = jnp.where(base + cand < n_valid, exact, -jnp.inf)
            s, i = jax.lax.top_k(exact, kk)
            gi = jnp.take_along_axis(cand, i, axis=1) + base
            s_all = jax.lax.all_gather(s, RETRIEVE_AXIS)   # [n, B, kk]
            g_all = jax.lax.all_gather(gi, RETRIEVE_AXIS)
            b = q.shape[0]
            s2, j = jax.lax.top_k(
                jnp.moveaxis(s_all, 0, 1).reshape(b, n * kk), min(k, n * kk))
            return s2, jnp.take_along_axis(
                jnp.moveaxis(g_all, 0, 1).reshape(b, n * kk), j, axis=1)

        spec = (P(), P(RETRIEVE_AXIS))
        if quantized:
            spec += (P(RETRIEVE_AXIS), P(RETRIEVE_AXIS))
        # outputs are genuinely replicated (every rank computes the same
        # merge over the all-gathered [n, B, kk] winners) but the VMA
        # checker cannot infer replication through top_k — disable it
        return jax.jit(jax.shard_map(body, mesh=self.mesh, in_specs=spec,
                                     out_specs=(P(), P()), check_vma=False))

    def __call__(self, q, k: int, kc: int, quantized: bool = False,
                 exact: bool = False):
        if quantized:
            self.ensure_quant()
        key = (int(k), int(kc), bool(quantized), bool(exact))
        if key not in self._fns:
            self._fns[key] = self._build(*key)
        args = (jnp.asarray(q, jnp.float32), self.table)
        if quantized:
            args += self.quant
        return self._fns[key](*args)


class Ranker:
    """Checkpoint-backed mention-candidate ranking service."""

    def __init__(self, cfg: Config, params=None, entity_tables: Optional[dict] = None,
                 checkpoint_dir: Optional[str] = None, step: Optional[int] = None,
                 model=None, quantize_store: bool = False,
                 fused_gather: bool = False):
        self.cfg = cfg
        self.model, self.kind = get_model(cfg)
        if model is not None:  # caller-supplied module (e.g. custom bert_cfg)
            self.model = model
        if params is None:
            params = self._restore(checkpoint_dir or cfg.checkpoint_dir, step)
        dt = jnp.dtype(cfg.compute_dtype)
        cast = lambda x: x.astype(dt) if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else jnp.asarray(x)
        self.params = jax.device_put(jax.tree.map(cast, params))
        self.store = None
        self._feats_fn = None
        # the raw host tables are kept ONLY for DRIN's
        # precompute_entity_projection (it re-projects from them); on any
        # other kind holding them would pin multi-GB host arrays the store
        # already uploaded (or narrowed away) for the server's lifetime
        self._tables = entity_tables if self.kind == "drin" else None
        self._cast = cast
        if entity_tables is not None and cfg.entity_pooling_cached:
            # quantize_store: int8 rank tables, ~2x entities per chip;
            # scores tolerance-bounded (device_store.DeviceEntityStore).
            # fused_gather: serve the int8 tables through the Pallas
            # gather+dequant kernel (ops/pallas/gather.py) — one packed-row
            # DMA + in-VMEM dequant instead of XLA's two materializations
            # (DRIN three-table layout or the GHMFC text+image layout)
            if fused_gather and cfg.model_type not in ("drin", "ghmfc"):
                raise ValueError("fused_gather packs the DRIN or GHMFC "
                                 f"table layouts; model_type={cfg.model_type}"
                                 " uses the standard quantized store")
            # GHMFC's entity tower reads ONLY text: skip uploading the
            # image + object tables — ~900MB bf16 of HBM at the WikiMEL
            # serving scale the model would never touch (the one
            # serving/training-shared policy: device_store.include_for)
            include = include_for(self.kind)
            self.store = DeviceEntityStore(cfg, entity_tables, dtype=dt,
                                           quantize=quantize_store,
                                           fused_gather=fused_gather,
                                           include=include)
            # The online model tokenizes entity TEXT inside the forward
            # (models/ghmfc.GHMFCOnline); its requests carry OnlineBatch
            # token features, never precomputed-table row indices — a rows
            # feats_fn would make score() unpack the wrong tuple on every
            # request.  The store itself still serves MODEL-INDEPENDENT
            # stage-1 /retrieve (a raw pooled-text scan) and the
            # quantize/shard retrieval caches built on it.
            if not cfg.online_bert:
                self._feats_fn = (self.store.drin_feats_fn()
                                  if self.kind == "drin"
                                  else self.store.baseline_feats_fn())
        elif quantize_store or fused_gather:
            # fail loudly: an explicit int8/fused request that builds no
            # store would silently leave memory/latency expectations wrong
            raise ValueError(
                ("quantize_store" if quantize_store else "fused_gather")
                + "=True needs device entity tables "
                "(entity_tables with entity_pooling_cached); this "
                "configuration builds no rank-stage store")
        self._build_score_fns()

    def _build_score_fns(self):
        cast = self._cast
        feats_fn = self._feats_fn
        # device tables ride through jit as ARGUMENTS (feats_fn.tables);
        # closing over them would bake the multi-GB tables into the lowered
        # program as constants, which hangs compilation at real table sizes
        # (data/device_store.py docstring)
        tables = getattr(feats_fn, "tables", None)

        def score(params, feats, tbl):
            if feats_fn is not None:
                feats = tuple(cast(x) if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
                              else jnp.asarray(x) for x in feats)
                feats = feats_fn(feats) if tbl is None else feats_fn(feats, tbl)
            else:
                feats = tuple(cast(x) for x in feats)
            return self.model.apply({"params": params}, feats).astype(jnp.float32)

        score_jit = jax.jit(score)
        topk_jit = jax.jit(
            lambda params, feats, tbl, k: jax.lax.top_k(score(params, feats, tbl), k),
            static_argnums=3,
        )
        # a row-sharded store's in-step gather is a shard_map over the data
        # axis, which needs B % n_data == 0 — serving requests have
        # arbitrary B, so pad rows (repeats of row 0, always valid) up to
        # the axis multiple and slice the scores back
        from drin_tpu.parallel.mesh import DATA_AXIS

        nd = (self.store.mesh.shape[DATA_AXIS]
              if self.store is not None and self.store.sharded else 1)

        def pad(feats):
            b = int(np.asarray(feats[0]).shape[0])
            extra = -b % nd
            if not extra:
                return feats, b
            return tuple(
                jnp.concatenate([x, jnp.repeat(x[:1], extra, axis=0)])
                for x in map(jnp.asarray, feats)), b

        def _score_fn(params, feats):
            feats, b = pad(feats)
            return score_jit(params, feats, tables)[:b]

        def _topk_fn(params, feats, k):
            feats, b = pad(feats)
            s, i = topk_jit(params, feats, tables, k)
            return s[:b], i[:b]

        self._score = _score_fn
        self._topk = _topk_fn

    def set_store(self, store, entity_tables: Optional[dict] = None):
        """Swap in a different DeviceEntityStore and rebuild the jitted
        scoring fns.  Required after any table change: the tables are bound
        into ``_score``/``_topk`` at build time (as call arguments), so
        mutating ``self.store`` alone would silently keep scoring against
        the old tables.

        Every fast-path cache derived from the OLD store is invalidated too:
        ``_entity_reprs``/``_rank_rows`` (precompute_entity_reprs) and the
        retrieval cache are dropped so stale callers fail loudly or
        recompute, and ``self._tables`` — the raw host tables that
        ``precompute_entity_projection`` projects — is replaced by
        ``entity_tables`` (or None, making a later projection call fail
        loudly rather than silently projecting the old tables)."""
        self.store = store
        # online models take token features, never rows (see __init__)
        self._feats_fn = (None if self.cfg.online_bert
                          else store.drin_feats_fn() if self.kind == "drin"
                          else store.baseline_feats_fn())
        # DRIN-only retention, as in __init__ (projection source)
        self._tables = entity_tables if self.kind == "drin" else None
        self._retrieval_table = None
        self._retrieve_jit = None
        self._retrieval_q = None
        self._sharded = None
        self._entity_reprs = None
        self._rank_rows = None
        self._build_score_fns()

    def precompute_entity_projection(self):
        """DRIN serving fast path: project the frozen entity tables through
        the trained entity-side linears ONCE (device_store.
        project_drin_tables — exact math, equivalence-tested) and re-jit
        scoring with ``entity_projected=True``, dropping the two heaviest
        entity matmuls from every request."""
        from drin_tpu.data.device_store import project_drin_tables

        assert self.cfg.model_type == "drin" and self._tables is not None, (
            "projection is the DRIN fast path and needs entity tables")
        if self.cfg.entity_projected:
            # idempotent: a projected bundle redeployed with the same
            # ``project_entities=true`` flag (the natural redeploy command)
            # must not push the already-projected tables through the entity
            # linears a second time — slot 0 would be double-projected and
            # the [N, gcn_embed_dim] image table no longer matches
            # entity_image_linear's input width
            return
        proj = project_drin_tables(self.cfg, self._tables, jax.device_get(self.params))
        dt = jnp.dtype(self.cfg.compute_dtype)
        self.cfg = self.cfg.replace(entity_projected=True)
        self.model, _ = get_model(self.cfg)
        # the rebuilt store keeps the old one's quantization: an operator who
        # sized the deployment for int8 tables must not silently get a
        # full-precision (2x resident bytes) store out of the projection
        self.store = DeviceEntityStore(self.cfg, proj, dtype=dt,
                                       quantize=self.store is not None
                                       and self.store.quantized,
                                       fused_gather=self.store is not None
                                       and self.store.fused)
        self._feats_fn = self.store.drin_feats_fn()
        self._retrieval_table = None  # rebuild retrieval cache in model space
        self._retrieval_q = None
        self._sharded = None
        self._build_score_fns()

    def _restore(self, checkpoint_dir: str, step: Optional[int]):
        import orbax.checkpoint as ocp

        mgr = ocp.CheckpointManager(os.path.abspath(checkpoint_dir))
        step = step if step is not None else mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {checkpoint_dir}")
        restored = mgr.restore(step)
        return restored["params"]

    # ------------------------------------------------------------------
    def score(self, feats) -> np.ndarray:
        """Raw candidate scores [B, C] for a feature tuple (model batch
        without the answer; rows-batch features when entity tables are
        device-resident)."""
        return np.asarray(self._score(self.params, tuple(feats)))

    def rank(self, feats, k: int = 5):
        """(top-k scores, top-k candidate indices) per mention."""
        scores, idx = self._topk(self.params, tuple(feats), k)
        return np.asarray(scores), np.asarray(idx)

    def precompute_entity_reprs(self, chunk: int = 8192) -> np.ndarray:
        """GHMFC serving fast path: the entity tower is mention-independent
        (EntityEncoder consumes only entity features, ghmfc.py:202-251), so
        at serving time — weights frozen — the whole global table can be
        encoded ONCE into [N, D] model-space representations.  Per-request
        cost then drops to mention encoding + a gather + cosine
        (``rank_rows``), and stage-1 ``retrieve`` runs in the trained model
        space instead of raw pooled-feature space."""
        from drin_tpu.models.ghmfc import EntityEncoder, MentionEncoder

        assert self.store is not None, "needs device entity tables"
        assert self.cfg.model_type == "ghmfc", "entity precompute is the GHMFC fast path"
        if self.cfg.online_bert:
            raise NotImplementedError(
                "entity precompute is the OFFLINE GHMFC fast path: the "
                "online model has no standalone entity_encoder params to "
                "encode the table with (it tokenizes entity text per "
                "request)")
        enc = EntityEncoder(self.cfg)
        # params ride through jit as ARGUMENTS like the entity tables
        # (_build_score_fns): closing over them would bake the encoder
        # weights into the lowered program as constants — the exact
        # remote-compile hazard the pass-tables-as-arguments contract exists
        # to avoid (data/device_store.py docstring)
        ep = {"params": self.params["entity_encoder"]}
        # n_rows, not text.shape[0]: a fused store keeps no per-table copy
        n = self.store.n_rows
        fn = jax.jit(lambda p, t, i: enc.apply(p, t[None], None, i[None])[0])
        has_img = "image" in self.store.include
        dt = jnp.dtype(self.cfg.compute_dtype)
        out = []
        for i in range(0, n, chunk):
            # dequantize per chunk (float_rows): a whole-table float view of
            # an int8-capacity store would transiently double resident HBM.
            # EntityEncoder never reads its entity_image slot (no image
            # branch, ghmfc.py:202-251): a text-only store passes zeros
            rows = self.store.float_rows("text", i, i + chunk)
            img = (self.store.float_rows("image", i, i + chunk) if has_img
                   else jnp.zeros((rows.shape[0], 1), dt))
            out.append(np.asarray(fn(ep, rows, img)))
        self._entity_reprs = jax.device_put(jnp.concatenate([jnp.asarray(o) for o in out]))
        self._retrieval_table = None  # rebuild retrieval cache in model space
        self._retrieval_q = None
        self._sharded = None

        menc = MentionEncoder(self.cfg)
        mp = {"params": self.params["mention_encoder"]}
        reprs = self._entity_reprs

        def rank_rows(params, mention_feats, rows, table, k):
            from drin_tpu.ops.core import cosine_similarity

            m = menc.apply(params, *mention_feats)  # [B, D]
            e = table[rows]  # [B, C, D]
            scores = cosine_similarity(jnp.broadcast_to(m[:, None, :], e.shape), e)
            return jax.lax.top_k(scores, k)

        # reprs AND the mention-encoder params pass as arguments, not
        # closure constants (see _build_score_fns)
        rr_jit = jax.jit(rank_rows, static_argnums=4)
        self._rank_rows = lambda mention_feats, rows, k: rr_jit(
            mp, mention_feats, rows, reprs, k)
        return np.asarray(self._entity_reprs)

    def rank_rows(self, mention_feats, rows: np.ndarray, k: int = 5):
        """(top-k scores, candidate indices) using the precomputed entity
        representations — call :meth:`precompute_entity_reprs` first."""
        assert getattr(self, "_rank_rows", None) is not None, \
            "call precompute_entity_reprs() first"
        dt = jnp.dtype(self.cfg.compute_dtype)
        cast = lambda x: (jnp.asarray(x, dt)
                          if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
                          else jnp.asarray(x))
        scores, idx = self._rank_rows(tuple(cast(x) for x in mention_feats),
                                      jnp.asarray(rows), k)
        return np.asarray(scores), np.asarray(idx)

    def rank_text(self, sentences, char_spans, candidate_texts, k: int = 5,
                  mention_images=None, tokenizer=None):
        """Raw-text ranking for the online model: sentences + character
        mention spans + per-mention candidate strings -> (top-k scores,
        candidate indices).  Tokenization and span conversion happen here
        (data/online.assemble_online_feats); requires ``cfg.online_bert``."""
        assert self.cfg.online_bert, "rank_text needs the online-BERT model"
        from drin_tpu.data.online import assemble_online_feats

        if tokenizer is None:
            tokenizer = self._ensure_tokenizer()
        feats = assemble_online_feats(self.cfg, tokenizer, sentences, char_spans,
                                      candidate_texts, mention_images)
        return self.rank(feats, k)

    def _ensure_tokenizer(self):
        if getattr(self, "_tokenizer", None) is None:
            from drin_tpu.text.wordpiece import BertTokenizer

            self._tokenizer = BertTokenizer(
                vocab_file=self.cfg.bert_vocab, do_lower_case=False,
                model_max_length=self.cfg.max_bert_len)
        return self._tokenizer

    def _retrieval_source(self):
        """The [N, D] vectors stage-1 retrieval scans (selection order:
        trained model-space reprs > raw CLS slot of a projected store >
        raw pooled text).

        Sliced to the store's UNPADDED row count: a row-sharded store pads
        its row axis with zeros (device_store.put), and a zero row would
        normalize to NaN — which the TPU backend's ``top_k`` sorts FIRST,
        so every query would return the out-of-range pad index at rank 0
        (the CPU test mesh sorts NaN last and cannot catch this)."""
        n = self.store.n_rows
        # prefer trained model-space reprs when precomputed (GHMFC)
        reprs = getattr(self, "_entity_reprs", None)
        if reprs is not None:
            return reprs[:n]
        if self.cfg.entity_projected:
            # after precompute_entity_projection slot 0 holds the
            # PROJECTED pooled text; callers pass raw-BERT mention
            # reprs, so retrieval must stay in raw space — slot 1 keeps
            # the raw CLS vector (device_store.project_drin_tables)
            return self.store.float_rows("text", 0, n, slot=1)
        # raw pooled text [N, D]; float_rows dequantizes only the selected
        # slot (half the transient of a whole-table float view)
        return self.store.float_rows("text", 0, n, slot=0)

    def _ensure_retrieval_table(self):
        if getattr(self, "_retrieval_table", None) is None:
            # zero rows (legitimately possible for missing entities) keep
            # norm 1 so they score 0 instead of NaN-poisoning top_k
            def normalize(t):
                nrm = jnp.linalg.norm(t, axis=-1, keepdims=True)
                return t / jnp.where(nrm == 0, 1.0, nrm)

            self._retrieval_table = jax.jit(normalize)(self._retrieval_source())
            self._retrieve_jit = jax.jit(
                lambda q, t, k: jax.lax.top_k(
                    (q / jnp.linalg.norm(q, axis=-1, keepdims=True)) @ t.T, k),
                static_argnums=2)
        return self._retrieval_table

    def quantize_retrieval(self, expand: int = 4):
        """Build the int8 retrieval cache (mode ``"int8"``).

        The row-normalized table is quantized once to int8 with a per-row
        max-abs scale, halving the resident scan bytes — both the MEMORY
        lever for much larger entity tables and the fastest measured mode
        (1.71x the exact scan at B=16; BASELINE.md retrieval table, the
        scan is bandwidth-bound so half the bytes is ~half the scan
        time).  Each query
        int8-scans the full table, shortlists the top ``k * expand`` via
        the fused ApproxTopK, and rescores those rows EXACTLY against the
        full-precision table, so returned scores/order are exact — only
        shortlist membership is approximate (int8 error on unit vectors is
        ~1e-2 per score, so a true top-k item is lost only when more than
        (expand-1)*k candidates sit within that margin).  Invalidated by
        ``set_store`` and the ``precompute_*`` fast paths like the float
        cache."""
        assert expand >= 1, expand
        t = self._ensure_retrieval_table()
        # publish _retrieval_q LAST: concurrent retrieve() callers (one
        # thread per HTTP request in the non-micro-batched deployment) probe
        # it to decide the cache exists, then read the other two fields
        self._retrieval_expand = int(expand)
        self._retrieve_q_jit = jax.jit(retrieve_quantized, static_argnums=(4, 5))
        self._retrieval_q = jax.jit(quantize_rows)(t)

    def shard_retrieval(self, devices=None, expand: int = 4,
                        quantize: bool = False):
        """Scale-out stage-1 retrieval: row-shard the retrieval table over
        ``devices`` (default: every visible device) so tables beyond one
        chip's HBM stay resident — each device scans only its own shard and
        one tiny [n, B, k] all-gather merges the per-shard winners
        (:class:`ShardedRetrieval`).  Subsequent :meth:`retrieve` calls
        route through the sharded path in every mode (``quantize=True``
        pre-builds the int8 coarse cache; ``mode="int8"`` builds it on
        demand either way).  Invalidated by ``set_store`` and the
        ``precompute_*`` fast paths like the single-device caches."""
        assert expand >= 1, expand
        self._sharded = ShardedRetrieval(self._ensure_retrieval_table(),
                                         devices=devices, quantize=quantize)
        self._sharded_expand = int(expand)
        # release the single-device caches: ShardedRetrieval holds its own
        # row-sharded copies, and retrieve() routes every mode through it
        # from here on — keeping the full [N, D] table (and int8 cache)
        # pinned alongside the shards would double retrieval HBM at exactly
        # the table scales this method exists for.  They rebuild on demand
        # from the store if the caches are ever invalidated back to the
        # single-device path (set_store / the precompute_* fast paths).
        self._retrieval_table = None
        self._retrieval_q = None
        return self._sharded

    def retrieve(self, mention_repr: np.ndarray, k: int = 100,
                 mode: Optional[str] = None, expand: Optional[int] = None):
        """Stage-1 retrieval: cosine top-k of ``mention_repr`` [B, D]
        against the full pooled entity-text table.  The row-normalized
        table is computed once on first use and cached in HBM.  ``k`` is
        clamped to the table's row count in every mode.

        ``mode``:

        * ``"exact"`` — full bf16 scan + exact top-k.  The guarantee
          baseline (held in the sharded path too, at any shard size).
        * ``"approx"`` — full bf16 scan + fused ApproxTopK shortlist of
          ``k * expand`` + exact rescore.  1.35x at production scale,
          B=16 (BASELINE.md); final scores/order exact over the
          shortlist, a true top-k item is only lost if it misses the
          expanded shortlist.  Needs no precompute.
        * ``"int8"`` — int8 coarse scan (half the resident scan bytes) +
          ApproxTopK shortlist + exact rescore; cache built by
          :meth:`quantize_retrieval` (built on demand here).  Fastest:
          1.27-1.71x the exact scan (B=1-16).
        * ``None`` — ``"int8"`` if the int8 cache was built
          (:meth:`quantize_retrieval`, or ``shard_retrieval(quantize=
          True)``), else ``"exact"``: a caller that never opted into an
          approximate cache keeps the exact-scan contract by default.

        ``expand`` widens the approx/int8 shortlist to ``k * expand``; by
        default (``None``) the width the cache was built with applies
        (``quantize_retrieval``/``shard_retrieval``'s ``expand``, or 4),
        and an explicit value overrides it for THIS call in every mode.

        After :meth:`shard_retrieval` every mode routes through the
        row-sharded multi-device path (the scan dtype follows the mode;
        ``"exact"`` pins true per-shard top-k shortlists, ``"approx"``
        rides the per-shard float scan, whose shortlist is an exact
        superset below 4096 rows per shard)."""
        if self.store is None:
            # a deployment fault, not a request fault: the SERVER was built
            # without entity tables — RuntimeError so the HTTP layer
            # reports 500, not a client-blaming 400
            raise RuntimeError(
                "retrieve() needs device entity tables: this Ranker was "
                "built without entity_tables/entity_pooling_cached")
        if expand is not None and expand < 1:
            # same loud failure as the cache builders (quantize_retrieval /
            # shard_retrieval assert expand >= 1); expand=0 would silently
            # return an empty shortlist
            raise ValueError(f"expand must be >= 1, got {expand}")
        sharded = getattr(self, "_sharded", None)
        if sharded is not None:
            if mode is None:
                mode = "int8" if sharded.quant is not None else "exact"
            if mode not in ("exact", "approx", "int8"):
                raise ValueError(f"unknown retrieval mode {mode!r} "
                                 "(exact | approx | int8)")
            exp = expand if expand is not None else getattr(
                self, "_sharded_expand", 4)
            kq = min(k, sharded.n_valid)
            exact = mode == "exact"
            kc = kq if exact else min(k * exp, sharded.n_valid)
            scores, idx = sharded(
                jnp.asarray(mention_repr, jnp.float32), kq, kc,
                quantized=mode == "int8", exact=exact)
            return np.asarray(scores), np.asarray(idx)
        # single-device path only: building (or re-pinning) the full [N, D]
        # normalized table behind the sharded branch would keep a second,
        # unsharded copy resident — doubling retrieval HBM at exactly the
        # table scales shard_retrieval exists for
        table = self._ensure_retrieval_table()
        if mode is None:
            mode = ("int8" if getattr(self, "_retrieval_q", None) is not None
                    else "exact")
        if mode == "int8":
            if getattr(self, "_retrieval_q", None) is None:
                self.quantize_retrieval(expand if expand is not None else 4)
            qt, scales = self._retrieval_q
            exp = expand if expand is not None else self._retrieval_expand
            kc = min(k * exp, qt.shape[0])
            scores, idx = self._retrieve_q_jit(
                jnp.asarray(mention_repr, jnp.float32), qt, scales, table,
                min(k, kc), kc)
        elif mode == "approx":
            if getattr(self, "_retrieve_approx_jit", None) is None:
                self._retrieve_approx_jit = jax.jit(
                    retrieve_rescored, static_argnums=(2, 3))
            kc = min(k * (expand if expand is not None else 4), table.shape[0])
            scores, idx = self._retrieve_approx_jit(
                jnp.asarray(mention_repr, jnp.float32), table, min(k, kc), kc)
        elif mode == "exact":
            scores, idx = self._retrieve_jit(
                jnp.asarray(mention_repr, table.dtype), table,
                min(k, table.shape[0]))
        else:
            raise ValueError(f"unknown retrieval mode {mode!r} "
                             "(exact | approx | int8)")
        return np.asarray(scores), np.asarray(idx)


    # ------------------------------------------------------------------
    def save_bundle(self, path: str):
        """Write a self-contained deployable artifact: config + trained
        params + the (possibly projected) entity tables, reloadable with
        :meth:`from_bundle` on any host — no checkpoint dir, raw store or
        training code required.  Layout: ``config.json`` + an Orbax
        checkpoint of ``{"params", "tables"}``."""
        import dataclasses

        import orbax.checkpoint as ocp

        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(dataclasses.asdict(self.cfg), f, indent=1)
        payload = {"params": jax.device_get(self.params)}
        if self.store is not None:
            # slice to the UNPADDED row count: a row-sharded store pads its
            # row axis, and the bundle must not persist phantom entities
            n = self.store.n_rows
            # a quantized store persists DEQUANTIZED floats: the bundle is
            # the deployment artifact and must reload into any store mode
            # include-narrowed stores (GHMFC: text only) persist what was
            # served; the excluded tables were never uploaded
            payload["tables"] = {
                "entity_text_feature": np.asarray(self.store.float_table("text")[:n], np.float32),
            }
            if "image" in self.store.include:
                payload["tables"]["entity_image_feature"] = np.asarray(
                    self.store.float_table("image")[:n], np.float32)
            if "obj" in self.store.include:
                payload["tables"]["entity_object_feature"] = np.asarray(
                    self.store.float_table("obj")[:n], np.float32)
                payload["tables"]["entity_object_score"] = np.asarray(
                    self.store.obj_score[:n], np.float32)
        ckpt = ocp.StandardCheckpointer()
        # force: refreshing a deployment artifact in place must overwrite
        ckpt.save(os.path.abspath(os.path.join(path, "state")), payload,
                  force=True)
        ckpt.wait_until_finished()

    @classmethod
    def from_bundle(cls, path: str, model=None,
                    quantize_store: bool = False,
                    fused_gather: bool = False) -> "Ranker":
        """Reconstruct a Ranker from a :meth:`save_bundle` directory.
        ``quantize_store=True`` loads the bundled float tables into the
        int8 rank store (bundles always persist floats)."""
        import orbax.checkpoint as ocp

        from drin_tpu.common.config import Config

        with open(os.path.join(path, "config.json")) as f:
            raw = json.load(f)
        # JSON turns tuples into lists; restore the tuple-typed fields
        for k, v in raw.items():
            if isinstance(v, list):
                raw[k] = tuple(v)
        cfg = Config(**raw)
        restored = ocp.StandardCheckpointer().restore(
            os.path.abspath(os.path.join(path, "state")))
        tables = restored.get("tables")
        return cls(cfg, params=restored["params"], entity_tables=tables,
                   model=model, quantize_store=quantize_store,
                   fused_gather=fused_gather)


# ---------------------------------------------------------------------------
# micro-batching front end


from typing import NamedTuple as _NamedTuple


class _Req(_NamedTuple):
    kind: str       # "rank" | "retrieve"
    feats: tuple    # feature fields ("retrieve": the single [B, D] query)
    k: int
    extra: object   # "retrieve": (mode, expand); "rank": unused
    fut: object
    t0: float       # enqueue time (monotonic) for the latency histogram


class _DaemonFlushPool:
    """A fixed pool of DAEMON flush workers.

    Not ``concurrent.futures.ThreadPoolExecutor``: that registers an
    unconditional ``t.join()`` on its non-daemon workers at interpreter
    shutdown, so one flush stuck inside a device call on a hung relay
    (observed >9 min — CLAUDE.md) would block process exit forever AFTER a
    bounded ``close()`` returned — under an external watchdog that is a
    SIGKILL with no artifact.  Daemon workers let the process exit; the
    submit-vs-shutdown race is closed by the lock (a job can never land
    behind a shutdown sentinel, so ``BatchingRanker._dispatch``'s
    closed-pool inline fallback always fires instead)."""

    def __init__(self, n: int):
        import queue

        self._jobs: "queue.SimpleQueue" = queue.SimpleQueue()
        self._open = True
        self._lock = threading.Lock()
        self._threads = [threading.Thread(target=self._work, daemon=True)
                         for _ in range(n)]
        for t in self._threads:
            t.start()

    def _work(self):
        while True:
            job = self._jobs.get()
            if job is None:
                return
            job()

    def submit(self, fn):
        with self._lock:
            if not self._open:
                raise RuntimeError("flush pool is shut down")
            self._jobs.put(fn)

    def shutdown(self, wait: bool = False):
        with self._lock:
            if self._open:
                self._open = False
                for _ in self._threads:
                    self._jobs.put(None)
        if wait:
            for t in self._threads:
                t.join()


class BatchingRanker:
    """Micro-batching wrapper: concurrent ``rank()`` calls coalesce into one
    jitted call on the device.

    ThreadingHTTPServer handles each request on its own thread; without
    coalescing, N concurrent requests issue N interleaved jit calls that
    serialize on the device queue at single-request batch shapes (throughput
    = latency x 1).  Here a dispatcher thread collects requests for up to
    ``wait_ms`` (or until ``max_batch`` rows), pads the combined batch to
    the next bucket size (a handful of XLA programs instead of one per batch
    shape), runs ONE ``ranker.rank`` and splits the results back.  Requests
    with different ``k`` are grouped per flush.  Exceptions propagate to the
    issuing caller only.  ``retrieve`` requests coalesce through the same
    window (grouped by k/mode — query rows concatenate into one scan, the
    dominant cost of which is the full-table read that would otherwise run
    once PER request)."""

    def __init__(self, ranker: Ranker, max_batch: int = 64, wait_ms: float = 2.0,
                 buckets: tuple = (1, 2, 4, 8, 16, 32, 64), pipeline_depth: int = 2):
        import queue

        self.ranker = ranker
        self.cfg = ranker.cfg
        self.max_batch = max_batch
        self.wait_s = wait_ms / 1e3
        self.buckets = tuple(sorted(set(buckets) | {max_batch}))
        self._q: "queue.Queue" = queue.Queue()
        # observability counters (jit calls issued / rows served); flushes
        # run on pipeline threads, so the read-modify-write needs a lock
        self._batches_run = 0
        self._rows_run = 0
        # device-call trace: (kind, padded bucket) -> #calls.  This is the
        # batcher's actual program multiset — replaying it with chained
        # device calls measures the device-side sustained throughput that
        # end-to-end wall clock can't isolate on a transport-bound host
        # (benchmarks/serving.py serve_device_replay)
        from collections import Counter

        self._batch_buckets: "Counter" = Counter()
        # ring of recent end-to-end request latencies (enqueue -> result),
        # in seconds; bounded so a long-lived server stays O(1) memory
        from collections import deque

        self._latencies: "deque" = deque(maxlen=2048)
        self._stats_lock = threading.Lock()
        self._stop = False
        self._close_lock = threading.Lock()  # orders rank() vs close()
        # pipeline_depth > 1 overlaps flush k+1's host->device upload with
        # flush k's device compute/fetch (each flush is independent; order
        # within a flush is preserved by its own futures).  Daemon workers:
        # a flush hung on a dead relay must never block process exit
        # (_DaemonFlushPool docstring)
        self._flush_pool = (_DaemonFlushPool(pipeline_depth)
                            if pipeline_depth > 1 else None)
        self._inflight = threading.Semaphore(max(pipeline_depth, 1))
        self._thread = threading.Thread(target=self._dispatch, daemon=True)
        self._thread.start()

    def close(self, timeout: float = 10.0):
        """Stop the dispatcher; bounded by ~2x ``timeout``.

        In-flight device flushes are NOT awaited (the relay can hang for
        minutes — CLAUDE.md — and a close() that blocks on a hung device
        call would hang every graceful shutdown): they keep running in the
        pool's threads and resolve their callers' futures when the device
        answers.  A window the dispatcher has taken but not yet submitted
        flushes inline once it wakes (the closed-pool fallback in
        ``_dispatch``), so no future is ever stranded — some may simply
        resolve after close() returns."""
        import queue

        with self._close_lock:
            self._stop = True
            self._q.put(None)
        self._thread.join(timeout=timeout)
        if self._flush_pool is not None:
            # wait=False: closes the pool to new submits IMMEDIATELY and
            # returns without blocking on in-flight flushes (which may sit
            # on a hung device) — a dispatcher blocked in
            # _inflight.acquire() will wake when a flush finishes, hit the
            # shut-down pool, and flush its taken window INLINE
            self._flush_pool.shutdown(wait=False)
            if self._thread.is_alive():
                self._thread.join(timeout=timeout)
        # fail any request that raced past the _stop check and enqueued
        # behind the sentinel — its future would otherwise never resolve
        # (e.g. an HTTP handler thread blocking forever during shutdown)
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is not None and not item.fut.done():
                item.fut.set_exception(RuntimeError("BatchingRanker closed"))

    # -- caller side ---------------------------------------------------
    def _submit(self, kind, feats, k, extra):
        import concurrent.futures as cf

        import time as _time

        fut: "cf.Future" = cf.Future()
        with self._close_lock:
            if self._stop:
                raise RuntimeError("BatchingRanker is closed")
            self._q.put(_Req(kind, feats, int(k), extra, fut, _time.monotonic()))
        return fut.result()

    def latency_quantiles(self) -> dict:
        """p50/p95/p99 end-to-end request latency (enqueue -> result) in ms
        over the most recent completed requests (bounded ring)."""
        with self._stats_lock:
            lats = sorted(self._latencies)
        if not lats:
            return {"count": 0}
        q = lambda p: lats[min(len(lats) - 1, int(p * len(lats)))] * 1e3
        return {"count": len(lats), "p50_ms": round(q(0.50), 3),
                "p95_ms": round(q(0.95), 3), "p99_ms": round(q(0.99), 3)}

    def batch_trace(self) -> dict:
        """The device-call multiset so far: ``{"<kind>:<bucket>": count}``
        (bucket = the PADDED batch size actually dispatched; pad waste =
        sum(bucket*count) - rows_run).  Exposed in /stats and replayed
        on-device by benchmarks/serving.py to measure the batcher's
        device-side sustained throughput."""
        with self._stats_lock:
            return {f"{kind}:{bucket}": int(c)
                    for (kind, bucket), c in sorted(self._batch_buckets.items())}

    def rank(self, feats, k: int = 5):
        """Same contract as :meth:`Ranker.rank`; blocks until the coalesced
        device call for this request's flush completes."""
        return self._submit("rank", tuple(np.asarray(x) for x in feats), k, None)

    def retrieve(self, mention_repr, k: int = 100, mode: Optional[str] = None,
                 expand: Optional[int] = None):
        """Same contract as :meth:`Ranker.retrieve` (incl. the per-call
        ``expand`` shortlist-width override); concurrent queries with the
        same k/mode/expand coalesce into ONE full-table scan."""
        return self._submit("retrieve",
                            (np.asarray(mention_repr, np.float32),), k,
                            (mode, expand))

    def rank_text(self, sentences, char_spans, candidate_texts, k: int = 5,
                  mention_images=None, tokenizer=None):
        """Tokenize on the calling thread (CPU, parallel across requests),
        coalesce the resulting feature batches on the device."""
        from drin_tpu.data.online import assemble_online_feats

        assert self.cfg.online_bert, "rank_text needs the online-BERT model"
        if tokenizer is None:
            tokenizer = self.ranker._ensure_tokenizer()
        feats = assemble_online_feats(self.cfg, tokenizer, sentences, char_spans,
                                      candidate_texts, mention_images)
        return self.rank(feats, k)

    # -- dispatcher side -----------------------------------------------
    def _take_window(self):
        """Block for the first request, then drain for up to wait_ms /
        max_batch rows."""
        import queue
        import time as _time

        first = self._q.get()
        if first is None:
            return None
        items = [first]
        rows = first.feats[0].shape[0]
        deadline = _time.monotonic() + self.wait_s
        while rows < self.max_batch:
            timeout = deadline - _time.monotonic()
            if timeout <= 0:
                break
            try:
                it = self._q.get(timeout=timeout)
            except queue.Empty:
                break
            if it is None:
                self._q.put(None)  # re-signal stop after this flush
                break
            items.append(it)
            rows += it.feats[0].shape[0]
        return items

    def _call(self, kind, batch, k, extra):
        if kind == "retrieve":
            mode, expand = extra
            return self.ranker.retrieve(batch[0], k, mode=mode, expand=expand)
        return self.ranker.rank(batch, k)

    def _flush(self, items):
        # group by (kind, k, extra, trailing shapes): concatenation needs
        # matching field shapes beyond the batch dim — e.g. rank_text
        # requests tokenized to different length buckets each get their own
        # device call
        import time as _time

        by_k: dict = {}
        for req in items:
            key = (req.kind, req.k, req.extra,
                   tuple(np.asarray(f).shape[1:] for f in req.feats))
            by_k.setdefault(key, []).append(req)

        def done(req):
            with self._stats_lock:
                self._latencies.append(_time.monotonic() - req.t0)

        for (kind, k, extra, _), group in by_k.items():
            sizes = [r.feats[0].shape[0] for r in group]
            try:
                n = sum(sizes)
                bucket = next(b for b in self.buckets if b >= n) if n <= self.max_batch else n
                fields = zip(*[r.feats for r in group])
                batch = tuple(np.concatenate(col, axis=0) for col in fields)
                if bucket > n:  # pad rows by repeating row 0; sliced off below
                    batch = tuple(
                        np.concatenate([c, np.repeat(c[:1], bucket - n, axis=0)])
                        for c in batch)
                scores, idx = self._call(kind, batch, k, extra)
                with self._stats_lock:
                    self._batches_run += 1
                    self._rows_run += n
                    self._batch_buckets[(kind, bucket)] += 1
                off = 0
                for req, sz in zip(group, sizes):
                    req.fut.set_result((scores[off : off + sz], idx[off : off + sz]))
                    done(req)
                    off += sz
            except Exception:
                # a malformed request must fail only its own caller: retry
                # the group one-by-one so each future gets its own outcome.
                # Requests already resolved by the batched path (the fault
                # hit mid-distribution) are skipped, and a future that can't
                # accept its outcome must never strand the REST of the
                # window's groups by escaping _flush (InvalidStateError).
                for req in group:
                    if req.fut.done():
                        continue
                    try:
                        out = self._call(kind, req.feats, k, extra)
                        with self._stats_lock:
                            self._batches_run += 1
                            self._rows_run += req.feats[0].shape[0]
                            self._batch_buckets[(kind, req.feats[0].shape[0])] += 1
                        req.fut.set_result(out)
                        done(req)
                    except Exception as e:
                        try:
                            req.fut.set_exception(e)
                        except Exception:
                            pass

    def _dispatch(self):
        while not self._stop:
            items = self._take_window()
            if items is None:
                return
            if self._flush_pool is None:
                self._flush(items)
                continue
            self._inflight.acquire()  # bounded: at most pipeline_depth in flight

            def run(items=items):
                try:
                    self._flush(items)
                finally:
                    self._inflight.release()

            try:
                self._flush_pool.submit(run)
            except RuntimeError:
                # pool shut down by close() while this window was already
                # taken: flush inline so its futures still resolve (they
                # were dequeued, so close()'s queue drain can't see them)
                run()


# ---------------------------------------------------------------------------
# minimal HTTP wrapper


def _encode_arrays(arrays: dict) -> str:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return base64.b64encode(buf.getvalue()).decode()


def _decode_arrays(payload: str) -> dict:
    data = np.load(io.BytesIO(base64.b64decode(payload)), allow_pickle=False)
    return {k: data[k] for k in data.files}


def rank_feat_fields(ranker) -> list:
    """The positional feature-field names a ``/rank`` request must carry for
    this ranker's configuration (its batch NamedTuple minus ``answer``).

    Without an explicit order, ``serve_http`` sorts npz keys
    alphabetically — which can never match the positional batch order
    (``entity_*`` sorts before ``mention_*``), so the CLI wires this in by
    default."""
    base = getattr(ranker, "ranker", ranker)
    cfg = base.cfg
    if cfg.online_bert:
        from drin_tpu.data.online import OnlineBatch

        bt = OnlineBatch
    elif base.kind == "drin":
        from drin_tpu.data.dataset import DrinBatch
        from drin_tpu.data.device_store import DrinRowsBatch

        bt = DrinRowsBatch if base.store is not None else DrinBatch
    else:
        from drin_tpu.data.dataset import BaselineBatch
        from drin_tpu.data.device_store import BaselineRowsBatch

        bt = BaselineRowsBatch if base.store is not None else BaselineBatch
    return list(bt._fields[:-1])


def serve_http(ranker: Ranker, host: str = "127.0.0.1", port: int = 8787,
               feat_fields: Optional[list] = None):
    """Start a blocking JSON-over-HTTP server.

    POST /rank      {"features": <b64 npz of the batch feature fields>, "k": 5}
                    -> {"scores": [[...]], "indices": [[...]]}
    POST /rank_text {"sentences": [...], "spans": [[s, e], ...],
                     "candidates": [[...], ...], "k": 5}  (online model only)
                    -> {"scores": [[...]], "indices": [[...]]}
    POST /retrieve  {"query": <b64 npz {"q": [B, D]}>, "k": 100}
                    -> {"scores": [[...]], "indices": [[...]]}
                    (stage-1 retrieval over the full entity table; needs
                    device entity tables)
    GET  /health    -> {"status": "ok"}
    GET  /stats     -> deployment facts + (micro-batched) coalescing
                    counters {"batches_run", "rows_run"}

    Feature/query payloads are base64 npz; ``np.savez_compressed`` payloads
    decode transparently — use them on thin links (a 400KB feature batch
    is the transport cost that dominates relay-attached hosts,
    BASELINE.md serving-concurrency analysis).
    ``ranker`` may be a :class:`Ranker` or a :class:`BatchingRanker` (the
    micro-batching front end; /rank AND /retrieve both coalesce).
    Returns the server object (call ``.shutdown()`` from another thread)."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    fields = feat_fields

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _reply(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._reply(200, {"status": "ok", "model": ranker.cfg.model_type})
            elif self.path == "/stats":
                base = getattr(ranker, "ranker", ranker)
                out = {"model": ranker.cfg.model_type,
                       "dataset": ranker.cfg.dataset_name,
                       "micro_batched": base is not ranker,
                       # n_rows: the UNPADDED count (a row-sharded store
                       # zero-pads its row axis to the mesh multiple)
                       "entity_rows": (base.store.n_rows
                                       if base.store is not None else None),
                       "sharded_retrieval": getattr(base, "_sharded", None)
                                            is not None}
                if base is not ranker:  # batcher observability counters
                    out["batches_run"] = ranker._batches_run
                    out["rows_run"] = ranker._rows_run
                    out["batch_buckets"] = ranker.batch_trace()
                    out["latency"] = ranker.latency_quantiles()
                self._reply(200, out)
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path not in ("/rank", "/rank_text", "/retrieve"):
                self._reply(404, {"error": "unknown path"})
                return
            try:
                # parse phase: json decode, payload decode, field extraction
                # — ANY failure here is a malformed request (the client's
                # fault), 400
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length))
                if self.path == "/rank_text":
                    call = lambda: ranker.rank_text(
                        req["sentences"], req["spans"], req["candidates"],
                        int(req.get("k", 5)))
                elif self.path == "/retrieve":
                    # BatchingRanker coalesces retrieves too (same window)
                    q = _decode_arrays(req["query"])["q"]
                    expand = req.get("expand")
                    call = lambda: ranker.retrieve(
                        q, int(req.get("k", 100)), mode=req.get("mode"),
                        expand=int(expand) if expand is not None else None)
                else:
                    arrays = _decode_arrays(req["features"])
                    order = fields or sorted(arrays)
                    feats = tuple(arrays[name] for name in order)
                    call = lambda: ranker.rank(feats, int(req.get("k", 5)))
            except Exception as e:
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})
                return
            try:
                scores, idx = call()
                self._reply(200, {"scores": scores.tolist(), "indices": idx.tolist()})
            except (KeyError, ValueError, TypeError, AssertionError,
                    IndexError) as e:
                # bad shapes/dtypes/unknown modes/out-of-range spans in an
                # otherwise well-formed payload surface here: still the
                # request's fault.  Server-STATE preconditions raise
                # RuntimeError (e.g. retrieve() without tables) and land in
                # the 500 arm below
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})
            except Exception as e:  # serving must not die on a failed request
                # anything else (device fault, closed batcher, OOM) is a
                # SERVER error — a 400 would make retry policies and
                # operators blame the client for a backend fault
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

    server = ThreadingHTTPServer((host, port), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server


def main(argv=None):
    """Deployment CLI: ``python -m drin_tpu.serve`` stands up the HTTP
    ranking service from a bundle or a checkpoint.

    Bundle mode (self-contained artifact from :meth:`Ranker.save_bundle`)::

        python -m drin_tpu.serve bundle=/path/to/bundle port=8787

    Checkpoint mode (any Config field is overridable, train.py-style)::

        python -m drin_tpu.serve model_type=drin dataset_name=wikimel \\
            checkpoint_dir=ckpt preprocess_dir=data/wikimel port=8787

    Serving-only keys (consumed here, everything else is a Config
    override):

    * ``host``/``port`` — bind address (default 127.0.0.1:8787)
    * ``micro_batch=true`` (+ ``wait_ms``, ``max_batch``) — put the
      :class:`BatchingRanker` coalescing front end in front
    * ``project_entities=true`` — `precompute_entity_projection` fast path
      (DRIN)
    * ``precompute_entities=true`` — `precompute_entity_reprs` fast path
      (GHMFC: encode the whole entity table once; per-request cost drops
      to mention encoding + gather + cosine, retrieval moves to trained
      model space)
    * ``quantize_retrieval=true`` / ``shard_retrieval=true`` /
      ``retrieve_expand=N`` — stage-1 retrieval caches (int8 coarse scan;
      row-sharding over all visible devices)
    * ``quantize_store=true`` — int8 RANK-stage entity tables (~2x
      entities per chip; scores tolerance-bounded, see DeviceEntityStore)
    * ``fused_gather=true`` — serve the int8 tables through the fused
      Pallas gather+dequant kernel (DRIN or GHMFC, with quantize_store;
      needs 128-lane-aligned feature dims, refused loudly otherwise)

    Returns the server object (tests use ``port=0`` + ``.shutdown()``); the
    ``__main__`` path blocks until interrupted."""
    from drin_tpu.common.cli import parse_overrides

    overrides = parse_overrides(argv if argv is not None else sys.argv[1:])
    bundle = overrides.pop("bundle", None)
    host = overrides.pop("host", "127.0.0.1")
    port = int(overrides.pop("port", 8787))
    micro = overrides.pop("micro_batch", False)
    wait_ms = float(overrides.pop("wait_ms", 2.0))
    max_batch = int(overrides.pop("max_batch", 64))
    project = overrides.pop("project_entities", False)
    precompute = overrides.pop("precompute_entities", False)
    quant = overrides.pop("quantize_retrieval", False)
    shard = overrides.pop("shard_retrieval", False)
    expand = int(overrides.pop("retrieve_expand", 4))
    quantize_store = overrides.pop("quantize_store", False)
    fused_gather = overrides.pop("fused_gather", False)
    if bundle is not None:
        if overrides:
            raise SystemExit("bundle mode takes no config overrides, got: "
                             + ", ".join(sorted(overrides)))
        ranker = Ranker.from_bundle(bundle, quantize_store=bool(quantize_store),
                                    fused_gather=bool(fused_gather))
    else:
        from drin_tpu.common.config import make_config

        model_type = overrides.pop("model_type", "drin")
        dataset_name = overrides.pop("dataset_name", "wikidiverse")
        cfg = make_config(model_type, dataset_name, **overrides)
        tables = None
        if cfg.dataset_name == "wikimel" and cfg.entity_pooling_cached:
            # loaded for online configs too: the online model never reads
            # them in its forward (it tokenizes entity text per request)
            # but stage-1 /retrieve scans the pooled text table regardless.
            # Host-side include narrowing mirrors the store's: a GHMFC /
            # online server never READS the image/object arrays either —
            # multi-GB of host RAM and startup I/O skipped
            from drin_tpu.data.dataset import load_wikimel_entity_tables

            kind = "drin" if cfg.model_type == "drin" else "baseline"
            tables = load_wikimel_entity_tables(cfg, include=include_for(kind))
        ranker = Ranker(cfg, entity_tables=tables,
                        quantize_store=bool(quantize_store),
                        fused_gather=bool(fused_gather))
    if project:
        ranker.precompute_entity_projection()
    if precompute:
        ranker.precompute_entity_reprs()
    if shard:
        ranker.shard_retrieval(expand=expand, quantize=bool(quant))
    elif quant:
        ranker.quantize_retrieval(expand=expand)
    front = (BatchingRanker(ranker, max_batch=max_batch, wait_ms=wait_ms)
             if micro else ranker)
    # positional /rank field order for this configuration — alphabetical
    # npz order can never match it (entity_* sorts before mention_*)
    server = serve_http(front, host=host, port=port,
                        feat_fields=rank_feat_fields(front))
    print(f"serving {ranker.cfg.model_type}/{ranker.cfg.dataset_name} on "
          f"http://{host}:{server.server_address[1]}"
          + (" (micro-batched)" if micro else ""), flush=True)
    return server


if __name__ == "__main__":
    _srv = main()
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        _srv.shutdown()
