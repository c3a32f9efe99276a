# -*- coding: utf-8 -*-
"""Top-k accuracy with correction — functional, psum-able counters.

Replaces the reference's torchmetrics ``TopkAccuracy`` (utils.py:46-73).
State is a pytree of f32 scalar counters so it can live inside a jitted step
and be reduced over the data axis with ``jax.lax.psum`` (the reference's
only distributed-aware line, ``dist_reduce_fx="sum"`` at utils.py:57-58,
maps to exactly that).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

MetricState = Dict[str, jax.Array]  # {"correct_{k}": [], "total": []}


def init_state(topk: Sequence[int]) -> MetricState:
    state = {f"correct_{k}": jnp.zeros((), jnp.float32) for k in topk}
    state["total"] = jnp.zeros((), jnp.float32)
    # running loss lives on-device with the counters so the train loop never
    # blocks on a per-step host fetch (it reads the state at log time only)
    state["loss_sum"] = jnp.zeros((), jnp.float32)
    state["n_batches"] = jnp.zeros((), jnp.float32)
    return state


def add_loss(state: MetricState, loss: jax.Array) -> MetricState:
    new = dict(state)
    new["loss_sum"] = state["loss_sum"] + loss
    new["n_batches"] = state["n_batches"] + 1.0
    return new


def mean_loss(state: MetricState) -> jax.Array:
    return state["loss_sum"] / jnp.maximum(state["n_batches"], 1.0)


def update(state: MetricState, y_pred: jax.Array, y_true: jax.Array, topk: Sequence[int],
           valid: jax.Array | None = None) -> MetricState:
    """Accumulate counters for one batch (utils.py:60-66): the answer column
    is stripped, a candidate counts as hit when its score >= the k-th
    largest (ties included).  ``valid`` masks padded rows of a static-shape
    ragged batch.

    Computed by RANK comparison, not sort: only the GOLD candidate's
    top-k membership matters, and (with the reference's tie rule) gold's
    score >= the k-th largest  ⟺  fewer than k scores are strictly greater
    than it.  One [B, C] comparison pass replaces a top_k sort per k —
    sorts are serial-latency-bound on the VPU and dominate the eval step's
    metrics tail, where (unlike training) no backward hides them
    (BASELINE.md roofline: 377µs/batch standalone).  Equivalence vs the
    sort-based mask is pinned by test_ops.py::test_update_rank_equals_mask
    and the reference-parity metric tests."""
    from drin_tpu.train.loss import _strip_answer_column

    y_pred = _strip_answer_column(y_true, y_pred)
    new = dict(state)
    vw = valid if valid is not None else jnp.ones((), jnp.float32)
    s_gold = jnp.sum(y_pred * y_true.astype(y_pred.dtype), axis=-1)
    # all-zero one-hot rows ("answer not in candidates", drin/data.py:159-161)
    # must never count as hits
    has_gold = (jnp.sum(y_true, axis=-1) > 0).astype(jnp.float32)
    n_greater = jnp.sum(y_pred > s_gold[:, None], axis=-1)
    # NaN poisoning must surface as a MISS, not a hit: with a NaN anywhere
    # in the row, s_gold becomes NaN (NaN*0) and every `> s_gold` compare
    # is False, so the plain rank test would count the row for every k and
    # a NaN-poisoned run would report ~100% accuracy.  torch.topk sorts
    # NaN first (reference semantics: NaN candidates outrank gold), so a
    # non-finite row scoring as a miss matches the reference's direction
    # while making the failure visible.  Padded fake candidates never reach
    # here (models slice them off), so finiteness is a pure health check.
    finite = jnp.all(jnp.isfinite(y_pred), axis=-1).astype(jnp.float32)
    for k in topk:
        hit = (n_greater < k).astype(jnp.float32) * has_gold * finite
        new[f"correct_{k}"] = state[f"correct_{k}"] + jnp.sum(hit * vw)
    n = jnp.sum(valid) if valid is not None else y_pred.shape[0]
    new["total"] = state["total"] + n
    return new


def compute(state: MetricState, topk: Sequence[int], correction: float = 0.0) -> Dict[int, jax.Array]:
    """Finalize accuracies; ``correction`` folds first-stage retrieval misses
    into the reported number as the reference does at display time
    (train.py:38, acc / (1 - correction))."""
    total = jnp.maximum(state["total"], 1.0)
    return {k: state[f"correct_{k}"] / total / (1.0 - correction) for k in topk}


def psum_state(state: MetricState, axis_name: str) -> MetricState:
    """Cross-device reduction of the counters (maps the reference's
    dist_reduce_fx="sum" to a psum over the mesh)."""
    return jax.tree.map(lambda x: jax.lax.psum(x, axis_name), state)
