# -*- coding: utf-8 -*-
"""Shared chained-call timing for the benchmark scripts (BASELINE.md
methodology).

``timed_chain`` times a jitted body of K data-dependent calls with one final
host fetch — device time, not per-dispatch relay transport.  The chain MUST
thread the scalar through a *float* perturbation of real data (e.g.
``x + eps * 1e-12`` on a float operand, or a parameter leaf): an integer
dependency like ``ids + int(eps) * 0`` is algebraically folded by XLA, after
which CSE merges the K identical calls into one and the measurement
over-reports by K (empirically confirmed; see git history of
benchmarks/preprocess.py).
"""

from __future__ import annotations

import time


def timed_chain(jfn, args, K: int, iters: int = 8) -> float:
    """jfn(eps, *args) -> eps, internally chaining K calls.  Returns seconds
    per call."""
    import jax.numpy as jnp

    eps = jnp.float32(0.0)
    float(jfn(eps, *args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        eps = jfn(eps, *args)
    float(eps)
    return (time.perf_counter() - t0) / (iters * K)


def exact_retrieval_body(q, table):
    """The ONE definition of the exact stage-1 scan both benchmark scripts
    time: renormalize the (perturbed) queries, cosine-score the full
    normalized table, top-k the shortlist."""
    import jax
    import jax.numpy as jnp

    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jax.lax.top_k(q @ table.T, 100)


def retrieve_chain_time(body, q0, tables, K: int = 4, iters: int = 10) -> float:
    """Seconds per retrieval call: K chained ``body(q, *tables) ->
    (scores, idx)`` calls, chained through a float perturbation of the
    query per the module rule.  The ONE retrieval-timing implementation —
    bench.py's secondary retrieval rows and benchmarks/serving.py's
    stage-1 sweeps share it, so a methodology fix lands everywhere at once
    (same contract as :func:`rank_chain_time` for rank programs).  Device
    tables ride through jit as ARGUMENTS (closure-captured tables become
    compile-time constants — CLAUDE.md)."""
    import jax
    import jax.numpy as jnp

    def chain(eps, q, *tbls):
        for _ in range(K):
            scores, _ = body(q + eps.astype(q.dtype) * 1e-12, *tbls)
            eps = jnp.sum(scores.astype(jnp.float32)) * 1e-9 + eps
        return eps

    return timed_chain(jax.jit(chain), (q0,) + tuple(tables), K, iters=iters)


def rank_chain_time(apply_fn, feats_fn, dev_params, dev_batch, tables,
                    K: int = 4, iters: int = 10) -> float:
    """Seconds per rank forward: K chained ``apply_fn(params,
    feats_fn(batch, tables))`` calls, chained through a float perturbation
    of the batch's first (float) tensor per the module rule above.  The ONE
    rank-timing implementation — bench.py's secondary rows and every
    benchmarks/serving.py store A/B call this, so a methodology fix lands
    everywhere at once.  ``tables`` rides through jit as an ARGUMENT
    (closure-captured device tables become compile-time constants and hang
    remote compilation at production sizes — CLAUDE.md)."""
    import jax
    import jax.numpy as jnp

    def chain(eps, params, dev, tables):
        for _ in range(K):
            b = (dev[0] + eps.astype(dev[0].dtype) * 1e-12,) + dev[1:]
            out = apply_fn(params, feats_fn(b, tables))
            eps = jnp.sum(out.astype(jnp.float32)) * 1e-9 + eps
        return eps

    return timed_chain(jax.jit(chain), (dev_params, dev_batch, tables),
                       K, iters=iters)
