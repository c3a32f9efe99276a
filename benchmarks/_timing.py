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


# v5e spec ceilings the calibration probes report against (ONE definition;
# bench.py's "calibration" field and roofline.py's calib_* lines must be
# comparable across rounds, so the constants and probe bodies live here)
V5E_PEAK_FLOPS = 197e12  # bf16 MXU peak
V5E_PEAK_BW = 819e9  # HBM bytes/s


def stream_read_bw(size_mb: int = 256, Kc: int = 6, iters: int = 3) -> float:
    """Sustained bf16 stream-read bandwidth (bytes/s): a fused add+reduce
    over a ``size_mb`` device-resident buffer, K-chained per the module
    rule.  The ONE stream-probe body — bench.py's session calibration and
    roofline.py's empirical ceiling share it (they pass different
    size/Kc/iters, but the chain construction and folding discipline must
    never drift between them).  The buffer is created ON-device (jnp.ones
    lowers to a fill — no upload through the ~2.4MB/s relay)."""
    import jax
    import jax.numpy as jnp

    rows = size_mb // 2  # bf16 [rows, 1024, 1024] = size_mb MB
    big = jnp.ones((rows, 1024, 1024), jnp.bfloat16)

    def read_chain(eps, x):
        for _ in range(Kc):
            eps = jnp.sum((x + eps.astype(x.dtype) * 1e-12).astype(jnp.float32)) * 1e-12 + eps
        return eps

    dt = timed_chain(jax.jit(read_chain), (big,), Kc, iters=iters)
    return big.nbytes / dt


def matmul_flops(n: int = 4096, Kc: int = 6, iters: int = 3) -> float:
    """Sustained bf16 matmul throughput (FLOP/s): an n^3 dot chain, each
    link a float perturbation of real data (NOT ``+ eps*0`` — fold-prone,
    module docstring).  The ONE matmul-probe body shared by bench.py and
    roofline.py."""
    import jax
    import jax.numpy as jnp

    a = jnp.ones((n, n), jnp.bfloat16)

    def mm_chain(eps, a):
        x = a
        for _ in range(Kc):
            x = jax.lax.dot(x + eps.astype(x.dtype) * 1e-12, a,
                            precision=None, preferred_element_type=jnp.bfloat16)
            eps = jnp.sum(x[0, :8].astype(jnp.float32)) * 1e-12 + eps
        return eps

    dt = timed_chain(jax.jit(mm_chain), (a,), Kc, iters=iters)
    return 2 * n ** 3 / dt


def daemon_client_pool(n_clients: int, n_req: int, call, timeout_s: float = 600.0) -> None:
    """Run ``call()`` ``n_req`` times across ``n_clients`` DAEMON threads;
    returns when every request drained.  concurrent.futures joins its
    non-daemon workers unconditionally at interpreter shutdown, so one
    worker stuck inside a device call on a hung relay would block process
    exit forever even after the benchmark section "finished" — the
    external-watchdog hazard (CLAUDE.md daemon-pool rule;
    serve._DaemonFlushPool is the serving-side instance).  Raises
    RuntimeError when the clients do not drain within ``timeout_s`` (relay
    outage mid-sweep): the caller skips the section; the stuck daemon
    threads die with the process instead of wedging it."""
    import itertools
    import threading

    counter = itertools.count()
    errors: list = []

    def client():
        while next(counter) < n_req:
            try:
                call()
            except BaseException as e:  # surface, don't wedge the join
                errors.append(e)
                return

    threads = [threading.Thread(target=client, daemon=True) for _ in range(n_clients)]
    deadline = time.monotonic() + timeout_s
    for t in threads:
        t.start()
    for t in threads:
        t.join(max(deadline - time.monotonic(), 0.0))
    if errors:
        raise errors[0]
    if any(t.is_alive() for t in threads):
        raise RuntimeError(
            f"concurrent clients did not drain within {timeout_s:.0f}s "
            "(relay outage mid-sweep?); section skipped, daemon workers "
            "will die with the process")
