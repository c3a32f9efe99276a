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
