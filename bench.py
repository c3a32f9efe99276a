# -*- coding: utf-8 -*-
"""Benchmark: DRIN eval throughput (mention-candidate pairs/sec/chip).

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "calibration": {...}}

The workload is the reference's headline eval configuration (SURVEY §6):
WikiMEL shapes — batch 64, C=101 candidates, 128-token mention features,
64-token entity attributes, 49 ResNet regions — full DRIN forward.

``vs_baseline`` compares against the reference PyTorch implementation run in
place (/root/reference, eager torch on this host's CPU — the only hardware
both can run on here; the reference's own GPU numbers are unpublished,
BASELINE.md).  The reference measurement is cached in
``baseline_measured.json`` so repeated bench runs skip it.

Resilience (VERDICT r3 #1): the TPU sits behind a relay whose backend init
occasionally fails transiently (round 3's artifact was a stack trace because
of exactly one such failure).  The measurement therefore runs in a CHILD
process — a fresh process is the only reliable way to retry backend init —
with bounded retries and exponential backoff in the parent.  On final
failure the parent still prints the ONE JSON line with ``"value": null`` and
an ``"error"`` field so the artifact stays parseable.

Session calibration (VERDICT r3 #7): the shared chip's throughput varies
±50% between sessions for model programs while simple stream/matmul probes
stay stable.  Each run embeds those probe results in a ``"calibration"``
field so cross-round deltas can be separated from co-tenancy weather
(BASELINE.md roofline section explains how to read it).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

B = 64
N_WARMUP = 2
N_ITERS = 15
UNROLL = 20  # forwards per dispatch (amortizes transport overhead)
BASELINE_CACHE = os.path.join(REPO, "baseline_measured.json")

MAX_ATTEMPTS = 7
ATTEMPT_TIMEOUT_S = 540  # compile ~20-40s + timed section; generous for relay
PROBE_TIMEOUT_S = 150  # backend init + one trivial device op
# between attempts; ~22 min total sleep.  Relay outages of >90 min have
# been observed live — a probe-gated failed attempt costs ~150s, so the
# worst case (relay down throughout) is ~40 min before the null artifact;
# a mid-window recovery is caught within one backoff step.
BACKOFF_S = (10, 30, 90, 180, 420, 600)

# v5e spec ceilings (BASELINE.md roofline section); the probes report what
# THIS session actually sustains against them
PEAK_FLOPS = 197e12
PEAK_BW = 819e9


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_calibration() -> dict:
    """Session-quality probes: bf16 stream-read bandwidth + 4096^2 matmul
    throughput, both via the chained-call methodology (benchmarks/_timing).
    Stable across sessions (~327 GB/s / ~89 TFLOP/s historically) while model
    programs swing ±50% with co-tenancy — so a regression in ``value`` with
    unchanged calibration is code, and vice versa."""
    import jax
    import jax.numpy as jnp

    from benchmarks._timing import timed_chain

    Kc = 6
    # created ON-device (jnp.ones lowers to a device fill — no 256MB upload
    # through the ~2.4MB/s relay)
    big = jnp.ones((128, 1024, 1024), jnp.bfloat16)  # 256 MB

    def read_chain(eps, x):
        for _ in range(Kc):
            eps = jnp.sum((x + eps.astype(x.dtype) * 1e-12).astype(jnp.float32)) * 1e-12 + eps
        return eps

    dt = timed_chain(jax.jit(read_chain), (big,), Kc, iters=3)
    stream_bw = big.nbytes / dt
    del big

    a = jnp.ones((4096, 4096), jnp.bfloat16)

    def mm_chain(eps, a):
        x = a
        for _ in range(Kc):
            # float perturbation, NOT `+ eps*0` (fold-prone — CLAUDE.md rule)
            x = jax.lax.dot(x + eps.astype(x.dtype) * 1e-12, a,
                            precision=None, preferred_element_type=jnp.bfloat16)
            eps = jnp.sum(x[0, :8].astype(jnp.float32)) * 1e-12 + eps
        return eps

    dt = timed_chain(jax.jit(mm_chain), (a,), Kc, iters=3)
    mm_flops = 2 * 4096 ** 3 / dt  # timed_chain already divides by Kc
    del a
    calib = {
        "stream_gb_s": round(stream_bw / 1e9, 1),
        "stream_pct_of_spec": round(stream_bw / PEAK_BW * 100, 1),
        "matmul_tflop_s": round(mm_flops / 1e12, 1),
        "matmul_pct_of_spec": round(mm_flops / PEAK_FLOPS * 100, 1),
    }
    log(f"calibration: {json.dumps(calib)}")
    return calib


def measure_ours() -> float:
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from drin_tpu.common.config import make_config
    from drin_tpu.models.drin import DRIN

    cfg = make_config("drin", "wikimel", dataset_root="/tmp/unused")
    model = DRIN(cfg)
    rng = np.random.default_rng(0)
    feats, _ = g._random_drin_batch(cfg, B=B, rng=rng)
    params = model.init(jax.random.key(0), feats)["params"]

    # Serving configuration: bf16 compute with device-resident bf16
    # features/params (MXU-native; scores within float tolerance of f32 —
    # see tests/test_entity_cache.py for the exact-math cache equivalence).
    dt = jnp.bfloat16
    cast = lambda x: x.astype(dt) if np.issubdtype(np.asarray(x).dtype, np.floating) else np.asarray(x)

    # Timing methodology for high-latency transports (e.g. remote relays):
    #   * naive per-call block_until_ready over-reports (completion signals
    #     return early),
    #   * one dispatch per forward under-reports (each dispatch costs
    #     ~0.5-1.3ms of transport overhead vs ~0.7ms of device compute).
    # So: unroll K forwards inside ONE jitted program, chained through a
    # scalar so the device must execute them sequentially, and fetch once.
    K = UNROLL

    def chain(eps, params, feats):
        for _ in range(K):
            f = (feats[0] + eps.astype(feats[0].dtype) * 1e-12,) + feats[1:]
            eps = jnp.sum(model.apply({"params": params}, f).astype(jnp.float32)) * 1e-9 + eps
        return eps

    # shared methodology helper (benchmarks/_timing.timed_chain): K chained
    # forwards per dispatch, one final fetch — its docstring carries the
    # folding caveats so fixes there reach this headline benchmark too
    from benchmarks._timing import timed_chain

    fn = jax.jit(chain)
    dev_feats = tuple(jax.device_put(cast(x)) for x in feats)
    dev_params = jax.device_put(jax.tree.map(cast, params))
    log(f"devices: {jax.devices()}")
    for _ in range(N_WARMUP - 1):  # timed_chain itself warms once more
        float(np.asarray(fn(jnp.float32(0.0), dev_params, dev_feats)))
    per_fwd = timed_chain(fn, (dev_params, dev_feats), K, iters=N_ITERS)
    n_fwd = N_ITERS * K
    log(f"ours: {n_fwd} forwards in {per_fwd * n_fwd:.3f}s "
        f"({per_fwd * 1e3:.3f} ms/forward)")
    return B * cfg.num_candidates_model / per_fwd


def measure_reference() -> float:
    """Run the reference DRIN forward in place (read-only import; never
    copied).  Uses the same random-batch generator and batch shapes."""
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cached = json.load(f)
        log(f"reference (cached): {cached['pairs_per_sec']:.0f} pairs/s [{cached['note']}]")
        return cached["pairs_per_sec"]

    import torch

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from reference_oracle import load_reference, ref_import

    import __graft_entry__ as g
    from drin_tpu.common.config import make_config

    load_reference("wikimel", "drin")
    ref_model_mod = ref_import("drin.model")
    torch.manual_seed(0)
    ref = ref_model_mod.Model().eval()
    # The reference consumes the raw token-level entity layout [B, C, Le, D]
    # (drin/data.py:89-93); disable the pooled-cache layout for its batch.
    cfg = make_config("drin", "wikimel", dataset_root="/tmp/unused",
                      cache_entity_pooling=False)
    rng = np.random.default_rng(0)
    feats, _ = g._random_drin_batch(cfg, B=B, rng=rng)
    tb = [torch.as_tensor(x) for x in feats]
    n_iters = 3
    with torch.no_grad():
        ref(tb)  # warmup
        t0 = time.perf_counter()
        for _ in range(n_iters):
            ref(tb)
        dt = time.perf_counter() - t0
    pps = n_iters * B * cfg.num_candidates_model / dt
    note = f"reference torch eager, CPU ({os.cpu_count()} cores), batch {B}"
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"pairs_per_sec": pps, "note": note}, f)
    log(f"reference: {n_iters} iters in {dt:.3f}s -> {pps:.0f} pairs/s [{note}]")
    return pps


def run_attempt() -> None:
    """One full measurement (child-process mode): calibration probes, our
    throughput, the cached reference baseline.  Prints the final JSON line."""
    try:
        calibration = measure_calibration()
    except Exception as e:  # probes must never sink the headline number
        log(f"calibration probes failed (continuing): {e!r}")
        calibration = {"error": repr(e)[:200]}
    ours = measure_ours()
    try:
        baseline = measure_reference()
    except Exception as e:  # reference measurement must never break the bench
        log(f"reference measurement failed: {e!r}")
        baseline = None
    result = {
        "metric": "drin_eval_throughput",
        "value": round(ours, 1),
        "unit": "mention-candidate pairs/sec/chip",
        "vs_baseline": round(ours / baseline, 2) if baseline else None,
        "calibration": calibration,
    }
    print(json.dumps(result))


def run_probe() -> None:
    """Child --probe mode: backend init + one trivial device op.  A downed
    relay hangs even ``jax.devices()`` for minutes, so the parent gates each
    full attempt on this cheap probe instead of burning the 540s attempt
    timeout discovering the outage."""
    import jax

    print("devices:", jax.devices(), flush=True)
    print("probe:", float(jax.jit(lambda: jax.numpy.zeros(()) + 1.0)()), flush=True)


def _probe_device() -> "tuple[bool, str]":
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--probe"],
            capture_output=True, text=True, timeout=PROBE_TIMEOUT_S, cwd=REPO)
    except subprocess.TimeoutExpired:
        return False, f"device probe hung >{PROBE_TIMEOUT_S}s (relay outage)"
    if proc.returncode != 0:
        tail = (proc.stderr or proc.stdout or "").strip().splitlines()
        return False, "device probe failed: " + (tail[-1] if tail else f"rc={proc.returncode}")
    return True, ""


def _parse_result_line(stdout: str):
    """Last stdout line that parses as a dict with our metric, else None."""
    for line in reversed(stdout.strip().splitlines()):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            obj = json.loads(line)
        except ValueError:
            continue
        if isinstance(obj, dict) and obj.get("metric") == "drin_eval_throughput":
            return obj
    return None


def main() -> int:
    """Parent mode: run the measurement in a fresh child process per attempt
    (fresh backend init — in-process retry cannot recover a failed relay
    client), bounded retries with backoff, parseable JSON no matter what."""
    last_error = "no attempts ran"
    for attempt in range(MAX_ATTEMPTS):
        if attempt:
            pause = BACKOFF_S[min(attempt - 1, len(BACKOFF_S) - 1)]
            log(f"bench: attempt {attempt} failed ({last_error.splitlines()[-1][:160]}); "
                f"retrying in {pause}s")
            time.sleep(pause)
        ok, why = _probe_device()
        if not ok:
            log(f"bench: {why}")
            last_error = why
            continue
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--attempt"],
                capture_output=True, text=True, timeout=ATTEMPT_TIMEOUT_S,
                cwd=REPO)
        except subprocess.TimeoutExpired:
            last_error = f"attempt timed out after {ATTEMPT_TIMEOUT_S}s"
            continue
        if proc.stderr:
            sys.stderr.write(proc.stderr)
            sys.stderr.flush()
        result = _parse_result_line(proc.stdout)
        if proc.returncode == 0 and result is not None:
            print(json.dumps(result))
            return 0
        tail = (proc.stderr or proc.stdout or "").strip().splitlines()
        last_error = "\n".join(tail[-12:]) if tail else f"rc={proc.returncode}, no output"
    # all attempts failed: still ONE parseable JSON line (VERDICT r3 #1)
    print(json.dumps({
        "metric": "drin_eval_throughput",
        "value": None,
        "unit": "mention-candidate pairs/sec/chip",
        "vs_baseline": None,
        "error": last_error[-800:],
    }))
    return 0


if __name__ == "__main__":
    if "--attempt" in sys.argv:
        run_attempt()
    elif "--probe" in sys.argv:
        run_probe()
    else:
        sys.exit(main())
