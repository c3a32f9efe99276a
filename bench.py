# -*- coding: utf-8 -*-
"""Benchmark: DRIN eval throughput (mention-candidate pairs/sec/chip).

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "calibration": {...}, "secondary": {...}}

The workload is the reference's headline eval configuration (SURVEY §6):
WikiMEL shapes — batch 64, C=101 candidates, 128-token mention features,
64-token entity attributes, 49 ResNet regions — full DRIN forward.

``vs_baseline`` compares against the reference PyTorch implementation run in
place (/root/reference, eager torch on this host's CPU — the only hardware
both can run on here; the reference's own GPU numbers are unpublished,
BASELINE.md).  The reference measurement is cached in
``baseline_measured.json`` so repeated bench runs skip it.

Resilience (VERDICT r3 #1): the TPU sits behind a relay whose backend init
occasionally fails transiently.  The measurement therefore runs in a CHILD
process — a fresh process is the only reliable way to retry backend init —
with bounded retries and backoff in the parent.  On final failure the parent
still prints the ONE JSON line with ``"value": null`` and an ``"error"``
field so the artifact stays parseable.

Hard deadline + signal safety (VERDICT r4 #1): external watchdogs bound
every retry schedule — the round-4 artifact was rc=124 because a widened
backoff schedule outlived the driver's timeout and the fail-safe line never
printed.  The parent now (a) holds a TOTAL wall-clock budget
(``BENCH_TOTAL_BUDGET_S``, default 900s) checked before every sleep, probe
and attempt — when the remaining budget cannot fit another probe + minimal
attempt it stops and emits the null artifact immediately; and (b) installs
SIGTERM/SIGINT handlers that print the null artifact (with the last error)
before exiting, so even a driver-side kill leaves a parseable line.

Secondary scoreboard (VERDICT r4 #4): the same JSON line carries a
``"secondary"`` dict — train-step ms (B=64, C=101), exact/int8 retrieval ms
(B=16, 109k entities), and bf16/int8-store B=64 rank ms — each measured via
the chained methodology and independently skippable (per-program failure or
an exhausted attempt budget nulls that entry, never the headline; the child
prints the headline line BEFORE starting secondary work and re-prints the
enriched line after EVERY secondary program, so a mid-secondary kill loses
at most the in-flight program).  ``secondary`` holds only numeric entries;
skip lists / error strings ride the sibling ``secondary_notes`` field.

Session calibration (VERDICT r3 #7): the shared chip's throughput varies
±50% between sessions for model programs while simple stream/matmul probes
stay stable.  Each run embeds those probe results in a ``"calibration"``
field so cross-round deltas can be separated from co-tenancy weather
(BASELINE.md roofline section explains how to read it).
"""

from __future__ import annotations

import json
import os
import signal
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

METRIC = "drin_eval_throughput"
UNIT = "mention-candidate pairs/sec/chip"

MAX_ATTEMPTS = 7
ATTEMPT_TIMEOUT_S = 540  # compile ~20-40s + timed section; generous for relay
ATTEMPT_MIN_S = 240  # below this a fresh attempt cannot finish the headline
PROBE_TIMEOUT_S = 150  # backend init + one trivial device op
BACKOFF_S = (10, 30, 60, 120, 240, 240)
# Total wall-clock budget for the WHOLE parent schedule.  The driver runs
# bench.py under its own timeout; the round-4 lesson is that the retry
# schedule must fit UNDER that external watchdog with the artifact printed
# before the budget runs out, not after the last retry.  15 min default sits
# comfortably inside any plausible driver window while still riding out a
# mid-length relay outage (observed outages: 9+ min).
TOTAL_BUDGET_S = float(os.environ.get("BENCH_TOTAL_BUDGET_S", "900"))

# v5e spec ceilings (BASELINE.md roofline section); the probes report what
# THIS session actually sustains against them.  ONE definition, shared with
# roofline.py (benchmarks/_timing).
from benchmarks._timing import V5E_PEAK_BW as PEAK_BW  # noqa: E402
from benchmarks._timing import V5E_PEAK_FLOPS as PEAK_FLOPS  # noqa: E402

_exit = os._exit  # test seam: the signal handler must be interceptable


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_calibration() -> dict:
    """Session-quality probes: bf16 stream-read bandwidth + 4096^2 matmul
    throughput, both via the chained-call methodology.  Probe BODIES live in
    benchmarks/_timing (shared with roofline.py's empirical-ceiling probes,
    so the two can never drift apart and cross-round calibration stays
    comparable).  Stable across sessions (~327 GB/s / ~89 TFLOP/s
    historically) while model programs swing ±50% with co-tenancy — so a
    regression in ``value`` with unchanged calibration is code, and vice
    versa."""
    from benchmarks._timing import matmul_flops, stream_read_bw

    # cheap variants (256MB / Kc=6 / 3 iters): the calibration must cost
    # seconds of the attempt budget, not minutes
    stream_bw = stream_read_bw(size_mb=256, Kc=6, iters=3)
    mm_flops = matmul_flops(n=4096, Kc=6, iters=3)
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


def measure_secondary(t_end: float, on_update=None) -> "tuple[dict, dict]":
    """Secondary per-program scoreboard (VERDICT r4 #4): the non-headline
    numbers BASELINE.md previously maintained by hand from ad-hoc sessions,
    re-measured every round in the SAME session as the headline so a
    regression in any of them is visible in BENCH_r{N}.json.

    Programs (all chained-methodology device time, BASELINE.md rows):
      * ``train_step_ms`` — full DRIN train step, B=64 C=101, bf16
        (forward + triplet loss + backward + Adam + metric counters);
      * ``retrieval_exact_ms`` / ``retrieval_int8_ms`` — stage-1 retrieval
        over the full 109,557-entity table at B=16 (exact scan + top_k vs
        int8 coarse scan + shortlist + exact rescore, serve.retrieve modes);
      * ``rank_b64_ms`` / ``rank_int8_b64_ms`` / ``rank_fused_b64_ms`` —
        full DRIN rank with in-HBM candidate gather over the bf16, the
        int8-quantized (XLA gather+dequant), and the fused-Pallas-kernel
        DeviceEntityStore (ops/pallas/gather.py) — a per-round three-way
        store A/B in one session.

    Each program is gated on the remaining attempt budget and individually
    wrapped — one failure nulls that entry only.  Returns ``(sec, notes)``:
    ``sec`` holds ONLY metric keys (float ms per batch, or null), so a
    round-over-round consumer can iterate its items numerically; skip lists
    and error strings live in the separate ``notes`` dict.  ``on_update`` (if
    given) is called as ``on_update(sec, notes)`` after EVERY program so the
    caller can re-emit a progressively enriched artifact — a kill mid-pass
    then loses at most the in-flight program, not the measured ones."""
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from benchmarks._tables import N_ENTITIES
    from benchmarks._timing import timed_chain
    from drin_tpu.common.config import make_config
    from drin_tpu.models.drin import DRIN

    sec: dict = {}
    notes: dict = {}
    cfg = make_config("drin", "wikimel", dataset_root="/tmp/unused",
                      compute_dtype="bfloat16")
    D = cfg.bert_embed_dim
    rng = np.random.default_rng(0)
    dt16 = jnp.bfloat16
    cast16 = lambda x: (jnp.asarray(x, dt16)
                        if np.issubdtype(np.asarray(x).dtype, np.floating)
                        else jnp.asarray(x))

    def run(name, est_s, fn):
        if t_end - time.monotonic() < est_s:
            log(f"secondary {name}: skipped (attempt budget; need ~{est_s}s)")
            sec[name] = None
            notes.setdefault("skipped", []).append(name)
        else:
            try:
                sec[name] = round(fn() * 1e3, 3)
                log(f"secondary {name}: {sec[name]} ms")
            except Exception as e:  # one program must never sink the others
                log(f"secondary {name} failed: {e!r}")
                sec[name] = None
                notes.setdefault("errors", {})[name] = repr(e)[:160]
        if on_update is not None:
            on_update(sec, notes)

    def train_step():
        from drin_tpu.train import metrics as M
        from drin_tpu.train.trainer import build_step_fns, create_train_state

        model = DRIN(cfg)
        feats, answer = g._random_drin_batch(cfg, B=B, rng=np.random.default_rng(0))
        params = model.init(jax.random.key(0), tuple(x[:2] for x in feats))["params"]
        state, tx = create_train_state(params, cfg)
        fns = build_step_fns(lambda p, f: model.apply({"params": p}, f), cfg, tx)
        dev = tuple(jax.device_put(cast16(np.asarray(x))) for x in feats) + (
            jax.device_put(np.asarray(answer)),)
        valid = jax.device_put(np.ones((B,), np.float32))
        mstate = M.init_state(cfg.metrics_topk)
        state, loss, mstate = fns.train_step(state, dev, valid, mstate)  # compile
        float(loss)
        steps = 12
        t0 = time.perf_counter()
        for _ in range(steps):  # chained through the donated state
            state, loss, mstate = fns.train_step(state, dev, valid, mstate)
        float(loss)
        return (time.perf_counter() - t0) / steps

    run("train_step_ms", 120, train_step)

    # shared fixtures for the serving-side programs, built lazily so a
    # budget-skipped retrieval doesn't pay for tables it never scans
    shared: dict = {}

    def norm_table():
        if "norm" not in shared:
            t = jax.random.normal(jax.random.key(1), (N_ENTITIES, D), dt16)
            shared["norm"] = jax.jit(
                lambda t: t / jnp.linalg.norm(t, axis=-1, keepdims=True))(t)
        return shared["norm"]

    # retrieval rows share the chain implementation and exact-scan body
    # with benchmarks/serving.py's stage-1 sweeps (same no-drift contract
    # as the rank rows)
    from benchmarks._timing import exact_retrieval_body, retrieve_chain_time

    def retrieval_exact():
        table = norm_table()
        q0 = jax.device_put(jnp.asarray(rng.standard_normal((16, D)), dt16))
        return retrieve_chain_time(exact_retrieval_body, q0, (table,),
                                   K=4, iters=10)

    run("retrieval_exact_ms", 90, retrieval_exact)

    def retrieval_int8():
        from drin_tpu.serve import quantize_rows, retrieve_quantized

        table = norm_table()
        qt, qscales = jax.jit(quantize_rows)(table)
        q0 = jax.device_put(jnp.asarray(rng.standard_normal((16, D)), jnp.float32))
        body = lambda q, table, qt, scales: retrieve_quantized(
            q, qt, scales, table, 100, 400)
        return retrieve_chain_time(body, q0, (table, qt, qscales),
                                   K=4, iters=10)

    run("retrieval_int8_ms", 90, retrieval_int8)

    def rank(mode: str):
        from benchmarks._tables import (make_device_rank_batch,
                                        make_full_scale_store,
                                        make_full_scale_store_fused,
                                        make_full_scale_store_quantized)
        from benchmarks._timing import rank_chain_time

        # model/params/batch are mode-independent — built once, shared by
        # the three store A/Bs; the fused slab packs from the int8 store
        # measured just before it (same data, saves one fixture rebuild —
        # the budget skip round 5's rehearsal hit)
        if "rank_fix" not in shared:
            model = DRIN(cfg)
            feats, _ = g._random_drin_batch(cfg, B=B, rng=np.random.default_rng(0))
            params = model.init(jax.random.key(0), tuple(x[:2] for x in feats))["params"]
            shared["rank_fix"] = {
                "model": model,
                "params": jax.device_put(jax.tree.map(cast16, params)),
                "dev": make_device_rank_batch(
                    cfg, B, np.random.default_rng(0), N_ENTITIES)}
        fix = shared["rank_fix"]
        model, dev_params, dev = fix["model"], fix["params"], fix["dev"]
        if mode == "int8":
            store = shared["rank_q"] = make_full_scale_store_quantized(cfg, N_ENTITIES)
        elif mode == "fused":
            store = make_full_scale_store_fused(cfg, N_ENTITIES,
                                                base=shared.pop("rank_q", None))
        else:
            store = make_full_scale_store(cfg, N_ENTITIES)
        feats_fn = store.drin_feats_fn()
        tables = feats_fn.tables
        # shared chain implementation (benchmarks/_timing.rank_chain_time):
        # the serving benchmark's store A/Bs time the identical program shape
        dt = rank_chain_time(lambda p, f: model.apply({"params": p}, f),
                             feats_fn, dev_params, dev, tables, K=4, iters=8)
        del store, tables
        return dt

    run("rank_b64_ms", 100, lambda: rank("bf16"))
    run("rank_int8_b64_ms", 100, lambda: rank("int8"))
    # int8 store served through the fused Pallas gather+dequant kernel
    # (ops/pallas/gather.py): same quantized data as rank_int8_b64_ms, so
    # the pair is a per-round kernel-vs-XLA A/B.  The cheap estimate (70s)
    # only holds when it inherits rank_int8's quantized store; if that row
    # was skipped or failed before building it, the fused fixture rebuilds
    # the full-scale quantized store itself — charge the full rank-row cost
    # so the budget gate cannot be overrun by the silent rebuild.
    run("rank_fused_b64_ms", 70 if "rank_q" in shared else 170,
        lambda: rank("fused"))
    return sec, notes


def run_attempt() -> None:
    """One full measurement (child-process mode): calibration probes, our
    throughput, the cached reference baseline, then the secondary programs.
    Prints the headline JSON line BEFORE the secondary pass (so a timeout or
    kill mid-secondary still leaves a parseable result in this process's
    stdout for the parent to salvage), then reprints it with ``secondary``
    attached."""
    t_end = (time.monotonic()
             + float(os.environ.get("BENCH_ATTEMPT_BUDGET_S", str(ATTEMPT_TIMEOUT_S)))
             - 20)  # leave margin so we print before the parent's timeout
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
        "metric": METRIC,
        "value": round(ours, 1),
        "unit": UNIT,
        "vs_baseline": round(ours / baseline, 2) if baseline else None,
        "calibration": calibration,
    }
    print(json.dumps(result), flush=True)  # headline is now safe on stdout

    def emit_partial(sec, notes):
        # progressively enriched line after EVERY secondary program: the
        # parent keeps the LAST parseable line, so a kill mid-pass loses at
        # most the in-flight program, never the already-measured entries
        result["secondary"] = dict(sec)
        if notes:
            result["secondary_notes"] = dict(notes)
        print(json.dumps(result), flush=True)

    try:
        sec, notes = measure_secondary(t_end, on_update=emit_partial)
        result["secondary"] = sec
        if notes:
            result["secondary_notes"] = notes
    except Exception as e:  # secondary must never sink the headline
        # ``secondary`` keeps only the numeric entries emit_partial already
        # attached (possibly none); the error rides ``secondary_notes`` so
        # the metrics dict stays numeric-or-null per the module contract
        log(f"secondary measurements failed: {e!r}")
        result.setdefault("secondary", {})
        result.setdefault("secondary_notes", {})["fatal"] = repr(e)[:200]
    print(json.dumps(result), flush=True)


def run_probe() -> None:
    """Child --probe mode: backend init + one trivial device op.  A downed
    relay hangs even ``jax.devices()`` for minutes, so the parent gates each
    full attempt on this cheap probe instead of burning the 540s attempt
    timeout discovering the outage."""
    import jax

    print("devices:", jax.devices(), flush=True)
    print("probe:", float(jax.jit(lambda: jax.numpy.zeros(()) + 1.0)()), flush=True)


def _probe_device(timeout_s: float = PROBE_TIMEOUT_S) -> "tuple[bool, str]":
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--probe"],
            capture_output=True, text=True, timeout=timeout_s, cwd=REPO)
    except subprocess.TimeoutExpired:
        return False, f"device probe hung >{timeout_s:.0f}s (relay outage)"
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
        if isinstance(obj, dict) and obj.get("metric") == METRIC:
            return obj
    return None


def main() -> int:
    """Parent mode: run the measurement in a fresh child process per attempt
    (fresh backend init — in-process retry cannot recover a failed relay
    client), bounded retries with backoff, a hard total wall-clock budget,
    and parseable JSON no matter what — including a driver-side SIGTERM."""
    deadline = time.monotonic() + TOTAL_BUDGET_S
    remaining = lambda: deadline - time.monotonic()
    state = {"error": "no attempts ran", "done": False}

    def null_artifact(extra: str = "") -> None:
        print(json.dumps({
            "metric": METRIC,
            "value": None,
            "unit": UNIT,
            "vs_baseline": None,
            "error": (state["error"] + extra)[-800:],
        }), flush=True)

    def on_signal(signum, frame):
        # An external watchdog fired mid-schedule: the artifact must land
        # BEFORE we die (round 4's rc=124 left no parseable line).
        if not state["done"]:
            null_artifact(f" [killed by signal {signum} mid-schedule]")
        _exit(0)

    prev_handlers = {sig: signal.signal(sig, on_signal)
                     for sig in (signal.SIGTERM, signal.SIGINT)}

    def emit_final(line_fn) -> int:
        # Atomic final emit: block the watchdog signals BEFORE flipping
        # state['done'] and printing, so a SIGTERM can never land between
        # the flip and the print (where the handler would skip its null
        # artifact and the round ends with zero parseable lines).  The
        # process exits right after, so the signals are never unblocked.
        signal.pthread_sigmask(signal.SIG_BLOCK,
                               {signal.SIGTERM, signal.SIGINT})
        state["done"] = True
        line_fn()
        # the caller's finally unblocks: by then done=True, so a deferred
        # signal can at worst kill the process AFTER the line landed
        return 0

    try:
        for attempt in range(1, MAX_ATTEMPTS + 1):
            if attempt > 1:
                pause = BACKOFF_S[min(attempt - 2, len(BACKOFF_S) - 1)]
                log(f"bench: attempt {attempt - 1} failed "
                    f"({state['error'].splitlines()[-1][:160]}); retrying in {pause}s")
                if remaining() < pause + 30 + ATTEMPT_MIN_S:
                    log("bench: total budget cannot fit another sleep + probe "
                        "+ attempt; emitting the artifact now")
                    break
                time.sleep(pause)
            probe_budget = min(PROBE_TIMEOUT_S, remaining() - ATTEMPT_MIN_S)
            if probe_budget < 20:
                log("bench: total budget exhausted before another probe")
                break
            ok, why = _probe_device(probe_budget)
            if not ok:
                log(f"bench: {why}")
                state["error"] = why
                continue
            attempt_budget = min(ATTEMPT_TIMEOUT_S, remaining() - 15)
            if attempt_budget < ATTEMPT_MIN_S:
                log("bench: total budget too small for a full attempt")
                break
            env = dict(os.environ, BENCH_ATTEMPT_BUDGET_S=str(int(attempt_budget)))
            rc: "int | None"
            try:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--attempt"],
                    capture_output=True, text=True, timeout=attempt_budget,
                    cwd=REPO, env=env)
                out, err, rc = proc.stdout or "", proc.stderr or "", proc.returncode
            except subprocess.TimeoutExpired as e:
                # the child prints the headline line before secondary work —
                # salvage it from the partial stdout if it got that far
                dec = lambda s: s.decode(errors="replace") if isinstance(s, bytes) else (s or "")
                out, err, rc = dec(e.stdout), dec(e.stderr), None
            if err:
                sys.stderr.write(err)
                sys.stderr.flush()
            result = _parse_result_line(out)
            if result is not None and result.get("value") is not None:
                if rc != 0:
                    log("bench: child died after the headline line "
                        f"(rc={rc}); secondary measurements truncated")
                return emit_final(
                    lambda: print(json.dumps(result), flush=True))
            if rc is None:
                state["error"] = f"attempt timed out after {attempt_budget:.0f}s"
            else:
                tail = (err or out).strip().splitlines()
                state["error"] = ("\n".join(tail[-12:]) if tail
                                  else f"rc={rc}, no output")
        # attempts/budget exhausted: still ONE parseable JSON line
        return emit_final(null_artifact)
    finally:
        for sig, h in prev_handlers.items():
            signal.signal(sig, h)
        # drop emit_final's mask so an in-process caller (tests) keeps a
        # clean signal state; any deferred watchdog signal now fires with
        # the restored handler, after the artifact is already on stdout
        signal.pthread_sigmask(signal.SIG_UNBLOCK,
                               {signal.SIGTERM, signal.SIGINT})


if __name__ == "__main__":
    if "--attempt" in sys.argv:
        run_attempt()
    elif "--probe" in sys.argv:
        run_probe()
    else:
        sys.exit(main())
