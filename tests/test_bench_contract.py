# -*- coding: utf-8 -*-
"""Driver-contract guards for bench.py.

The benchmark's ``vs_baseline`` column silently degrades to null if the
in-place reference measurement breaks (it did once: the pooled-cache batch
layout reached the reference model, which consumes raw token-level entity
features).  Pin the contract: the reference measurement must run and return
a positive pairs/s on a tiny batch, and the ours-vs-reference batch layouts
must stay consistent with each side's expectations.
"""

import os

import numpy as np
import pytest


def _bench(tmp_path, monkeypatch):
    import bench

    monkeypatch.setattr(bench, "B", 4)
    monkeypatch.setattr(bench, "BASELINE_CACHE", str(tmp_path / "cache.json"))
    return bench


def test_measure_reference_runs_in_place(tmp_path, monkeypatch):
    bench = _bench(tmp_path, monkeypatch)
    pps = bench.measure_reference()
    assert np.isfinite(pps) and pps > 0
    assert os.path.exists(bench.BASELINE_CACHE)
    # second call reads the cache (no torch re-run)
    assert bench.measure_reference() == pytest.approx(pps)


def test_parse_result_line_picks_metric_json():
    import bench

    out = ('warmup noise\n{"program": "calib_stream_read", "gb_per_s": 1}\n'
           '{"metric": "drin_eval_throughput", "value": 5.0, "unit": "u", '
           '"vs_baseline": null}\ntrailing')
    got = bench._parse_result_line(out)
    assert got == {"metric": "drin_eval_throughput", "value": 5.0,
                   "unit": "u", "vs_baseline": None}
    assert bench._parse_result_line("no json here\n{broken") is None


class _FakeProc:
    def __init__(self, rc, stdout="", stderr=""):
        self.returncode, self.stdout, self.stderr = rc, stdout, stderr


_PROBE_OK = _FakeProc(0, stdout="devices: [...]\nprobe: 1.0")


def test_main_retries_then_succeeds(monkeypatch, capsys):
    """A transient backend-init failure (round 3's BENCH artifact) must be
    retried in a fresh child process; the parent relays the child's JSON."""
    import bench

    ok = ('{"metric": "drin_eval_throughput", "value": 9.0, "unit": "u", '
          '"vs_baseline": 2.0, "calibration": {"stream_gb_s": 300.0}}')
    attempts = []

    def fake_run(cmd, **kw):
        if "--probe" in cmd:
            return _PROBE_OK
        attempts.append(cmd)
        if len(attempts) < 3:
            return _FakeProc(1, stderr="RuntimeError: Unable to initialize "
                                        "backend 'axon': UNAVAILABLE")
        return _FakeProc(0, stdout=ok)

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench.main() == 0
    assert len(attempts) == 3 and all("--attempt" in c for c in attempts)
    last = capsys.readouterr().out.strip().splitlines()[-1]
    import json

    assert json.loads(last)["value"] == 9.0


def test_main_final_emit_blocks_watchdog_signals(monkeypatch, capsys):
    """The final artifact line must print with SIGTERM/SIGINT BLOCKED — a
    watchdog signal landing between state['done']=True and the print would
    otherwise make the handler skip its null artifact and exit with zero
    parseable lines.  main() restores a clean mask afterwards (in-process
    callers keep normal signal delivery)."""
    import json
    import signal as _signal

    import bench

    ok = ('{"metric": "drin_eval_throughput", "value": 9.0, "unit": "u", '
          '"vs_baseline": 2.0}')
    monkeypatch.setattr(
        bench.subprocess, "run",
        lambda cmd, **kw: _PROBE_OK if "--probe" in cmd
        else _FakeProc(0, stdout=ok))
    masks = []
    real_dumps = bench.json.dumps

    def spy_dumps(obj):
        masks.append(_signal.pthread_sigmask(_signal.SIG_BLOCK, set()))
        return real_dumps(obj)

    monkeypatch.setattr(bench.json, "dumps", spy_dumps)
    assert bench.main() == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["value"] == 9.0
    assert {_signal.SIGTERM, _signal.SIGINT} <= masks[-1]
    cur = _signal.pthread_sigmask(_signal.SIG_BLOCK, set())
    assert _signal.SIGTERM not in cur and _signal.SIGINT not in cur


def test_main_failure_still_prints_parseable_json(monkeypatch, capsys):
    """All attempts exhausted -> ONE JSON line with value null + error field
    (the artifact must never be a bare stack trace again)."""
    import json

    import bench

    monkeypatch.setattr(
        bench.subprocess, "run",
        lambda cmd, **kw: _PROBE_OK if "--probe" in cmd
        else _FakeProc(1, stderr="boom\nUNAVAILABLE"))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench.main() == 0
    last = capsys.readouterr().out.strip().splitlines()[-1]
    obj = json.loads(last)
    assert obj["metric"] == "drin_eval_throughput"
    assert obj["value"] is None and obj["vs_baseline"] is None
    assert "UNAVAILABLE" in obj["error"]


def test_main_timeout_is_an_attempt_failure(monkeypatch, capsys):
    """A hung measurement (TimeoutExpired) consumes one attempt, not the
    parent."""
    import json

    import bench

    def fake_run(cmd, **kw):
        if "--probe" in cmd:
            return _PROBE_OK
        raise bench.subprocess.TimeoutExpired(cmd, kw.get("timeout", 0))

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench.main() == 0
    obj = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert obj["value"] is None and "timed out" in obj["error"]


def test_run_attempt_emits_calibration_and_ratio(monkeypatch, capsys):
    """The child's JSON line carries the session-calibration probes
    (VERDICT r3 #7) and computes vs_baseline; a calibration failure must
    not sink the headline value."""
    import json

    import bench

    monkeypatch.setattr(bench, "measure_calibration",
                        lambda: {"stream_gb_s": 300.0})
    monkeypatch.setattr(bench, "measure_ours", lambda: 123.0)
    monkeypatch.setattr(bench, "measure_reference", lambda: 10.0)
    monkeypatch.setattr(bench, "measure_secondary",
                        lambda t_end, on_update=None: ({"train_step_ms": 2.5}, {}))
    bench.run_attempt()
    obj = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert obj["value"] == 123.0 and obj["vs_baseline"] == 12.3
    assert obj["calibration"] == {"stream_gb_s": 300.0}
    assert obj["secondary"] == {"train_step_ms": 2.5}
    assert "secondary_notes" not in obj  # empty notes stay off the artifact

    def boom():
        raise RuntimeError("probe died")

    monkeypatch.setattr(bench, "measure_calibration", boom)
    bench.run_attempt()
    obj = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert obj["value"] == 123.0 and "error" in obj["calibration"]


def test_run_attempt_headline_precedes_secondary(monkeypatch, capsys):
    """The headline JSON line must already be on stdout BEFORE the secondary
    pass starts (the parent salvages it on a mid-secondary timeout), and a
    secondary failure must not sink the headline (VERDICT r4 #4)."""
    import json

    import bench

    monkeypatch.setattr(bench, "measure_calibration", lambda: {})
    monkeypatch.setattr(bench, "measure_ours", lambda: 50.0)
    monkeypatch.setattr(bench, "measure_reference", lambda: 5.0)
    seen_lines = []

    def failing_secondary(t_end, on_update=None):
        seen_lines.extend(capsys.readouterr().out.strip().splitlines())
        raise RuntimeError("relay died mid-secondary")

    monkeypatch.setattr(bench, "measure_secondary", failing_secondary)
    bench.run_attempt()
    # the headline line was out before secondary ran
    assert any(json.loads(l)["value"] == 50.0 for l in seen_lines
               if l.startswith("{"))
    final = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert final["value"] == 50.0
    # the metrics dict stays numeric-or-null (empty here: nothing completed
    # before the failure); the error rides secondary_notes
    assert final["secondary"] == {}
    assert "relay died" in final["secondary_notes"]["fatal"]


def test_run_attempt_reemits_after_each_secondary_program(monkeypatch, capsys):
    """Every secondary program completion re-prints the enriched line, so a
    hard kill mid-pass (SIGKILL/timeout — no exception path runs) leaves the
    already-measured entries on stdout for the parent to salvage."""
    import json

    import bench

    monkeypatch.setattr(bench, "measure_calibration", lambda: {})
    monkeypatch.setattr(bench, "measure_ours", lambda: 50.0)
    monkeypatch.setattr(bench, "measure_reference", lambda: 5.0)

    def fake_secondary(t_end, on_update=None):
        on_update({"train_step_ms": 2.5}, {})
        on_update({"train_step_ms": 2.5, "rank_b64_ms": None},
                  {"errors": {"rank_b64_ms": "RuntimeError('x')"}})
        raise RuntimeError("killed mid third program")

    monkeypatch.setattr(bench, "measure_secondary", fake_secondary)
    bench.run_attempt()
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
             if l.startswith("{")]
    # headline first, then one enriched line per completed program
    assert "secondary" not in lines[0]
    assert lines[1]["secondary"] == {"train_step_ms": 2.5}
    assert "secondary_notes" not in lines[1]
    assert lines[2]["secondary"]["rank_b64_ms"] is None
    assert "rank_b64_ms" in lines[2]["secondary_notes"]["errors"]
    # metric entries stay numeric-or-null — bookkeeping never pollutes them
    assert all(v is None or isinstance(v, float)
               for l in lines[1:3] for v in l["secondary"].values())
    # the exception path's final line KEEPS the partial numeric entries
    # (never overwrites them with an error blob) and records the fatal
    # error in secondary_notes
    assert lines[-1]["secondary"] == lines[2]["secondary"]
    assert "killed mid third" in lines[-1]["secondary_notes"]["fatal"]
    assert "rank_b64_ms" in lines[-1]["secondary_notes"]["errors"]


def test_measure_secondary_skips_everything_on_spent_budget(monkeypatch):
    """With the attempt budget already spent, every program is skipped: all
    metric entries null, names listed in notes['skipped'], on_update called
    per program — and the metrics dict holds ONLY metric keys."""
    import time as _time

    import bench

    updates = []
    sec, notes = bench.measure_secondary(
        _time.monotonic() - 1.0, on_update=lambda s, n: updates.append(len(s)))
    assert set(sec) == {"train_step_ms", "retrieval_exact_ms",
                        "retrieval_int8_ms", "rank_b64_ms",
                        "rank_int8_b64_ms", "rank_fused_b64_ms"}
    assert all(v is None for v in sec.values())
    assert notes["skipped"] == list(sec)
    assert updates == list(range(1, len(sec) + 1))


def _fake_clock(monkeypatch, bench):
    """Replace bench's time source with a controllable clock whose sleep()
    advances it; subprocess fakes advance it by their timeout kwarg."""
    clk = {"t": 1000.0}
    monkeypatch.setattr(bench.time, "monotonic", lambda: clk["t"])
    monkeypatch.setattr(bench.time, "sleep",
                        lambda s: clk.__setitem__("t", clk["t"] + s))
    return clk


def test_main_total_budget_bounds_schedule(monkeypatch, capsys):
    """VERDICT r4 #1a: a retry schedule that would exceed the total budget
    must stop and emit the null artifact BEFORE the budget runs out — never
    ride the backoff past an external watchdog (round 4's rc=124)."""
    import json

    import bench

    clk = _fake_clock(monkeypatch, bench)
    t0 = clk["t"]
    monkeypatch.setattr(bench, "TOTAL_BUDGET_S", 400.0)
    probes = []

    def fake_run(cmd, **kw):
        # relay down: every probe hangs for its full timeout
        clk["t"] += kw.get("timeout", 0)
        if "--probe" in cmd:
            probes.append(cmd)
            raise bench.subprocess.TimeoutExpired(cmd, kw.get("timeout", 0))
        raise AssertionError("full attempt launched during outage")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    assert bench.main() == 0
    assert clk["t"] - t0 <= 400.0, "schedule overran the total budget"
    assert 0 < len(probes) < bench.MAX_ATTEMPTS, (
        "budget gate never pruned the schedule")
    obj = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert obj["metric"] == "drin_eval_throughput"
    assert obj["value"] is None and "relay outage" in obj["error"]


def test_main_attempt_timeout_clamped_to_budget(monkeypatch, capsys):
    """The per-attempt subprocess timeout must never extend past the total
    deadline: with ~300s of budget left the child gets ~300s, not the full
    540s ATTEMPT_TIMEOUT_S."""
    import json

    import bench

    clk = _fake_clock(monkeypatch, bench)
    monkeypatch.setattr(bench, "TOTAL_BUDGET_S", 320.0)
    seen = {}

    def fake_run(cmd, **kw):
        if "--probe" in cmd:
            clk["t"] += 5
            return _PROBE_OK
        seen["timeout"] = kw["timeout"]
        clk["t"] += kw["timeout"]
        raise bench.subprocess.TimeoutExpired(cmd, kw["timeout"])

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    assert bench.main() == 0
    assert seen["timeout"] <= 320.0 - 15
    obj = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert obj["value"] is None and "timed out" in obj["error"]


def test_main_sigterm_midrun_emits_artifact(monkeypatch, capsys):
    """VERDICT r4 #1b: a driver-side SIGTERM mid-backoff must still leave a
    parseable artifact (the handler prints the null JSON before exiting)."""
    import json
    import signal as _signal

    import bench

    exited = []
    monkeypatch.setattr(bench, "_exit", lambda rc: (exited.append(rc),
                                                    (_ for _ in ()).throw(SystemExit(rc))))
    monkeypatch.setattr(
        bench.subprocess, "run",
        lambda cmd, **kw: _PROBE_OK if "--probe" in cmd
        else _FakeProc(1, stderr="UNAVAILABLE: relay flaked"))

    def sleep_then_sigterm(s):
        # simulate the driver's kill landing during a backoff sleep
        handler = _signal.getsignal(_signal.SIGTERM)
        handler(_signal.SIGTERM, None)

    monkeypatch.setattr(bench.time, "sleep", sleep_then_sigterm)
    with pytest.raises(SystemExit):
        bench.main()
    assert exited == [0]
    obj = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert obj["metric"] == "drin_eval_throughput"
    assert obj["value"] is None
    assert "signal" in obj["error"] and "UNAVAILABLE" in obj["error"]
    # the handler was restored on exit (pytest's process must not keep it)
    assert _signal.getsignal(_signal.SIGTERM) is not sleep_then_sigterm


def test_main_salvages_headline_from_timed_out_child(monkeypatch, capsys):
    """A child killed mid-secondary (TimeoutExpired) already printed the
    headline line; the parent must salvage it from the partial stdout
    instead of burning another attempt."""
    import json

    import bench

    partial = ('{"metric": "drin_eval_throughput", "value": 7.5, "unit": "u", '
               '"vs_baseline": 1.5, "calibration": {}}\n')

    def fake_run(cmd, **kw):
        if "--probe" in cmd:
            return _PROBE_OK
        raise bench.subprocess.TimeoutExpired(cmd, kw["timeout"], output=partial)

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench.main() == 0
    obj = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert obj["value"] == 7.5


def test_attempt_budget_env_reaches_child(monkeypatch):
    """The parent passes the clamped attempt budget to the child via env so
    the secondary pass can self-limit under it."""
    import bench

    envs = []

    def fake_run(cmd, **kw):
        if "--probe" in cmd:
            return _PROBE_OK
        envs.append(kw.get("env", {}))
        return _FakeProc(0, stdout='{"metric": "drin_eval_throughput", '
                                   '"value": 1.0, "unit": "u", "vs_baseline": null}')

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    assert bench.main() == 0
    assert envs and float(envs[0]["BENCH_ATTEMPT_BUDGET_S"]) <= bench.ATTEMPT_TIMEOUT_S


def test_main_relay_outage_skips_full_attempts(monkeypatch, capsys):
    """A downed relay hangs even jax.devices(); the probe gate must convert
    that into a cheap attempt failure WITHOUT launching the 540s measurement
    (observed live: a 9-minute outage consumed a whole attempt window)."""
    import json

    import bench

    launched = []

    def fake_run(cmd, **kw):
        if "--probe" in cmd:
            raise bench.subprocess.TimeoutExpired(cmd, kw.get("timeout", 0))
        launched.append(cmd)
        return _FakeProc(0, stdout="")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench.main() == 0
    assert not launched, "full attempt launched despite a failing probe"
    obj = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert obj["value"] is None and "relay outage" in obj["error"]


def test_reference_batch_is_token_level(monkeypatch):
    """The reference consumes [B, C, Le, D] entity text (drin/data.py:89-93);
    the pooled-cache layout must never be handed to it."""
    import __graft_entry__ as g
    from drin_tpu.common.config import make_config

    cfg = make_config("drin", "wikimel", dataset_root="/tmp/unused",
                      cache_entity_pooling=False)
    feats, _ = g._random_drin_batch(cfg, B=2, rng=np.random.default_rng(0))
    etf, etm = feats[7], feats[8]
    assert etf.ndim == 4 and etf.shape[2] == cfg.max_entity_attr_token_len
    assert etm.shape == etf.shape[:3]  # per-candidate token masks


def test_daemon_client_pool_drains_and_survives_stuck_workers():
    """benchmarks/_timing.daemon_client_pool (the serving benchmark's
    concurrent-client driver): runs call() exactly n_req times across daemon
    threads, propagates worker exceptions, and RAISES instead of joining
    forever when workers wedge in a device call on a dead relay — a
    cf.ThreadPoolExecutor would block the context exit AND interpreter
    shutdown on its non-daemon workers (CLAUDE.md pool rule)."""
    import threading
    import time as _time

    from benchmarks._timing import daemon_client_pool

    calls = []
    lock = threading.Lock()

    def call():
        with lock:
            calls.append(1)

    daemon_client_pool(4, 37, call)
    assert len(calls) == 37

    t0 = _time.monotonic()
    with pytest.raises(RuntimeError, match="did not drain"):
        daemon_client_pool(2, 4, lambda: _time.sleep(60), timeout_s=1.0)
    assert _time.monotonic() - t0 < 10  # bounded, not a 60s join

    def boom():
        raise ValueError("client fault")

    with pytest.raises(ValueError, match="client fault"):
        daemon_client_pool(2, 4, boom, timeout_s=10)
