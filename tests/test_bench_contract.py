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
    bench.run_attempt()
    obj = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert obj["value"] == 123.0 and obj["vs_baseline"] == 12.3
    assert obj["calibration"] == {"stream_gb_s": 300.0}

    def boom():
        raise RuntimeError("probe died")

    monkeypatch.setattr(bench, "measure_calibration", boom)
    bench.run_attempt()
    obj = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert obj["value"] == 123.0 and "error" in obj["calibration"]


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
