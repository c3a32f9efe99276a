# -*- coding: utf-8 -*-
"""Native host-runtime tests: the threaded C++ gather (drin_tpu/native).

Covers the two properties the input pipeline depends on:

  * correctness — the ctypes path returns exactly ``table[rows]`` (the
    reference's per-example gather-join semantics, drin/data.py:85-93);
  * thread safety — a ThreadSanitizer-instrumented stress run over the
    threaded gather exits clean (race detection is a first-class subsystem
    here; the reference has none, SURVEY.md §5.2).
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

import drin_tpu.native as native

NATIVE_DIR = os.path.dirname(os.path.abspath(native.__file__))


def _built_lib():
    if not native.native_available():
        r = subprocess.run(["make", "-C", NATIVE_DIR], capture_output=True, text=True)
        if r.returncode != 0:
            pytest.skip(f"native lib build failed: {r.stderr[-500:]}")
        # reset the module's load cache so the fresh .so is picked up
        native._TRIED = False
        native._LIB = None
    if not native.native_available():
        pytest.skip("native lib unavailable")


@pytest.mark.parametrize("dtype", [np.float32, np.float16, np.int64])
def test_gather_rows_matches_numpy(dtype):
    """The native threaded path must byte-match numpy fancy-indexing (the
    size thresholds in gather_rows route big gathers to C++)."""
    _built_lib()
    rng = np.random.default_rng(0)
    table = rng.standard_normal((700, 96)).astype(dtype)  # row 384B: native
    rows = rng.integers(0, 700, size=(8, 33)).astype(np.int64)
    out = native.gather_rows(table, rows)
    np.testing.assert_array_equal(out, table[rows])
    assert out.shape == rows.shape + table.shape[1:]
    # below-threshold gathers use numpy and must agree too
    small = native.gather_rows(table[:, :2], rows)  # row 8B < 256B threshold
    np.testing.assert_array_equal(small, table[:, :2][rows])


def test_gather_rows_mmap_table(tmp_path):
    """mmap-backed tables (the production feature store) work through the
    native pointer path."""
    _built_lib()
    rng = np.random.default_rng(1)
    arr = rng.standard_normal((300, 128)).astype(np.float32)
    p = tmp_path / "t.npy"
    np.save(p, arr)
    table = np.load(p, mmap_mode="r")
    rows = rng.integers(0, 300, size=(4, 50))
    np.testing.assert_array_equal(native.gather_rows(table, rows), arr[rows])


def test_gather_tsan_stress():
    """Build the -fsanitize=thread stress binary and run it: any data race
    in the threaded gather aborts (halt_on_error) with a nonzero exit."""
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    # -B: always rebuild from the current sources (a stale binary would
    # silently test old code)
    r = subprocess.run(["make", "-B", "-C", NATIVE_DIR, "tsan_stress"],
                       capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"tsan build unsupported here: {r.stderr[-500:]}")
    binary = os.path.join(NATIVE_DIR, "tsan_stress")
    env = dict(os.environ, TSAN_OPTIONS="halt_on_error=1 exitcode=66")
    run = subprocess.run([binary], capture_output=True, text=True, env=env,
                         timeout=300)
    assert run.returncode == 0, f"tsan: {run.stdout}\n{run.stderr}"
    assert "ThreadSanitizer" not in run.stderr, run.stderr
    assert "ok" in run.stdout
