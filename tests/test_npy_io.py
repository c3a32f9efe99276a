# -*- coding: utf-8 -*-
"""Streaming .npy writer: format + reshape semantics (reference
utils.py:103-224 contract)."""

import numpy as np
import pytest

from drin_tpu.common.npy_io import NpyWriter, load_field, save_field


def test_append_roundtrip(tmp_path):
    p = str(tmp_path / "a.npy")
    with NpyWriter(p) as w:
        w.append(np.array([1, 2, 3], dtype=np.int64))
        w.append(np.array([4, 5, 6], dtype=np.int64))
    out = np.load(p)
    np.testing.assert_array_equal(out, [[1, 2, 3], [4, 5, 6]])
    assert out.dtype == np.int64


def test_extend_and_float32(tmp_path):
    p = str(tmp_path / "b.npy")
    data = np.arange(24, dtype=np.float32).reshape(4, 2, 3)
    with NpyWriter(p) as w:
        w.extend(data)
    np.testing.assert_array_equal(np.load(p), data)


def test_reshape_with_minus_one(tmp_path):
    # the resnet object-feature path reshapes [N*topk, 1, D] -> [N, topk, 1, D]
    # via writer.reshape (reference resnet.py:162)
    p = str(tmp_path / "c.npy")
    w = NpyWriter(p)
    for i in range(6):
        w.append(np.full((1, 4), i, dtype=np.float32))
    w.reshape([-1, 3, 1, 4]).close()
    out = np.load(p)
    assert out.shape == (2, 3, 1, 4)
    assert out[1, 0, 0, 0] == 3


def test_shape_mismatch_raises(tmp_path):
    w = NpyWriter(str(tmp_path / "d.npy"))
    w.append(np.zeros((2,), np.float32))
    with pytest.raises(ValueError):
        w.append(np.zeros((3,), np.float32))
    with pytest.raises(ValueError):
        w.append(np.zeros((2,), np.float64))
    w.close()


def test_reshape_bad_shape_raises(tmp_path):
    w = NpyWriter(str(tmp_path / "e.npy"))
    w.append(np.zeros((4,), np.float32))
    with pytest.raises(ValueError):
        w.reshape([3, 3])
    with pytest.raises(ValueError):
        w.reshape([-1, -1, 2])
    w.close()


def test_mmap_readable(tmp_path):
    # big stores are mmap-read at train time (drin/data.py:47-48)
    p = str(tmp_path / "f.npy")
    with NpyWriter(p) as w:
        w.extend(np.arange(12, dtype=np.float32).reshape(3, 4))
    m = np.load(p, mmap_mode="r")
    assert m[2, 3] == 11.0


def test_field_naming_contract(tmp_path):
    # field names use dashes on disk, underscores in code (prepare.py:24-28)
    d = str(tmp_path)
    save_field(d, "mention_text_feature", np.ones((2, 3)), "train")
    assert (tmp_path / "mention-text-feature_train.npy").exists()
    out = load_field(d, "mention_text_feature", "train")
    assert out.shape == (2, 3)


def test_header_len_back_patched_for_short_numpy_headers(monkeypatch):
    """If numpy emits a v1.0 header shorter than the reserved 128 bytes
    (older ARRAY_ALIGN=16 numpys padded to 64/80/96), _build_header must
    back-patch HEADER_LEN so the reader's data offset (10 + HEADER_LEN)
    still lands at the reservation — otherwise np.load silently reads the
    pad bytes as data, shifting every element with no error."""
    import io
    import struct

    from drin_tpu.common import npy_io

    def short_header_writer(fp, d):
        # replicate an ARRAY_ALIGN=16 numpy: dict string padded so that
        # magic(8) + hlen(2) + dict is a multiple of 16, ending in \n
        body = ("{'descr': '%s', 'fortran_order': False, 'shape': %r, }"
                % (d["descr"], tuple(d["shape"]))).encode("latin1")
        total = 10 + len(body) + 1
        pad = (-total) % 16
        body = body + b" " * pad + b"\n"
        fp.write(b"\x93NUMPY\x01\x00" + struct.pack("<H", len(body)) + body)

    monkeypatch.setattr(np.lib.format, "write_array_header_1_0", short_header_writer)
    header = npy_io._build_header(np.dtype(np.float32), (3, 4))
    assert len(header) == npy_io._HEADER_SPACE
    assert struct.unpack("<H", header[8:10])[0] == npy_io._HEADER_SPACE - 10
    data = np.arange(12, dtype=np.float32).reshape(3, 4)
    blob = header + data.tobytes()
    got = np.load(io.BytesIO(blob))
    np.testing.assert_array_equal(got, data)


def test_writer_fuzz_roundtrip_vs_np_save(tmp_path):
    """Property fuzz: for random dtypes/shapes/counts, NpyWriter's file is
    byte-identical to np.save of the stacked array (the on-disk contract
    the reference's readers rely on)."""
    rng = np.random.default_rng(17)
    dtypes = [np.float32, np.float64, np.int64, np.int32, np.uint8, np.float16]
    for trial in range(24):
        dt = dtypes[trial % len(dtypes)]
        shape = tuple(int(s) for s in rng.integers(1, 5, size=rng.integers(0, 4)))
        n = int(rng.integers(1, 9))
        items = [(rng.standard_normal(shape) * 100).astype(dt) for _ in range(n)]
        p = tmp_path / f"f{trial}.npy"
        with NpyWriter(str(p)) as w:
            for it in items:
                w.append(it)
        ref = tmp_path / f"r{trial}.npy"
        np.save(ref, np.stack(items))
        got, want = p.read_bytes(), ref.read_bytes()
        assert got == want, (trial, dt, shape, n, len(got), len(want))
