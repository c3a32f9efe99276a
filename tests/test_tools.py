# -*- coding: utf-8 -*-
"""Distribution tooling + input-pipeline component tests."""

import numpy as np
import pytest


def test_data_tools_roundtrip(tmp_path):
    """zip -> fake-mp4 -> zip roundtrip restores bytes exactly and verifies
    md5 (reference dataset/data_tools.py behavior)."""
    from drin_tpu.tools.data_tools import MP4_HEADER, decode, encode, md5

    payload = bytes(range(256)) * 100
    raw = tmp_path / "archive.zip"
    raw.write_bytes(payload)
    orig_md5 = md5(str(raw))

    encode(str(tmp_path), ["archive.zip"], ["video.mp4"], log=lambda *a: None)
    enc = (tmp_path / "video.mp4").read_bytes()
    assert enc[: len(MP4_HEADER)] == MP4_HEADER  # recognized as mp4
    assert enc[-len(MP4_HEADER):] == payload[: len(MP4_HEADER)]  # stash at EOF
    assert len(enc) == len(payload) + len(MP4_HEADER)

    results = decode(str(tmp_path), ["archive.zip"], ["video.mp4"], log=lambda *a: None)
    assert results == {"archive.zip": True}
    assert (tmp_path / "archive.zip").read_bytes() == payload
    assert md5(str(tmp_path / "archive.zip")) == orig_md5


def test_data_tools_detects_corruption(tmp_path):
    from drin_tpu.tools.data_tools import decode, encode

    raw = tmp_path / "a.zip"
    raw.write_bytes(b"x" * 4096)
    encode(str(tmp_path), ["a.zip"], ["a.mp4"], log=lambda *a: None)
    # corrupt a byte mid-file
    data = bytearray((tmp_path / "a.mp4").read_bytes())
    data[100] ^= 0xFF
    (tmp_path / "a.mp4").write_bytes(bytes(data))
    results = decode(str(tmp_path), ["a.zip"], ["a.mp4"], log=lambda *a: None)
    assert results == {"a.zip": False}


def test_prefetcher_order_and_completeness():
    from drin_tpu.data.prefetch import Prefetcher

    items = list(range(57))
    got = list(Prefetcher(iter(items), lambda x: x * 2, depth=3))
    assert got == [x * 2 for x in items]


def test_prefetcher_propagates_exceptions():
    from drin_tpu.data.prefetch import Prefetcher

    def gen():
        yield 1
        yield 2
        raise RuntimeError("boom in worker")

    it = Prefetcher(gen(), depth=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(RuntimeError, match="boom in worker"):
        next(it)


def test_prefetcher_transform_exception():
    from drin_tpu.data.prefetch import Prefetcher

    it = Prefetcher(iter([1, 0]), lambda x: 1 // x, depth=1)
    assert next(it) == 1
    with pytest.raises(ZeroDivisionError):
        list(it)
