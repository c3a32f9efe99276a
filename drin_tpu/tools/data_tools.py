# -*- coding: utf-8 -*-
"""Dataset distribution tooling (behavioral equivalent of the reference's
``dataset/data_tools.py``): disguise zip archives as MP4 files for webdrive
sharing and verify md5 on decode.

Container format (data_tools.py:8-24): the file's first 32 bytes are swapped
with a standard MP4 header; the original 32 bytes are appended at EOF.
Decoding restores them and truncates.  ``md5.json`` written beside the
archives records the pre-encode checksums.

CLI: ``python -m drin_tpu.tools.data_tools [--encode] --dir D
--raw_files a.zip --encoded_files a.mp4 [--skip_checksum]``.
"""

from __future__ import annotations

import hashlib
import io
import json
import os
from argparse import ArgumentParser

MP4_HEADER = b"\x00\x00\x00 ftypisom\x00\x00\x02\x00isomiso2avc1mp41"
HEADER_LEN = len(MP4_HEADER)
MD5_FILENAME = "md5.json"


def md5(filename: str) -> str:
    h = hashlib.md5()
    with open(filename, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def mimic_header(filename: str) -> None:
    """zip -> fake mp4 (data_tools.py:45-51)."""
    with open(filename, "br+") as f:
        original = f.read(HEADER_LEN)
        f.seek(0)
        f.write(MP4_HEADER)
        f.seek(0, io.SEEK_END)
        f.write(original)


def recover_header(filename: str) -> None:
    """fake mp4 -> zip (data_tools.py:54-61)."""
    with open(filename, "br+") as f:
        f.seek(-HEADER_LEN, io.SEEK_END)
        original = f.read(HEADER_LEN)
        f.seek(0)
        f.write(original)
        f.seek(-HEADER_LEN, io.SEEK_END)
        f.truncate()


def encode(dir: str, raw_files, encoded_files, skip_checksum: bool = False, log=print):
    md5_dict = {}
    for raw_name, encoded_name in zip(raw_files, encoded_files):
        raw_path = os.path.join(dir, raw_name)
        encoded_path = os.path.join(dir, encoded_name)
        if not os.path.exists(raw_path):
            log(f"{raw_path} not found, skipping...")
            continue
        if not skip_checksum:
            md5_dict[raw_name] = md5(raw_path)
        os.rename(raw_path, encoded_path)
        mimic_header(encoded_path)
        log(f"Encode {raw_path} -> {encoded_path} successfully.")
    if not skip_checksum:
        with open(os.path.join(dir, MD5_FILENAME), "w") as f:
            json.dump(md5_dict, f)
    return md5_dict


def decode(dir: str, raw_files, encoded_files, skip_checksum: bool = False, log=print):
    """Returns {raw_name: checksum_ok}."""
    md5_dict = {}
    if not skip_checksum:
        with open(os.path.join(dir, MD5_FILENAME)) as f:
            md5_dict = json.load(f)
    results = {}
    for raw_name, encoded_name in zip(raw_files, encoded_files):
        raw_path = os.path.join(dir, raw_name)
        encoded_path = os.path.join(dir, encoded_name)
        if not os.path.exists(encoded_path):
            log(f"{encoded_path} not found, skipping...")
            continue
        os.rename(encoded_path, raw_path)
        recover_header(raw_path)
        log(f"Decode {encoded_path} -> {raw_path} successfully.")
        if not skip_checksum:
            ok = md5_dict.get(raw_name) == md5(raw_path)
            results[raw_name] = ok
            log(f"MD5 checksum verification {'PASSED' if ok else 'FAILED'} for {raw_path}.")
        else:
            results[raw_name] = True
    return results


def main(argv=None):
    p = ArgumentParser()
    p.add_argument("--dir", default=".")
    p.add_argument("--encode", action="store_true")
    p.add_argument("--skip_checksum", action="store_true")
    p.add_argument("--raw_files", nargs="+", default=[])
    p.add_argument("--encoded_files", nargs="+", default=[])
    args = p.parse_args(argv)
    if args.encode:
        encode(args.dir, args.raw_files, args.encoded_files, args.skip_checksum)
    else:
        decode(args.dir, args.raw_files, args.encoded_files, args.skip_checksum)


if __name__ == "__main__":
    main()
