# -*- coding: utf-8 -*-
"""CLI config overrides: ``key=value`` pairs with python-literal parsing.

Replaces the reference's config surface, which has no CLI at all — every
change means editing ``common/args.py`` (readme.md:116, :132; the only
argparse in the reference is dataset/data_tools.py:64-71)."""

from __future__ import annotations

import ast


def parse_overrides(argv) -> dict:
    out = {}
    for arg in argv:
        if arg.startswith("--"):
            arg = arg[2:]
        if "=" not in arg:
            raise SystemExit(f"expected key=value, got: {arg!r}")
        k, v = arg.split("=", 1)
        try:
            out[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            low = v.lower()
            out[k] = {"true": True, "false": False, "none": None}.get(low, v)
    return out
