# -*- coding: utf-8 -*-
"""Build the native library: ``python -m drin_tpu.native.build``."""

import os
import subprocess
import sys


def build() -> int:
    here = os.path.dirname(os.path.abspath(__file__))
    return subprocess.call(["make", "-C", here])


if __name__ == "__main__":
    sys.exit(build())
