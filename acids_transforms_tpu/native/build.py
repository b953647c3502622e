"""Build the native shared library (g++ -O3) next to this package.

Usage: ``python -m acids_transforms_tpu.native.build``.
"""
from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
LIB = os.path.join(HERE, "libattnative.so")
SOURCES = [os.path.join(HERE, s) for s in ("pghi.cc", "wavio.cc")]


def build(verbose: bool = True) -> str:
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        *SOURCES,
        "-o",
        LIB,
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return LIB


def lib_path() -> str:
    return LIB


def is_built() -> bool:
    if not os.path.exists(LIB):
        return False
    src_mtime = max(os.path.getmtime(s) for s in SOURCES)
    return os.path.getmtime(LIB) >= src_mtime


if __name__ == "__main__":
    build()
    sys.exit(0)
