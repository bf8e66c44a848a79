"""Build the native runtime library (g++, no external dependencies)."""

from __future__ import annotations

import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "ddp_io.cpp")
_LIB = os.path.join(_DIR, "libddp_io.so")


def library_path() -> str:
    return _LIB


def build(force: bool = False, quiet: bool = True) -> str:
    """Compile libddp_io.so if missing or stale; returns its path."""
    if (
        not force
        and os.path.exists(_LIB)
        and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)
    ):
        return _LIB
    cmd = [
        "g++",
        "-O3",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-pthread",
        "-o",
        _LIB,
        _SRC,
    ]
    res = subprocess.run(cmd, capture_output=True, text=True)
    if res.returncode != 0:
        raise RuntimeError(f"native build failed:\n{res.stderr}")
    if not quiet:
        print(f"built {_LIB}", file=sys.stderr)
    return _LIB


if __name__ == "__main__":
    build(force="--force" in sys.argv, quiet=False)
