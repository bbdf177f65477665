"""Build the native collate library: ``python -m erc_tpu.native.build``."""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "collate.cpp")
LIB = os.path.join(HERE, "libcollate.so")


def build(force: bool = False) -> str:
    if os.path.exists(LIB) and not force:
        if os.path.getmtime(LIB) >= os.path.getmtime(SRC):
            return LIB
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread", SRC, "-o", LIB]
    subprocess.run(cmd, check=True)
    return LIB


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
