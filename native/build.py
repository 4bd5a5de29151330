#!/usr/bin/env python3
"""Build the C++ native runtime library (librdt_native.so).

Equivalent role to the reference's Makefile (reference Makefile:47-68) for
the host-side native components.  Usage: python3 native/build.py
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def build() -> str:
    src = os.path.join(HERE, "rdt_native.cpp")
    out = os.path.join(HERE, "librdt_native.so")
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-fPIC", "-shared",
        "-Wall", "-Wextra", src, "-o", out,
    ]
    subprocess.check_call(cmd)
    return out


if __name__ == "__main__":
    print(build())
    sys.exit(0)
