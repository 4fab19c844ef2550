"""Build the C++ host frontend: generates vlc_tables.h from the canonical
Python tables, compiles frontend.cpp to libjsmpeg_host.so.

  python -m jsmpeg_tpu.host.native.build_native
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SO_PATH = os.path.join(HERE, 'libjsmpeg_host.so')
SRCS = [os.path.join(HERE, 'frontend.cpp'), os.path.join(HERE, 'mp2.cpp'),
        os.path.join(HERE, 'ts_demux.cpp')]
DEPS = SRCS + [os.path.join(HERE, 'bitview.h'),
               os.path.join(HERE, 'gen_tables.py')]
HDR = os.path.join(HERE, 'vlc_tables.h')


def build(verbose: bool = True) -> str:
    from .gen_tables import generate
    generate(HDR)
    cmd = ['g++', '-O3', '-march=native', '-std=c++17', '-shared', '-fPIC',
           '-o', SO_PATH] + SRCS
    if verbose:
        print('+', ' '.join(cmd))
    subprocess.run(cmd, check=True, cwd=HERE)
    return SO_PATH


def ensure_built() -> str:
    """Build if missing or stale (source newer than the .so)."""
    if os.path.exists(SO_PATH):
        so_m = os.path.getmtime(SO_PATH)
        if all(os.path.getmtime(f) <= so_m for f in DEPS):
            return SO_PATH
    return build(verbose=False)


if __name__ == '__main__':
    print(build())
