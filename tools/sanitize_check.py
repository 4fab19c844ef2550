"""Build and run the native frontend under ASAN+UBSAN and TSAN.

The reference decoder is single-threaded and ships no sanitizer rig
(SURVEY.md section 5); our C++ frontend parses pictures on worker threads,
so this harness is the project's race/memory/UB gate:

  python tools/sanitize_check.py          # ASAN+UBSAN and TSAN passes

Generates fixture streams (MPEG1 ES + MP2), compiles sanitize_main.cpp
with each sanitizer, and fails loudly on any report.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(REPO, 'jsmpeg_tpu', 'host', 'native')
sys.path.insert(0, REPO)


def make_fixtures(tmp: str):
    from jsmpeg_tpu.host.native.gen_tables import generate
    from jsmpeg_tpu.testing.gen import encode_realistic_stream, \
        encode_test_stream
    from jsmpeg_tpu.testing.mp2_enc import encode_stream
    generate(os.path.join(NATIVE, 'vlc_tables.h'))
    v1, c1 = encode_test_stream(160, 128, n_frames=10, seed=3, gop=5)
    v2, _ = encode_realistic_stream(320, 240, n_frames=12, seed=4, gop=6)
    a, af = encode_stream(24, seed=5)
    from jsmpeg_tpu.testing.ts_mux import mux_av
    vch = c1[:-1]
    vch[-1] = vch[-1] + c1[-1]
    ts = mux_av(vch, 25.0, af, 1152, 44100)
    paths = []
    for name, data in (('v1.es', v1), ('v2.es', v2), ('a.mp2', a),
                       ('av.ts', ts)):
        p = os.path.join(tmp, name)
        with open(p, 'wb') as f:
            f.write(data)
        paths.append(p)
    return paths


def build_and_run(tmp: str, flavor: str, flags: list, fixtures) -> None:
    exe = os.path.join(tmp, f'san_{flavor}')
    srcs = [os.path.join(NATIVE, s)
            for s in ('frontend.cpp', 'mp2.cpp', 'ts_demux.cpp',
                      'sanitize_main.cpp')]
    cmd = ['g++', '-O1', '-g', '-std=c++17'] + flags + srcs + ['-o', exe]
    print('+', ' '.join(cmd))
    subprocess.run(cmd, check=True)
    v1, v2, a, ts = fixtures
    for ves in (v1, v2):
        r = subprocess.run([exe, ves, a, ts], capture_output=True,
                           text=True)
        sys.stdout.write(r.stdout)
        sys.stderr.write(r.stderr)
        if r.returncode != 0:
            raise SystemExit(f'{flavor} FAILED on {ves} (rc={r.returncode})')
    print(f'{flavor}: clean')


def main() -> None:
    with tempfile.TemporaryDirectory() as tmp:
        fixtures = make_fixtures(tmp)
        build_and_run(tmp, 'asan_ubsan',
                      ['-fsanitize=address,undefined',
                       '-fno-sanitize-recover=all'], fixtures)
        build_and_run(tmp, 'tsan', ['-fsanitize=thread'], fixtures)
    print('all sanitizers clean')


if __name__ == '__main__':
    main()
