"""Benchmark: 720p MPEG1 decode throughput per chip (end-to-end + stages).

Prints ONE JSON line:
  {"metric": "720p_mpeg1_fps_e2e_per_chip", "value": N, "unit": "fps",
   "vs_baseline": N, ...extra stage metrics...}

vs_baseline is relative to the reference's published sustained 720p rate
(30 fps on its target device, reference README.md:5).  The BASELINE.json
target is >10x a single WASM thread per chip, i.e. vs_baseline >= 10.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

W, H = 1280, 720
N_FRAMES = int(os.environ.get('BENCH_FRAMES', '24'))
GOP = 12


def build_stream():
    """Synthesize a 720p I/P stream (no ffmpeg in the image)."""
    from jsmpeg_tpu.testing.gen import encode_test_stream
    cache = f'/tmp/jsmpeg_tpu_bench_{W}x{H}_{N_FRAMES}.es'
    if os.path.exists(cache):
        with open(cache, 'rb') as f:
            return f.read()
    es, _ = encode_test_stream(W, H, n_frames=N_FRAMES, seed=3, gop=GOP,
                               qscale=8)
    with open(cache, 'wb') as f:
        f.write(es)
    return es


def parse_stream(es):
    from jsmpeg_tpu.host import best_parser
    t0 = time.monotonic()
    parser = best_parser()
    parser.write(es)
    frames = []
    while True:
        fd = parser.parse_frame(eof=True)
        if fd is None:
            break
        frames.append(fd)
    return parser.seq, frames, time.monotonic() - t0


def main():
    import jax
    from jsmpeg_tpu.models.mpeg1 import (decode_scan, frame_to_arrays,
                                         stack_frames)
    from jsmpeg_tpu.ops.frame import Planes

    es = build_stream()
    seq, frames, parse_s = parse_stream(es)
    n = len(frames)
    mb_h, mb_w = seq.mb_height, seq.mb_width
    cw, ch = seq.coded_width, seq.coded_height

    stacked = stack_frames([frame_to_arrays(f) for f in frames])
    z = lambda hh, ww: np.zeros((hh, ww), dtype=np.uint8)
    planes0 = (Planes(z(ch, cw), z(ch >> 1, cw >> 1), z(ch >> 1, cw >> 1)),
               Planes(z(ch, cw), z(ch >> 1, cw >> 1), z(ch >> 1, cw >> 1)))

    def run_device():
        cur, fwd, outs = decode_scan(planes0[0], planes0[1], stacked,
                                     mb_h=mb_h, mb_w=mb_w)
        jax.block_until_ready(outs.y)
        return outs

    run_device()                      # compile
    reps = 3
    t0 = time.monotonic()
    for _ in range(reps):
        run_device()
    device_s = (time.monotonic() - t0) / reps
    device_fps = n / device_s

    # end-to-end: parse + device decode of a fresh copy of the stream
    t0 = time.monotonic()
    seq2, frames2, _ = parse_stream(es)
    stacked2 = stack_frames([frame_to_arrays(f) for f in frames2])
    cur, fwd, outs = decode_scan(planes0[0], planes0[1], stacked2,
                                 mb_h=mb_h, mb_w=mb_w)
    jax.block_until_ready(outs.y)
    e2e_s = time.monotonic() - t0
    e2e_fps = n / e2e_s

    # MP2 frames/s (exact host path)
    from jsmpeg_tpu.host.mp2_parse import MP2Parser
    from jsmpeg_tpu.ops import mp2_synth
    from jsmpeg_tpu.testing.mp2_enc import encode_stream
    aes, _ = encode_stream(16, seed=1)
    t0 = time.monotonic()
    ap = MP2Parser()
    ap.write(aes)
    st = mp2_synth.initial_state()
    n_audio = 0
    while True:
        fr = ap.parse_frame()
        if fr is None:
            break
        _, st = mp2_synth.synthesize_exact(fr.samples, st)
        n_audio += 1
    mp2_fps = n_audio / (time.monotonic() - t0)

    result = {
        'metric': '720p_mpeg1_fps_e2e_per_chip',
        'value': round(e2e_fps, 2),
        'unit': 'fps',
        'vs_baseline': round(e2e_fps / 30.0, 3),
        'device_pipeline_fps': round(device_fps, 2),
        'host_parse_fps': round(n / parse_s, 2),
        'mp2_frames_per_s': round(mp2_fps, 1),
        'frames': n,
        'device': str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()
