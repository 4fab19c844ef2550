"""Stream-parallel amortization curve on the real chip: aggregate fps
for S in {1, 2, 4, 8} copies of the 720p bench stream, for BOTH joint
formulations (parallel/streams.py):

  stacked  streams stacked along MB rows into one joint frame per scan
           step (the round-4 default; every op keeps the single-stream
           4D layout)
  vmap     legacy [S, ...] vmapped scan (BENCH_r03 measured it BELOW
           the serial bound at S=4: 374 vs 603 fps)

The S=1 stacked row doubles as the serial time-multiplexing bound (it
is the plain single-stream scan).  The serving claim in docs/SERVING.md
rests on this curve: aggregate approaches S-linear while per-step fixed
costs amortize, until MXU/HBM saturates.

Env: PROFILE_STREAMS_S=1,2,4,8  PROFILE_STREAMS_REPS=10
     PROFILE_STREAMS_MODES=stacked,roundrobin,vmap
     PROFILE_STREAMS_RES=WxH (default: the 720p bench stream; smaller
     feeds have higher relative per-step fixed costs, so the stacked
     win condition depends on resolution)
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jax_comp')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'bench', os.path.join(os.path.dirname(__file__), '..', 'bench.py'))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    from jsmpeg_tpu.models.mpeg1 import (MPEG1Decoder, _bucket,
                                         build_fused_buffer_sized,
                                         decode_scan_fused,
                                         fused_pair_bucket, mv_fits_narrow)
    from jsmpeg_tpu.ops.frame import Planes
    from jsmpeg_tpu.parallel.packed import split_packed_frames
    from jsmpeg_tpu.parallel.streams import (decode_scan_fused_many,
                                             stack_stream_frames)
    from jsmpeg_tpu.utils import fetch

    res = os.environ.get('PROFILE_STREAMS_RES')
    if res:
        w, h = (int(x) for x in res.split('x'))
        from jsmpeg_tpu.testing.gen import encode_realistic_stream
        cache = f'/tmp/jsmpeg_tpu_streams_{w}x{h}_32.es'
        if os.path.exists(cache):
            es = open(cache, 'rb').read()
        else:
            es, _ = encode_realistic_stream(w, h, n_frames=32, seed=3,
                                            gop=12)
            open(cache, 'wb').write(es)
    else:
        es, _ = bench.build_stream()
    dec = MPEG1Decoder()
    dec.write(0.0, es)
    batch = dec.parser.parse_batch(32, eof=True)
    seq = dec.parser.seq
    F = 32
    mvw = not mv_fits_narrow(batch['run_mv'])
    iq = jnp.asarray(seq.intra_quant_matrix, dtype=jnp.int32)
    nq = jnp.asarray(seq.non_intra_quant_matrix, dtype=jnp.int32)
    cw, ch = seq.coded_width, seq.coded_height
    halo = MPEG1Decoder._band_halo(batch)
    frames = split_packed_frames(batch)

    reps = int(os.environ.get('PROFILE_STREAMS_REPS', '10'))
    s_list = tuple(int(x) for x in os.environ.get(
        'PROFILE_STREAMS_S', '1,2,4,8').split(','))
    modes = tuple(os.environ.get('PROFILE_STREAMS_MODES',
                                 'stacked,roundrobin,vmap').split(','))

    def run_stacked(S):
        joint, vseg = stack_stream_frames([frames] * S, seq.mb_size, F)
        n_pairs = fused_pair_bucket(len(joint['sp_pos']),
                                    len(joint['sp_esc']))
        n_runs = _bucket(max(len(joint['run_len']), 1), lo=256)
        n_blk = _bucket(max(joint['n_blocks'], 1), lo=1024)
        buf = build_fused_buffer_sized(joint, F, n_pairs, n_runs,
                                       S * seq.mb_size, mvw)
        dev = jax.device_put(buf)
        vdev = jax.device_put(jnp.asarray(vseg))
        z = lambda hh, ww: jnp.zeros((S * hh, ww), dtype=jnp.uint8)
        cur = Planes(z(ch, cw), z(ch >> 1, cw >> 1), z(ch >> 1, cw >> 1))
        kw = dict(mb_h=S * seq.mb_height, mb_w=seq.mb_width, n_frames=F,
                  n_blk=n_blk, n_runs=n_runs, band_halo=halo, mv_wide=mvw,
                  n_seg=S)
        r = decode_scan_fused(cur, cur, dev, iq, nq, valid_seg=vdev, **kw)
        np.asarray(fetch(r[2].y[-1, :1, :4]))   # warm + force
        t0 = time.monotonic()
        for _ in range(reps):
            r = decode_scan_fused(cur, cur, dev, iq, nq, valid_seg=vdev,
                                  **kw)
        np.asarray(fetch(r[2].y[-1, :1, :4]))
        return time.monotonic() - t0

    def run_roundrobin(S):
        """S per-stream scans dispatched back-to-back (async; the device
        drains the queue serially) -- the time-multiplexing bound the
        joint formulations must beat, including per-dispatch overhead."""
        n_pairs = fused_pair_bucket(len(batch['sp_pos']),
                                    len(batch['sp_esc']))
        n_runs = _bucket(max(len(batch['run_len']), 1), lo=256)
        n_blk = _bucket(max(batch['n_blocks'], 1), lo=1024)
        buf = build_fused_buffer_sized(batch, F, n_pairs, n_runs,
                                       seq.mb_size, mvw)
        dev = jax.device_put(buf)
        z = lambda hh, ww: jnp.zeros((hh, ww), dtype=jnp.uint8)
        cur = Planes(z(ch, cw), z(ch >> 1, cw >> 1), z(ch >> 1, cw >> 1))
        kw = dict(mb_h=seq.mb_height, mb_w=seq.mb_width, n_frames=F,
                  n_blk=n_blk, n_runs=n_runs, band_halo=halo, mv_wide=mvw)
        r = decode_scan_fused(cur, cur, dev, iq, nq, **kw)
        np.asarray(fetch(r[2].y[-1, :1, :4]))   # warm + force
        t0 = time.monotonic()
        for _ in range(reps):
            rs = [decode_scan_fused(cur, cur, dev, iq, nq, **kw)
                  for _ in range(S)]
        for r in rs:
            np.asarray(fetch(r[2].y[-1, :1, :4]))
        return time.monotonic() - t0

    def run_vmap(S):
        n_pairs = fused_pair_bucket(len(batch['sp_pos']),
                                    len(batch['sp_esc']))
        n_runs = _bucket(max(len(batch['run_len']), 1), lo=256)
        n_blk = _bucket(max(batch['n_blocks'], 1), lo=1024)
        buf = build_fused_buffer_sized(batch, F, n_pairs, n_runs,
                                       seq.mb_size, mvw)
        dev = jax.device_put(np.stack([buf] * S))
        z = lambda hh, ww: jnp.zeros((S, hh, ww), dtype=jnp.uint8)
        cur = Planes(z(ch, cw), z(ch >> 1, cw >> 1), z(ch >> 1, cw >> 1))
        kw = dict(mb_h=seq.mb_height, mb_w=seq.mb_width, n_frames=F,
                  n_blk=n_blk, n_runs=n_runs, band_halo=halo, mv_wide=mvw)
        r = decode_scan_fused_many(cur, cur, dev, iq, nq, **kw)
        np.asarray(fetch(r[2].y[-1, -1, :1, :4]))   # warm + force
        t0 = time.monotonic()
        for _ in range(reps):
            r = decode_scan_fused_many(cur, cur, dev, iq, nq, **kw)
        np.asarray(fetch(r[2].y[-1, -1, :1, :4]))
        return time.monotonic() - t0

    rows = []
    runners = {'stacked': run_stacked, 'vmap': run_vmap,
               'roundrobin': run_roundrobin}
    for mode in modes:
        runner = runners[mode]
        base = None
        for S in s_list:
            dt = runner(S)
            agg = S * F * reps / dt
            if base is None:
                base = agg
            rows.append({'mode': mode, 'streams': S,
                         'aggregate_fps': round(agg, 1),
                         'per_stream_fps': round(agg / S, 1),
                         'ms_per_joint_batch': round(dt / reps * 1e3, 1),
                         'amortization': round(agg / (base * S), 3)})
            print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({'metric': 'multistream_scaling', 'rows': rows}),
          flush=True)


if __name__ == '__main__':
    main()
