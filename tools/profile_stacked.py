"""Piecewise diagnosis of the STACKED multi-stream formulation: time the
joint pipeline's stages (unpack, p2l, scan) at S in {1, 2, 4} and report
each stage's scaling vs S -- the stage whose per-stream cost grows is
the one breaking S-linear amortization.

Same loop+fetch fencing as profile_device.py.  Run on the chip:
  python tools/profile_stacked.py [S ...]
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

from jsmpeg_tpu.models.mpeg1 import (MPEG1Decoder, _bucket,
                                     build_fused_buffer_sized,
                                     decode_scan_fused, decode_scan_levels,
                                     fused_pair_bucket, mv_fits_narrow,
                                     packed_to_levels, unpack_fused)
from jsmpeg_tpu.ops.frame import Planes
from jsmpeg_tpu.utils import fetch

F = int(os.environ.get('PROF_F', '32'))


def loop_time(fn, fence, k=10, reps=3):
    fence(fn())
    ts = []
    for _ in range(reps):
        t0 = time.monotonic()
        for _ in range(k):
            r = fn()
        fence(r)
        ts.append((time.monotonic() - t0) / k)
    return sorted(ts)[len(ts) // 2]


def f_first(x):
    np.asarray(fetch(x.reshape(-1)[:4]))


def main():
    s_list = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    from bench import build_stream
    from jsmpeg_tpu.parallel.packed import split_packed_frames
    from jsmpeg_tpu.parallel.streams import stack_stream_frames
    es, _ = build_stream()
    dec = MPEG1Decoder()
    dec.write(0.0, es)
    batch = dec.parser.parse_batch(F, eof=True)
    seq = dec.parser.seq
    frames = split_packed_frames(batch)
    mvw = not mv_fits_narrow(batch['run_mv'])
    iq = jnp.asarray(seq.intra_quant_matrix, dtype=jnp.int32)
    nq = jnp.asarray(seq.non_intra_quant_matrix, dtype=jnp.int32)
    halo = MPEG1Decoder._band_halo(batch)
    cw, ch = seq.coded_width, seq.coded_height

    for S in s_list:
        joint, vseg = stack_stream_frames([frames] * S, seq.mb_size, F)
        n_mb = S * seq.mb_size
        mb_h = S * seq.mb_height
        n_pairs = fused_pair_bucket(len(joint['sp_pos']),
                                    len(joint['sp_esc']))
        n_runs = _bucket(max(len(joint['run_len']), 1), lo=256)
        n_blk = _bucket(max(joint['n_blocks'], 1), lo=1024)
        buf = build_fused_buffer_sized(joint, F, n_pairs, n_runs, n_mb,
                                       mvw)
        dev = jax.device_put(buf)
        vdev = jax.device_put(jnp.asarray(vseg))
        row = {'S': S, 'n_pairs': n_pairs, 'n_blk': n_blk,
               'n_runs': n_runs}

        uf = jax.jit(unpack_fused,
                     static_argnames=('n_frames', 'n_mb', 'n_runs',
                                      'mv_wide', 'n_pairs', 'n_esc'))
        row['unpack_ms'] = round(loop_time(
            lambda: uf(dev, F, n_mb, n_runs, mvw),
            lambda r: f_first(r[4])) * 1e3, 2)

        valid, flags, cbp, mv16, sp_pos, sp_val, _ = uf(
            dev, F, n_mb, n_runs, mvw)
        args = jax.device_put((flags, cbp, mv16, sp_pos, sp_val, valid))
        flags, cbp, mv16, sp_pos, sp_val, valid = args

        p2l = jax.jit(packed_to_levels, static_argnames=('n_blk',))
        row['p2l_ms'] = round(loop_time(
            lambda: p2l(flags, cbp, mv16, sp_pos, sp_val, valid, n_blk),
            lambda r: f_first(r.levels)) * 1e3, 2)

        stacked = p2l(flags, cbp, mv16, sp_pos, sp_val, valid, n_blk)
        stacked = stacked._replace(
            valid=jnp.asarray(vseg) & stacked.valid[:, None])
        stacked = jax.device_put(stacked)
        z = lambda hh, ww: jnp.zeros((S * hh, ww), dtype=jnp.uint8)
        cur = Planes(z(ch, cw), z(ch >> 1, cw >> 1), z(ch >> 1, cw >> 1))
        row['scan_ms'] = round(loop_time(
            lambda: decode_scan_levels(cur, cur, stacked, iq, nq,
                                       mb_h=mb_h, mb_w=seq.mb_width,
                                       band_halo=halo, n_seg=S),
            lambda r: f_first(r[2].y)) * 1e3, 2)
        # MC-formulation variants of the same scan (which term anti-
        # scales: the fused grouped-band einsums, the full-width band, or
        # something outside MC entirely?)
        for label, kw2 in (
                ('scan_onehot_ms', dict(mc_method='onehot')),
                ('scan_rowband_ms', dict(band_halo=(halo[0], 0)
                                         if isinstance(halo, tuple)
                                         else halo)),
                ('scan_noseg_ms', dict(n_seg=1))):
            if os.environ.get('PROF_STACKED_VARIANTS', '1') == '0':
                break
            base = dict(mb_h=mb_h, mb_w=seq.mb_width, band_halo=halo,
                        n_seg=S)
            base.update(kw2)
            if base['n_seg'] == 1 and S > 1:
                # n_seg=1 on stacked data is WRONG output (no segment
                # clamp) -- timing-only, to isolate the clamp's cost
                pass
            row[label] = round(loop_time(
                lambda: decode_scan_levels(cur, cur, stacked, iq, nq,
                                           **base),
                lambda r: f_first(r[2].y)) * 1e3, 2)

        row['full_ms'] = round(loop_time(
            lambda: decode_scan_fused(cur, cur, dev, iq, nq, mb_h=mb_h,
                                      mb_w=seq.mb_width, n_frames=F,
                                      n_blk=n_blk, n_runs=n_runs,
                                      band_halo=halo, mv_wide=mvw,
                                      n_seg=S, valid_seg=vdev),
            lambda r: f_first(r[2].y)) * 1e3, 2)
        row['aggregate_fps'] = round(S * F / (row['full_ms'] / 1e3), 1)
        print(json.dumps(row), flush=True)


if __name__ == '__main__':
    main()
