"""Slope/loop profiler for the fused 720p decode pipeline pieces.

Honest measurement on the tunneled TPU (block_until_ready returns early
there): every timing loops K dispatches of one jitted piece and fences by
FETCHING output bytes; the ~2-deep dispatch queue makes the loop converge
to the true execution rate (measured in round 2, docs/PERF_ANALYSIS.md).

Run:  python tools/profile_device.py [piece ...]
Pieces: unpack p2l p2l_parts scan step
Env:  PROF_STREAM=720p|dense|1080p (fixture), PROF_F (frames/batch)
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jax_comp')

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jsmpeg_tpu.models.mpeg1 import (MPEG1Decoder, _scatter_pairs,
                                     build_fused_buffer, decode_scan_fused,
                                     decode_scan_levels, packed_to_levels,
                                     unpack_fused)
from jsmpeg_tpu.ops.frame import Planes
from jsmpeg_tpu.utils import fetch

W, H = 1280, 720
F = int(os.environ.get('PROF_F', '32'))


def loop_time(fn, fence, k=20, reps=3):
    """Median seconds per call: k dispatches + one fetch fence."""
    fence(fn())                      # warm/compile
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
    want = set(sys.argv[1:]) or {'unpack', 'p2l', 'p2l_parts', 'scan'}
    stream = os.environ.get('PROF_STREAM', '720p')
    if stream == 'dense':
        from bench import build_dense_stream
        es = build_dense_stream()
    elif stream == '1080p':
        from jsmpeg_tpu.testing.gen import encode_realistic_stream
        cache = '/tmp/jsmpeg_tpu_bench_1920x1080_32.es'
        if os.path.exists(cache):
            es = open(cache, 'rb').read()
        else:
            es, _ = encode_realistic_stream(1920, 1080, n_frames=32,
                                            seed=3, gop=12)
            open(cache, 'wb').write(es)
    else:
        from bench import build_stream
        es, _ = build_stream()
    dec = MPEG1Decoder()
    dec.write(0.0, es)
    batch = dec.parser.parse_batch(F, eof=True)
    seq = dec.parser.seq
    buf, n_blk, n_runs, mv_wide, n_pairs, n_esc = build_fused_buffer(
        batch, F, seq.mb_size)
    n_mb = seq.mb_size
    dev = jax.device_put(buf)
    print(f'pairs={len(batch["sp_pos"])} runs={len(batch["run_len"])} '
          f'blocks={batch["n_blocks"]} n_blk={n_blk} n_runs={n_runs} '
          f'buf={buf.nbytes/1e6:.2f}MB', flush=True)

    iq = jnp.asarray(seq.intra_quant_matrix, dtype=jnp.int32)
    nq = jnp.asarray(seq.non_intra_quant_matrix, dtype=jnp.int32)

    if 'unpack' in want:
        uf = jax.jit(unpack_fused,
                     static_argnames=('n_frames', 'n_mb', 'n_runs',
                                      'mv_wide', 'n_pairs', 'n_esc'))
        t = loop_time(lambda: uf(dev, F, n_mb, n_runs, mv_wide,
                                 n_pairs=n_pairs, n_esc=n_esc),
                      lambda r: f_first(r[4]))
        print(f'unpack_fused          {t*1e3:8.2f} ms/batch', flush=True)

    valid, flags, cbp, mv16, sp_pos, sp_val, _ = jax.jit(
        unpack_fused, static_argnames=('n_frames', 'n_mb', 'n_runs',
                                       'mv_wide', 'n_pairs', 'n_esc'))(
            dev, F, n_mb, n_runs, mv_wide, n_pairs=n_pairs, n_esc=n_esc)
    args = jax.device_put((flags, cbp, mv16, sp_pos, sp_val, valid))
    flags, cbp, mv16, sp_pos, sp_val, valid = args

    if 'p2l' in want:
        p2l = jax.jit(packed_to_levels, static_argnames=('n_blk',))
        t = loop_time(lambda: p2l(flags, cbp, mv16, sp_pos, sp_val, valid,
                                  n_blk),
                      lambda r: f_first(r.levels))
        print(f'packed_to_levels      {t*1e3:8.2f} ms/batch', flush=True)

    if 'p2l_parts' in want:
        # (a) coded mask + 691k cumsum + blk_ids scatter
        @jax.jit
        def part_blkids(cbp):
            coded = (cbp[..., None] & (1 << jnp.arange(6, dtype=jnp.uint8))) != 0
            mask = coded.reshape(-1)
            dst = jnp.where(mask, jnp.cumsum(mask.astype(jnp.int32)) - 1,
                            n_blk + 1)
            oob = F * n_mb * 6
            return jnp.full((n_blk + 1,), oob, jnp.int32).at[dst].set(
                jnp.arange(mask.shape[0], dtype=jnp.int32), mode='drop')

        t = loop_time(lambda: part_blkids(cbp), f_first)
        print(f'  blk_ids (cumsum+scatter) {t*1e3:8.2f} ms', flush=True)

        blk_ids = part_blkids(cbp)

        # (b) slot cumsum over P + gid gather
        @jax.jit
        def part_slot(sp_pos, blk_ids):
            slot = jnp.cumsum((sp_pos >> 7).astype(jnp.int32)) - 1
            return blk_ids[jnp.clip(slot, 0, n_blk)]

        t = loop_time(lambda: part_slot(sp_pos, blk_ids), f_first)
        print(f'  slot cumsum + gid gather {t*1e3:8.2f} ms', flush=True)

        gid = part_slot(sp_pos, blk_ids)

        # (c) the pair scatter into the dense lattice
        @jax.jit
        def part_scatter(gid, sp_pos, sp_val):
            oob = F * n_mb * 6
            pair_ok = (sp_pos & 0x40) == 0
            idx = jnp.where(pair_ok,
                            gid * 64 + (sp_pos & 63).astype(gid.dtype),
                            oob * 64)
            flat = jnp.zeros((F * n_mb * 6 * 64,), jnp.int16)
            return _scatter_pairs(flat, idx, sp_val)

        t = loop_time(lambda: part_scatter(gid, sp_pos, sp_val), f_first)
        print(f'  pair scatter (dense)     {t*1e3:8.2f} ms', flush=True)

    if 'scan' in want:
        stacked = jax.jit(packed_to_levels, static_argnames=('n_blk',))(
            flags, cbp, mv16, sp_pos, sp_val, valid, n_blk)
        stacked = jax.device_put(stacked)
        cw, ch = seq.coded_width, seq.coded_height
        z = lambda hh, ww: jnp.zeros((hh, ww), dtype=jnp.uint8)
        cur = Planes(z(ch, cw), z(ch >> 1, cw >> 1), z(ch >> 1, cw >> 1))
        fwd = Planes(z(ch, cw), z(ch >> 1, cw >> 1), z(ch >> 1, cw >> 1))
        bh = MPEG1Decoder._band_halo(batch)
        for halo in (bh, None):
            t = loop_time(
                lambda: decode_scan_levels(cur, fwd, stacked, iq, nq,
                                           mb_h=seq.mb_height,
                                           mb_w=seq.mb_width, band_halo=halo),
                lambda r: f_first(r[2].y), k=10)
            print(f'scan 32f (halo={halo})  {t*1e3:8.2f} ms/batch '
                  f'= {t/F*1e3:.3f} ms/frame', flush=True)

        t = loop_time(
            lambda: decode_scan_fused(cur, fwd, dev, iq, nq,
                                      mb_h=seq.mb_height, mb_w=seq.mb_width,
                                      n_frames=F, n_blk=n_blk, n_runs=n_runs,
                                      band_halo=bh, mv_wide=mv_wide,
                                      n_pairs=n_pairs, n_esc=n_esc),
            lambda r: f_first(r[2].y), k=10)
        print(f'full fused (unpack+p2l+scan) {t*1e3:8.2f} ms/batch '
              f'= {F/t:.1f} fps', flush=True)


if __name__ == '__main__':
    main()
