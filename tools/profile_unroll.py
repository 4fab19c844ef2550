"""Does lax.scan unrolling amortize the per-step overhead of the frame
scan?  Times the full levels scan at unroll 1/2/4 (loop+fetch fenced)."""

from __future__ import annotations

import functools
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jax_comp')

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jsmpeg_tpu.models.mpeg1 import MPEG1Decoder, build_fused_buffer, \
    levels_scan_step, packed_to_levels, unpack_fused
from jsmpeg_tpu.ops.frame import Planes
from jsmpeg_tpu.utils import fetch

F = 32


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
    from bench import build_stream
    es, _ = build_stream()
    dec = MPEG1Decoder()
    dec.write(0.0, es)
    batch = dec.parser.parse_batch(F, eof=True)
    seq = dec.parser.seq
    buf, n_blk, n_runs, mv_wide, n_pairs, n_esc = build_fused_buffer(
        batch, F, seq.mb_size)
    dev = jax.device_put(buf)
    vals = jax.jit(unpack_fused,
                   static_argnames=('n_frames', 'n_mb', 'n_runs', 'mv_wide',
                                    'n_pairs', 'n_esc'))(
        dev, F, seq.mb_size, n_runs, mv_wide, n_pairs=n_pairs, n_esc=n_esc)
    stacked = jax.jit(packed_to_levels, static_argnames=('n_blk',))(
        *vals[1:6], vals[0], n_blk)
    stacked = jax.device_put(jax.tree.map(np.asarray, stacked))
    iq = jnp.asarray(seq.intra_quant_matrix, dtype=jnp.int32)
    nq = jnp.asarray(seq.non_intra_quant_matrix, dtype=jnp.int32)
    cw, ch = seq.coded_width, seq.coded_height
    z = lambda hh, ww: jnp.zeros((hh, ww), dtype=jnp.uint8)
    cur = Planes(z(ch, cw), z(ch >> 1, cw >> 1), z(ch >> 1, cw >> 1))
    fwd = Planes(z(ch, cw), z(ch >> 1, cw >> 1), z(ch >> 1, cw >> 1))
    bh = MPEG1Decoder._band_halo(batch)

    step = functools.partial(levels_scan_step, intra_q=iq, non_intra_q=nq,
                             mb_h=seq.mb_height, mb_w=seq.mb_width,
                             band_halo=bh)
    for unroll in (1, 2, 4):
        @jax.jit
        def scan(cur, fwd, stacked, u=unroll):
            (c, f2), outs = jax.lax.scan(step, (cur, fwd), stacked,
                                         unroll=u)
            return outs

        t = loop_time(lambda: scan(cur, fwd, stacked),
                      lambda r: f_first(r.y))
        print(f'unroll={unroll}  {t*1e3:8.2f} ms/batch '
              f'= {t/F*1e3:.3f} ms/frame', flush=True)


if __name__ == '__main__':
    main()
