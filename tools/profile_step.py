"""Breakdown of the per-frame scan step: run 32-frame scans with pieces
stripped, difference the timings.  Same loop+fetch fencing as
profile_device.py."""

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
    packed_to_levels, unpack_fused
from jsmpeg_tpu.ops.frame import (LevelsArrays, Planes, _combine,
                                  assemble_chroma, assemble_luma,
                                  levels_to_frame)
from jsmpeg_tpu.ops.idct import idct_s32
from jsmpeg_tpu.ops.motion import chroma_mv, motion_compensate
from jsmpeg_tpu.utils import fetch

W, H = 1280, 720
F = 32
BAND = 16


# The superseded full-plane mask formulation lives HERE now (it is what
# this tool A/Bs against; the product path uses the _bmask_* broadcast
# forms in ops/frame.py, which replaced these in round 2b)

def _mask_luma(per_block, mb_h, mb_w):
    g = per_block.reshape(mb_h, mb_w, 2, 2).transpose(0, 2, 1, 3)
    return jnp.broadcast_to(g[:, :, None, :, :, None],
                            (mb_h, 2, 8, mb_w, 2, 8)).reshape(mb_h * 16,
                                                              mb_w * 16)


def _mask_chroma(per_block, mb_h, mb_w):
    g = per_block.reshape(mb_h, mb_w)
    return jnp.broadcast_to(g[:, None, :, None],
                            (mb_h, 8, mb_w, 8)).reshape(mb_h * 8, mb_w * 8)


def _mb_mask_luma(per_mb, mb_h, mb_w):
    g = per_mb.reshape(mb_h, mb_w)
    return jnp.broadcast_to(g[:, None, :, None],
                            (mb_h, 16, mb_w, 16)).reshape(mb_h * 16,
                                                          mb_w * 16)


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


def make_step(mb_h, mb_w, iq, nq, *, do_idct=True, do_masks=True,
              do_mc=True, do_combine=True):
    def step(carry, la):
        cur, fwd = carry
        f = levels_to_frame(la, iq, nq)
        if do_idct:
            resid = idct_s32(f.coef.reshape(-1, 6, 8, 8))
        else:
            resid = f.coef.reshape(-1, 6, 8, 8)  # skip butterflies only
        ry = assemble_luma(resid[:, :4], mb_h, mb_w)
        rcb = assemble_chroma(resid[:, 4], mb_h, mb_w)
        rcr = assemble_chroma(resid[:, 5], mb_h, mb_w)
        if do_masks:
            written_y = _mb_mask_luma(f.written, mb_h, mb_w)
            written_c = _mask_chroma(f.written, mb_h, mb_w)
            coded_y = _mask_luma(f.coded[:, :4], mb_h, mb_w)
            coded_cb = _mask_chroma(f.coded[:, 4], mb_h, mb_w)
            coded_cr = _mask_chroma(f.coded[:, 5], mb_h, mb_w)
            intra_y = _mb_mask_luma(f.intra, mb_h, mb_w)
            intra_c = _mask_chroma(f.intra, mb_h, mb_w)
        else:
            tr = lambda h, w: jnp.ones((h, w), bool)
            written_y = coded_y = intra_y = tr(mb_h * 16, mb_w * 16)
            written_c = coded_cb = coded_cr = intra_c = tr(mb_h * 8, mb_w * 8)
        if do_mc:
            pred_y = motion_compensate(fwd.y, f.mv_h, f.mv_v, mb_h, mb_w,
                                       16, band_halo=BAND)
            cmh = chroma_mv(f.mv_h)
            cmv = chroma_mv(f.mv_v)
            hc = BAND // 2 + 8
            pred_cr = motion_compensate(fwd.cr, cmh, cmv, mb_h, mb_w, 8,
                                        band_halo=hc)
            pred_cb = motion_compensate(fwd.cb, cmh, cmv, mb_h, mb_w, 8,
                                        band_halo=hc)
        else:
            pred_y = fwd.y.astype(jnp.int32)
            pred_cr = fwd.cr.astype(jnp.int32)
            pred_cb = fwd.cb.astype(jnp.int32)
        if do_combine:
            base_y = jnp.where(written_y, pred_y, cur.y.astype(jnp.int32))
            base_cr = jnp.where(written_c, pred_cr, cur.cr.astype(jnp.int32))
            base_cb = jnp.where(written_c, pred_cb, cur.cb.astype(jnp.int32))
            out = Planes(
                y=_combine(base_y, ry, coded_y, intra_y),
                cr=_combine(base_cr, rcr, coded_cr, intra_c),
                cb=_combine(base_cb, rcb, coded_cb, intra_c),
            )
        else:
            out = Planes((pred_y + ry).astype(jnp.uint8),
                         (pred_cr + rcr).astype(jnp.uint8),
                         (pred_cb + rcb).astype(jnp.uint8))
        keep = lambda old, new: jnp.where(f.valid, new, old)
        out = Planes(*[keep(o, n) for o, n in zip(fwd, out)])
        new_cur = Planes(*[keep(c, x) for c, x in zip(cur, fwd)])
        return (new_cur, out), out
    return step


def main():
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
    valid, flags, cbp, mv16, sp_pos, sp_val, _ = jax.jit(
        unpack_fused, static_argnames=('n_frames', 'n_mb', 'n_runs',
                                       'mv_wide', 'n_pairs', 'n_esc'))(
            dev, F, n_mb, n_runs, mv_wide, n_pairs=n_pairs, n_esc=n_esc)
    stacked = jax.jit(packed_to_levels, static_argnames=('n_blk',))(
        flags, cbp, mv16, sp_pos, sp_val, valid, n_blk)
    stacked = jax.device_put(jax.tree.map(np.asarray, stacked))
    stacked = jax.device_put(stacked)
    iq = jnp.asarray(seq.intra_quant_matrix, dtype=jnp.int32)
    nq = jnp.asarray(seq.non_intra_quant_matrix, dtype=jnp.int32)
    cw, ch = seq.coded_width, seq.coded_height
    z = lambda hh, ww: jnp.zeros((hh, ww), dtype=jnp.uint8)
    cur = Planes(z(ch, cw), z(ch >> 1, cw >> 1), z(ch >> 1, cw >> 1))
    fwd = Planes(z(ch, cw), z(ch >> 1, cw >> 1), z(ch >> 1, cw >> 1))

    variants = [
        ('full', dict()),
        ('no_idct', dict(do_idct=False)),
        ('no_masks', dict(do_masks=False)),
        ('no_mc', dict(do_mc=False)),
        ('no_combine', dict(do_combine=False)),
        ('minimal', dict(do_idct=False, do_masks=False, do_mc=False,
                         do_combine=False)),
    ]
    for name, kw in variants:
        step = make_step(seq.mb_height, seq.mb_width, iq, nq, **kw)

        @jax.jit
        def scan(cur, fwd, stacked):
            (c, f2), outs = jax.lax.scan(step, (cur, fwd), stacked)
            return outs

        t = loop_time(lambda: scan(cur, fwd, stacked),
                      lambda r: f_first(r.y))
        print(f'{name:12s} {t*1e3:8.2f} ms/batch = {t/F*1e3:.3f} ms/frame',
              flush=True)


if __name__ == '__main__':
    main()
