"""MC formulation shootout at 720p on the real chip (loop+fetch fenced).

Variants:
  band      current 1D row-band, full-W column one-hot (int8)
  grouped   row-band + grouped-column band: MBs grouped G per column
            chunk, one-hot spans the group window only
  fused     half-pel taps folded into bf16 weight matrices (no
            combine_taps, no B1 overhang): full-width and grouped forms
            (ops/motion.py:_mc_fused_band)
Checks bit-equality of every variant against the gather formulation
on-device before timing.
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

from jsmpeg_tpu.ops.motion import (_mc_gather, _mc_onehot_band,
                                   combine_taps)
from jsmpeg_tpu.utils import fetch

H, W = 720, 1280
MB_H, MB_W = 45, 80
BV = 16      # vertical band (bucket from data)
BH = 32      # horizontal reach bound (bucket)


def loop_time(fn, fence, k=20, reps=3):
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


def _mc_grouped(ref, mv_h, mv_v, mb_h, mb_w, block, band_v, band_h,
                group):
    """Row-band + grouped-column band: `group` MBs per column chunk."""
    Hh, Ww = ref.shape
    B1 = block + 1
    nwin = 2 * (band_v // block) + 1
    band_rows = nwin * block
    n_grp = mb_w // group
    marg = band_h + block          # left/right column margin of a group
    span = group * block + 2 * marg

    vy = jnp.right_shift(mv_v, 1).reshape(mb_h, mb_w)
    vx = jnp.right_shift(mv_h, 1).reshape(mb_h, mb_w)
    oy = (mv_v & 1).reshape(mb_h, mb_w).astype(bool)
    ox = (mv_h & 1).reshape(mb_h, mb_w).astype(bool)

    padded = jnp.concatenate([
        jnp.repeat(ref[:1], band_v, axis=0), ref,
        jnp.repeat(ref[-1:], band_v, axis=0)])
    padded = jnp.concatenate([
        jnp.repeat(padded[:, :1], marg, axis=1), padded,
        jnp.repeat(padded[:, -1:], marg, axis=1)], axis=1)
    padded = (padded.astype(jnp.int16) - 128).astype(jnp.int8)
    band = jnp.stack(
        [padded[k * block:k * block + mb_h * block]
         .reshape(mb_h, block, Ww + 2 * marg)
         for k in range(nwin)], axis=1).reshape(mb_h, band_rows,
                                                Ww + 2 * marg)
    # grouped column chunks: [mb_h, n_grp, band_rows, span]
    gband = jnp.stack(
        [band[:, :, g * group * block:g * group * block + span]
         for g in range(n_grp)], axis=1)

    taps = jnp.arange(B1, dtype=jnp.int32)[None, None, :]
    rows = jnp.clip(vy[:, :, None] + taps + band_v, 0, band_rows - 1)
    # columns relative to the group window start
    base_l = (jnp.arange(mb_w, dtype=jnp.int32) % group * block)[None, :,
                                                                 None]
    cols = jnp.clip(base_l + vx[:, :, None] + taps + marg, 0, span - 1)
    colsg = cols.reshape(mb_h, n_grp, group, B1)

    oh_c = (colsg[..., None] ==
            jnp.arange(span, dtype=jnp.int32)).astype(jnp.int8)
    # [mb_h, n_grp, group, band_rows, B1]
    win_c = jnp.einsum('aghw,agbcw->agbhc', gband, oh_c,
                       preferred_element_type=jnp.int32)
    win_c = win_c.reshape(mb_h, mb_w, band_rows, B1)
    oh_r = (rows[..., None] ==
            jnp.arange(band_rows, dtype=jnp.int32)).astype(jnp.int8)
    win = jnp.einsum('abrh,abhc->abrc', oh_r, win_c.astype(jnp.int8),
                     preferred_element_type=jnp.int32)
    return combine_taps(win + 128, oy, ox, block)


def slope_time(mc, ref, mv_h, mv_v, k_lo=8, k_hi=40):
    """ms per op via the fori_loop slope method: chain the op K times
    inside ONE jit (output feeds the next ref), time two K values, take
    the slope -- removes all transport/dispatch noise."""
    def chained(k):
        @jax.jit
        def run(ref):
            def body(i, r):
                out = mc(r, mv_h, mv_v)
                return jnp.clip(out + i, 0, 255).astype(jnp.uint8)
            return jax.lax.fori_loop(0, k, body, ref)
        return run

    lo, hi = chained(k_lo), chained(k_hi)
    f_first(lo(ref)); f_first(hi(ref))          # compile+warm
    ts = []
    for _ in range(3):
        t0 = time.monotonic(); f_first(lo(ref)); t_lo = time.monotonic() - t0
        t0 = time.monotonic(); f_first(hi(ref)); t_hi = time.monotonic() - t0
        ts.append((t_hi - t_lo) / (k_hi - k_lo))
    return sorted(ts)[1] * 1e3


def main():
    rng = np.random.default_rng(1)
    ref = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.uint8))
    mv_h = jnp.asarray(rng.integers(-2 * BH + 1, 2 * BH - 1,
                                    MB_H * MB_W).astype(np.int32))
    mv_v = jnp.asarray(rng.integers(-2 * BV + 1, 2 * BV - 1,
                                    MB_H * MB_W).astype(np.int32))

    want = np.asarray(jax.jit(
        lambda *a: _mc_gather(*a, MB_H, MB_W, 16))(ref, mv_h, mv_v))

    jband = jax.jit(lambda *a: _mc_onehot_band(*a, MB_H, MB_W, 16, BV, BH))
    got = np.asarray(jband(ref, mv_h, mv_v))
    assert np.array_equal(want, got), 'band mismatch'
    t = slope_time(lambda r, h, v: _mc_onehot_band(r, h, v, MB_H, MB_W,
                                                   16, BV, BH),
                   ref, mv_h, mv_v)
    print(f'band (full-W cols)   luma {t:7.3f} ms/frame (slope)',
          flush=True)

    for group in (8, 20, 40):
        jg = jax.jit(lambda *a, g=group: _mc_grouped(*a, MB_H, MB_W, 16,
                                                     BV, BH, g))
        got = np.asarray(jg(ref, mv_h, mv_v))
        assert np.array_equal(want, got), f'grouped g={group} mismatch'
        t = slope_time(lambda r, h, v, g=group: _mc_grouped(
            r, h, v, MB_H, MB_W, 16, BV, BH, g), ref, mv_h, mv_v)
        print(f'grouped cols G={group:<3d}   luma {t:7.3f} ms/frame (slope)',
              flush=True)

    from jsmpeg_tpu.ops.motion import _mc_fused_band
    for bh, tag in ((0, 'fused (full-W cols)'), (BH, 'fused grouped     ')):
        jf = jax.jit(lambda *a, b=bh: _mc_fused_band(*a, MB_H, MB_W, 16,
                                                     BV, b))
        got = np.asarray(jf(ref, mv_h, mv_v))
        assert np.array_equal(want, got), f'fused bh={bh} mismatch'
        t = slope_time(lambda r, h, v, b=bh: _mc_fused_band(
            r, h, v, MB_H, MB_W, 16, BV, b), ref, mv_h, mv_v)
        print(f'{tag}   luma {t:7.3f} ms/frame (slope)', flush=True)

    # chroma: two independent fused planes vs the shared-weight pair
    # (the decode step's mc_method='fused_pair' question, 720p geometry)
    from jsmpeg_tpu.ops.motion import _mc_fused_grouped_multi, chroma_mv
    cr = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2))
                     .astype(np.uint8))
    cb = jnp.asarray(rng.integers(0, 256, (H // 2, W // 2))
                     .astype(np.uint8))
    cmh, cmv = chroma_mv(mv_h), chroma_mv(mv_v)
    cbv, cbh = BV // 2 + 8, BH // 2 + 8      # decode step's chroma halo
    want_cr = np.asarray(jax.jit(
        lambda *a: _mc_gather(*a, MB_H, MB_W, 8))(cr, cmh, cmv))
    got = _mc_fused_grouped_multi((cr, cb), cmh, cmv, MB_H, MB_W, 8,
                                  cbv, cbh)
    assert np.array_equal(want_cr, np.asarray(got[0])), 'pair mismatch'

    def two_planes(r, h, v):
        a = _mc_fused_band(r, h, v, MB_H, MB_W, 8, cbv, cbh)
        b = _mc_fused_band(jnp.flipud(r), h, v, MB_H, MB_W, 8, cbv, cbh)
        return a + b

    def pair(r, h, v):
        a, b = _mc_fused_grouped_multi((r, jnp.flipud(r)), h, v,
                                       MB_H, MB_W, 8, cbv, cbh)
        return a + b

    for tag, fn in (('chroma 2x fused    ', two_planes),
                    ('chroma fused_pair  ', pair)):
        t = slope_time(lambda r, h, v, f=fn: jnp.clip(
            f(r, h, v) >> 1, 0, 255), cr, cmh, cmv)
        print(f'{tag} 2pl {t:7.3f} ms/frame (slope)', flush=True)


if __name__ == '__main__':
    main()
