"""Frame assembly: batched block residuals -> planes, and the per-frame
decode step combining motion prediction, residuals and the double-buffered
reference planes.

Assembly is a pure reshape/transpose (never a scatter): the host emits
coefficients densely ordered by (mb_row, mb_col, block), so the plane is
[mb_h, 2, 8, mb_w, 2, 8] viewed flat -- TPU-layout friendly by design.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .idct import idct_s32
from .motion import chroma_mv, motion_compensate


class FrameArrays(NamedTuple):
    """Device-side per-frame inputs (host -> device contract; all dense)."""
    coef: jnp.ndarray      # int32 [n_mb, 6, 64] premultiplied dequantized
    coded: jnp.ndarray     # bool  [n_mb, 6]
    intra: jnp.ndarray     # bool  [n_mb]
    written: jnp.ndarray   # bool  [n_mb]
    mv_h: jnp.ndarray      # int32 [n_mb]
    mv_v: jnp.ndarray      # int32 [n_mb]
    valid: jnp.ndarray     # bool  []  (False = GOP padding; no-op frame)


class Planes(NamedTuple):
    y: jnp.ndarray         # uint8 [H, W]
    cr: jnp.ndarray        # uint8 [H/2, W/2]
    cb: jnp.ndarray        # uint8 [H/2, W/2]


class LevelsArrays(NamedTuple):
    """Compact per-frame inputs: raw VLC levels, dequantized on device
    (4x smaller uploads than premultiplied int32 coefficients)."""
    levels: jnp.ndarray    # int16 [n_mb, 6, 64] raw levels, raster positions
    qscale: jnp.ndarray    # uint8 [n_mb]
    coded: jnp.ndarray     # bool  [n_mb, 6]
    intra: jnp.ndarray     # bool  [n_mb]
    written: jnp.ndarray   # bool  [n_mb]
    mv_h: jnp.ndarray      # int32 [n_mb]
    mv_v: jnp.ndarray      # int32 [n_mb]
    valid: jnp.ndarray     # bool  []


def levels_to_frame(la: LevelsArrays, intra_q: jnp.ndarray,
                    non_intra_q: jnp.ndarray) -> FrameArrays:
    """Device-side dequantize+premultiply: LevelsArrays -> FrameArrays."""
    from .idct import dequant_premult
    coef = dequant_premult(la.levels.astype(jnp.int32),
                           la.qscale.astype(jnp.int32), la.intra,
                           intra_q, non_intra_q)
    return FrameArrays(coef=coef, coded=la.coded, intra=la.intra,
                       written=la.written, mv_h=la.mv_h, mv_v=la.mv_v,
                       valid=la.valid)


def assemble_luma(blocks: jnp.ndarray, mb_h: int, mb_w: int) -> jnp.ndarray:
    """blocks [n_mb, 4, 8, 8] -> [16*mb_h, 16*mb_w]."""
    x = blocks.reshape(mb_h, mb_w, 2, 2, 8, 8)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(mb_h * 16, mb_w * 16)


def assemble_chroma(blocks: jnp.ndarray, mb_h: int, mb_w: int) -> jnp.ndarray:
    """blocks [n_mb, 8, 8] -> [8*mb_h, 8*mb_w]."""
    x = blocks.reshape(mb_h, mb_w, 8, 8)
    x = x.transpose(0, 2, 1, 3)
    return x.reshape(mb_h * 8, mb_w * 8)


def _to_blocks(plane: jnp.ndarray, mb_h: int, mb_w: int,
               block: int) -> jnp.ndarray:
    """[H, W] -> [mb_h, mb_w, block, block] (MB-block layout)."""
    return plane.reshape(mb_h, block, mb_w, block).transpose(0, 2, 1, 3)


def _to_plane(blocks: jnp.ndarray, mb_h: int, mb_w: int,
              block: int) -> jnp.ndarray:
    """[mb_h, mb_w, block, block] -> [H, W]."""
    return blocks.transpose(0, 2, 1, 3).reshape(mb_h * block, mb_w * block)


def _resid_luma_blocks(resid4: jnp.ndarray, mb_h: int,
                       mb_w: int) -> jnp.ndarray:
    """[n_mb, 4, 8, 8] IDCT output -> [mb_h, mb_w, 16, 16]: a local
    transpose within each MB's 256 elements (the old full-plane assembly
    interleaved MB columns across the whole row -- a far costlier
    relayout on TPU)."""
    x = resid4.reshape(mb_h, mb_w, 2, 2, 8, 8).transpose(0, 1, 2, 4, 3, 5)
    return x.reshape(mb_h, mb_w, 16, 16)


def _bmask_luma(per_block: jnp.ndarray, mb_h: int, mb_w: int) -> jnp.ndarray:
    """[n_mb, 4] -> [mb_h, mb_w, 16, 16] (pure broadcast)."""
    g = per_block.reshape(mb_h, mb_w, 2, 2)
    return jnp.broadcast_to(g[:, :, :, None, :, None],
                            (mb_h, mb_w, 2, 8, 2, 8)).reshape(
        mb_h, mb_w, 16, 16)


def _bmask_mb(per_mb: jnp.ndarray, mb_h: int, mb_w: int,
              block: int) -> jnp.ndarray:
    """[n_mb] -> [mb_h, mb_w, block, block] (pure broadcast)."""
    g = per_mb.reshape(mb_h, mb_w)
    return jnp.broadcast_to(g[:, :, None, None],
                            (mb_h, mb_w, block, block))


def planes_to_blocks(p: Planes, mb_h: int, mb_w: int) -> Planes:
    """Plane-layout Planes -> MB-block-layout Planes (uint8 relayouts)."""
    return Planes(_to_blocks(p.y, mb_h, mb_w, 16),
                  _to_blocks(p.cr, mb_h, mb_w, 8),
                  _to_blocks(p.cb, mb_h, mb_w, 8))


def blocks_to_planes(p: Planes, mb_h: int, mb_w: int) -> Planes:
    """MB-block-layout Planes -> plane-layout Planes."""
    return Planes(_to_plane(p.y, mb_h, mb_w, 16),
                  _to_plane(p.cr, mb_h, mb_w, 8),
                  _to_plane(p.cb, mb_h, mb_w, 8))


def _combine(base: jnp.ndarray, resid: jnp.ndarray, coded: jnp.ndarray,
             intra: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel select: uncoded -> base; coded intra -> clamp(resid);
    coded non-intra -> clamp(base + resid)."""
    added = jnp.clip(base + resid, 0, 255)
    over = jnp.clip(resid, 0, 255)
    out = jnp.where(coded, jnp.where(intra, over, added), base)
    return out.astype(jnp.uint8)


def decode_frame_planes(cur: Planes, fwd: Planes, f: FrameArrays,
                        mb_h: int, mb_w: int,
                        resid: jnp.ndarray = None,
                        band_halo=None,
                        carry_layout: str = 'plane',
                        mc_method: str = None,
                        n_seg: int = 1) -> Planes:
    """One picture: returns the decoded planes (the caller handles the
    current/forward rotation).  `resid` overrides the IDCT of f.coef with
    precomputed [n_mb, 6, 8, 8] residuals (the Pallas fused-kernel path);
    `band_halo` (static, luma rows) bounds MV reach for the band-limited
    one-hot motion compensation (ops/motion.py).  `n_seg` > 1 marks the
    frame as n_seg independent streams stacked along rows (the serving
    formulation, parallel/streams.py): motion clamps at segment edges.

    carry_layout='block': cur/fwd arrive AND the result returns in
    MB-block layout ([mb_h, mb_w, blk, blk]).  Only the MC reference
    relayouts to plane space (one uint8 relayout per plane per step
    instead of two -- carry-in to block plus result to plane); scanning
    callers convert the batch once at the boundaries."""
    if resid is None:
        resid = idct_s32(f.coef.reshape(-1, 6, 8, 8))  # [n_mb, 6, 8, 8]

    # Everything combines in MB-block space ([mb_h, mb_w, block, block]):
    # residuals and MC predictions arrive there naturally, the masks are
    # pure broadcasts, and only the uint8 carry planes relayout (4x fewer
    # bytes than relayouting the int32 intermediates into plane space,
    # which dominated the step before this formulation).
    ry = _resid_luma_blocks(resid[:, :4], mb_h, mb_w)
    rcb = resid[:, 4].reshape(mb_h, mb_w, 8, 8)
    rcr = resid[:, 5].reshape(mb_h, mb_w, 8, 8)

    written_y = _bmask_mb(f.written, mb_h, mb_w, 16)
    written_c = _bmask_mb(f.written, mb_h, mb_w, 8)
    coded_y = _bmask_luma(f.coded[:, :4], mb_h, mb_w)
    coded_cb = _bmask_mb(f.coded[:, 4], mb_h, mb_w, 8)
    coded_cr = _bmask_mb(f.coded[:, 5], mb_h, mb_w, 8)
    intra_y = _bmask_mb(f.intra, mb_h, mb_w, 16)
    intra_c = _bmask_mb(f.intra, mb_h, mb_w, 8)

    # chroma needs halo_y/2 rounded UP plus the half-pel tap: +8 covers
    # the worst negative-MV floor-division case (|cmv>>1| can exceed
    # |mv>>1|/2 by one row)
    if band_halo:
        bv, bh = (band_halo if isinstance(band_halo, tuple)
                  else (band_halo, band_halo))
        # a zero component means 'reach beyond buckets, unbounded': no
        # vertical bound disables banding entirely; no horizontal bound
        # keeps the row band with full-width columns (bh stays 0)
        halo_c = (bv // 2 + 8, bh // 2 + 8 if bh else 0) if bv else None
        if not bv:
            band_halo = None
    else:
        halo_c = None
    block_carry = carry_layout == 'block'
    fwd_p = blocks_to_planes(fwd, mb_h, mb_w) if block_carry else fwd
    cur_b = cur if block_carry else planes_to_blocks(cur, mb_h, mb_w)
    mc_plane = ('fused' if mc_method == 'fused_pair' else mc_method)
    pred_y = motion_compensate(fwd_p.y, f.mv_h, f.mv_v, mb_h, mb_w, 16,
                               method=mc_plane,
                               band_halo=band_halo, layout='block',
                               n_seg=n_seg)
    cmh = chroma_mv(f.mv_h)
    cmv = chroma_mv(f.mv_v)
    # NOTE: batching cr+cb through one concatenated INT8 contraction pair
    # was measured ~7 ms/batch SLOWER at 720p (PERF_ANALYSIS.md) (the 5D
    # einsum layouts worse than two 4D passes) and reverted;
    # mc_method='fused_pair' re-asks the question for the bf16 fused form
    # (shared weight build, block-sized dims) -- A/B'd on chip, bit-exact
    # either way.
    if mc_method == 'fused_pair':
        from .motion import motion_compensate_multi
        pred_cr, pred_cb = motion_compensate_multi(
            (fwd_p.cr, fwd_p.cb), cmh, cmv, mb_h, mb_w, 8,
            method='fused', band_halo=halo_c, layout='block', n_seg=n_seg)
    else:
        pred_cr = motion_compensate(fwd_p.cr, cmh, cmv, mb_h, mb_w, 8,
                                    method=mc_plane,
                                    band_halo=halo_c, layout='block',
                                    n_seg=n_seg)
        pred_cb = motion_compensate(fwd_p.cb, cmh, cmv, mb_h, mb_w, 8,
                                    method=mc_plane,
                                    band_halo=halo_c, layout='block',
                                    n_seg=n_seg)

    base_y = jnp.where(written_y, pred_y, cur_b.y.astype(jnp.int32))
    base_cr = jnp.where(written_c, pred_cr, cur_b.cr.astype(jnp.int32))
    base_cb = jnp.where(written_c, pred_cb, cur_b.cb.astype(jnp.int32))

    out = Planes(
        y=_combine(base_y, ry, coded_y, intra_y),
        cr=_combine(base_cr, rcr, coded_cr, intra_c),
        cb=_combine(base_cb, rcb, coded_cb, intra_c),
    )
    return out if block_carry else blocks_to_planes(out, mb_h, mb_w)


def decode_frame_step(carry, f: FrameArrays, mb_h: int, mb_w: int,
                      resid: jnp.ndarray = None, band_halo: int = None,
                      carry_layout: str = 'plane',
                      mc_method: str = None, n_seg: int = 1):
    """lax.scan step over the frames of a GOP.

    carry = (cur, fwd): `fwd` is the reference (last decoded I/P picture),
    `cur` is the stale buffer being overwritten (the reference's pointer
    rotation at src/mpeg1.js:220-246 expressed as a scan carry).

    f.valid is a scalar (whole frame is GOP padding) or, in the
    stream-stacked formulation, a [n_seg] vector: each stacked stream's
    rows keep/skip the rotation independently, so streams of unequal
    length ride one joint scan."""
    cur, fwd = carry
    out = decode_frame_planes(cur, fwd, f, mb_h, mb_w, resid=resid,
                              band_halo=band_halo,
                              carry_layout=carry_layout,
                              mc_method=mc_method, n_seg=n_seg)

    def keep(old, new):
        v = f.valid
        if v.ndim == 0:
            return jnp.where(v, new, old)
        # per-segment valid: rows of invalid (padding) segments preserve
        # the old value.  Works in both layouts -- the leading axis is
        # mb_h (block layout) or H (plane layout), both divisible by
        # n_seg
        rows = old.shape[0] // v.shape[0]
        mask = jnp.repeat(v, rows).reshape((-1,) + (1,) * (old.ndim - 1))
        return jnp.where(mask, new, old)

    out = Planes(*[keep(o, n) for o, n in zip(fwd, out)])
    new_cur = Planes(*[keep(c, x) for c, x in zip(cur, fwd)])
    return (new_cur, out), out
