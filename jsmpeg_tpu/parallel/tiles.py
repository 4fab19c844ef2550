"""Tile-parallel frame decode: macroblock-row slabs sharded over the
'tile' mesh axis, with halo exchange of reference-plane boundary rows for
motion compensation.

This is the codec's sequence/context-parallel analog (SURVEY.md section 2):
P-frame motion compensation reads the previous reference frame up to
+/- (forward_f << 4) half-pels away, so neighboring tile shards exchange
`halo` boundary rows via `ppermute` each frame -- structurally the ring /
CP halo pattern -- while dequant/IDCT/assembly stay fully local.

Composes with GOP data parallelism: a [G, F, rows, ...] batch shards G
over 'gop' and rows over 'tile'.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..host.mpeg1_parse import FrameData
from ..models.mpeg1 import empty_frame_arrays, frame_to_arrays
from ..ops.frame import (FrameArrays, Planes, _bmask_luma, _bmask_mb,
                         _combine, _resid_luma_blocks, _to_blocks,
                         _to_plane)
from ..ops.idct import idct_s32
from ..ops.motion import chroma_mv
from .gop import split_gops
from .mesh import _pvary
from .mesh import shard_map


def halo_mb_rows(f_code: int) -> int:
    """MB rows of halo needed for a given forward_f_code: max MV reach is
    (1 << (f_code-1)) << 4 half-pels => `reach/2 (+1 for the half-pel tap)`
    pixels."""
    reach_px = ((1 << (f_code - 1)) << 4) // 2 + 1
    return -(-reach_px // 16)


def halo_mb_for_mvs(max_abs_mv: int) -> int:
    """MB rows of halo covering a batch's largest |MV| (half-pel units,
    post full-pel doubling, either axis: MPEG1 has one forward_f for
    both and the banded tiled MC bounds columns with the same halo),
    bucketed to powers of two so the jit-variant count stays small."""
    reach_px = ((max_abs_mv + 1) >> 1) + 1
    need = -(-reach_px // 16)
    b = 1
    while b < need:
        b <<= 1
    return b


def batch_max_abs_mv(frames) -> int:
    """max |mv component| over per-frame packed dicts / FrameData /
    LevelsArrays-style dicts (0 when no MVs)."""
    m = 0
    for f in frames:
        mv = f['run_mv'] if isinstance(f, dict) and 'run_mv' in f else \
            f['mv'] if isinstance(f, dict) else f.mv
        if mv is not None and mv.size:
            m = max(m, int(np.abs(mv).max()))
    return m


def _exchange_halo(plane: jnp.ndarray, halo: int, axis: str) -> jnp.ndarray:
    """[rows, W] -> [halo + rows + halo, W] with neighbor boundary rows
    (zeros at the frame edges; in-bounds MVs never read them)."""
    n = jax.lax.axis_size(axis)
    if n == 1:
        zeros = jnp.zeros((halo,) + plane.shape[1:], plane.dtype)
        return jnp.concatenate([zeros, plane, zeros], axis=0)
    down = [(i, i + 1) for i in range(n - 1)]   # my rows -> next tile
    up = [(i + 1, i) for i in range(n - 1)]     # my rows -> previous tile
    top_halo = jax.lax.ppermute(plane[-halo:], axis, down)
    bottom_halo = jax.lax.ppermute(plane[:halo], axis, up)
    return jnp.concatenate([top_halo, plane, bottom_halo], axis=0)


def _mc_tiled(ref: jnp.ndarray, mv_h: jnp.ndarray, mv_v: jnp.ndarray,
              mb_h_local: int, mb_w: int, block: int, halo: int,
              row0: jnp.ndarray, total_rows: int,
              layout: str = 'plane', mc_method: str = None) -> jnp.ndarray:
    """Motion compensation reading an extended (halo'd) reference slab.

    ref: int-or-uint8 [halo + rows_local + halo, W]; mv in this plane's
    half-pel units; row0 = first global row of the local slab;
    total_rows = global plane height (for the frame-edge clamp).

    Same formulation split as ops/motion.py: the weight-folded bf16
    'fused' form by default on accelerators (round-3 on-chip capture:
    +30% over onehot, BENCH_r03), the plain 4-tap gather on CPU
    (arbitrary gathers cost ~5 ns/element on TPU but matmul MC on a
    1-core CPU host would be absurd); bit-exact across all three."""
    if mc_method == 'gather' or (mc_method is None
                                 and jax.default_backend() == 'cpu'):
        return _mc_tiled_gather(ref, mv_h, mv_v, mb_h_local, mb_w, block,
                                halo, row0, total_rows, layout)
    if mc_method == 'onehot':
        return _mc_tiled_onehot(ref, mv_h, mv_v, mb_h_local, mb_w, block,
                                halo, row0, total_rows, layout)
    return _mc_tiled_fused(ref, mv_h, mv_v, mb_h_local, mb_w, block,
                           halo, row0, total_rows, layout)


def _mc_tiled_gather(ref, mv_h, mv_v, mb_h_local: int, mb_w: int,
                     block: int, halo: int, row0, total_rows: int,
                     layout: str = 'plane'):
    H_local = mb_h_local * block
    W = mb_w * block
    grid_h = jnp.repeat(jnp.repeat(mv_h.reshape(mb_h_local, mb_w), block, 0),
                        block, 1)
    grid_v = jnp.repeat(jnp.repeat(mv_v.reshape(mb_h_local, mb_w), block, 0),
                        block, 1)
    iy = jnp.arange(H_local, dtype=jnp.int32)[:, None] + row0   # global rows
    ix = jnp.arange(W, dtype=jnp.int32)[None, :]
    sy = iy + jnp.right_shift(grid_v, 1)
    sx = ix + jnp.right_shift(grid_h, 1)
    oy = grid_v & 1
    ox = grid_h & 1

    flat = ref.reshape(-1).astype(jnp.int32)
    ext_rows = ref.shape[0]

    def g(yg, x):
        yg = jnp.clip(yg, 0, total_rows - 1)          # frame-edge clamp
        yl = jnp.clip(yg - row0 + halo, 0, ext_rows - 1)
        x = jnp.clip(x, 0, W - 1)
        return jnp.take(flat, yl * W + x, axis=0)

    a = g(sy, sx)
    b = g(sy, sx + ox)
    c = g(sy + oy, sx)
    d = g(sy + oy, sx + ox)
    pred = jnp.right_shift(a + b + c + d + 2, 2)
    if layout == 'block':
        return pred.reshape(mb_h_local, block, mb_w,
                            block).transpose(0, 2, 1, 3)
    return pred


def _tiled_band_setup(ref, mv_h, mv_v, mb_h_local: int, mb_w: int,
                      block: int, halo: int, dtype):
    """Shared scaffolding of the tiled banded MC variants (onehot and
    fused): grouped-column geometry over the halo'd slab, with the
    slab's exchanged halo rows acting as the vertical band.  Columns
    ride edge-replicated padding, which IS the frame-edge column clamp;
    the row clamp composes into the band indices in each variant.
    Returns (gband [mb_h_local, n_grp, band_rows, span] in `dtype`,
    vy, vx, oy, ox padded MV grids, and the geometry tuple (band_rows,
    G, n_grp, mb_w_pad, marg, span))."""
    W = mb_w * block
    rows_local = mb_h_local * block
    assert halo % block == 0
    nwin = 2 * (halo // block) + 1
    band_rows = nwin * block
    G = max(1, 128 // block)
    n_grp = -(-mb_w // G)
    mb_w_pad = n_grp * G
    marg = halo + block
    span = G * block + 2 * marg
    Wp = mb_w_pad * block + 2 * marg

    def padg(grid, fill=0):
        g = grid.reshape(mb_h_local, mb_w)
        if mb_w_pad == mb_w:
            return g
        return jnp.pad(g, ((0, 0), (0, mb_w_pad - mb_w)),
                       constant_values=fill)

    vy = padg(jnp.right_shift(mv_v, 1))
    vx = padg(jnp.right_shift(mv_h, 1))
    oy = padg(mv_v & 1).astype(bool)
    ox = padg(mv_h & 1).astype(bool)

    extp = jnp.concatenate([
        jnp.repeat(ref[:, :1], marg, axis=1), ref,
        jnp.repeat(ref[:, -1:], Wp - W - marg, axis=1)], axis=1)
    extp = (extp.astype(jnp.int16) - 128).astype(jnp.int8).astype(dtype)
    band = jnp.stack(
        [extp[k * block:k * block + rows_local]
         .reshape(mb_h_local, block, Wp) for k in range(nwin)],
        axis=1).reshape(mb_h_local, band_rows, Wp)
    gband = jnp.stack(
        [band[:, :, g * G * block:g * G * block + span]
         for g in range(n_grp)], axis=1)
    return gband, vy, vx, oy, ox, (band_rows, G, n_grp, mb_w_pad, marg,
                                   span)


def _mc_tiled_onehot(ref, mv_h, mv_v, mb_h_local: int, mb_w: int,
                     block: int, halo: int, row0, total_rows: int,
                     layout: str = 'plane'):
    """Banded grouped-column one-hot window extraction over the halo'd
    slab (same formulation as ops/motion.py _mc_onehot_band_grouped,
    `_tiled_band_setup` geometry).  The per-MB-row band slices the slab
    directly; the frame-edge row clamp composes into the band indices
    (clamped global rows always map to real slab rows, never the zero
    padding at the frame edges).  Requires |mv|/2 + 1 <= halo in this
    plane's pixels on BOTH axes -- the same f_code bound that sizes the
    halo exchange itself (halo_mb_rows; MPEG1 has one forward_f for both
    axes, /root/reference/src/mpeg1.js:413-418)."""
    B1 = block + 1
    gband, vy, vx, oy, ox, \
        (band_rows, G, n_grp, mb_w_pad, marg, span) = _tiled_band_setup(
            ref, mv_h, mv_v, mb_h_local, mb_w, block, halo, jnp.int8)

    base_r = (jnp.arange(mb_h_local, dtype=jnp.int32)
              * block)[:, None, None]
    taps = jnp.arange(B1, dtype=jnp.int32)[None, None, :]
    rows_g = jnp.clip(base_r + row0 + vy[:, :, None] + taps,
                      0, total_rows - 1)             # frame-edge clamp
    rows_b = jnp.clip(rows_g - row0 - base_r + halo, 0, band_rows - 1)
    base_l = ((jnp.arange(mb_w_pad, dtype=jnp.int32) % G)
              * block)[None, :, None]
    cols = jnp.clip(base_l + vx[:, :, None] + taps + marg, 0, span - 1)
    colsg = cols.reshape(mb_h_local, n_grp, G, B1)

    oh_c = (colsg[..., None] ==
            jnp.arange(span, dtype=jnp.int32)).astype(jnp.int8)
    win_c = jnp.einsum('aghw,agbcw->agbhc', gband, oh_c,
                       preferred_element_type=jnp.int32)
    win_c = win_c.reshape(mb_h_local, mb_w_pad, band_rows, B1)
    oh_r = (rows_b[..., None] ==
            jnp.arange(band_rows, dtype=jnp.int32)).astype(jnp.int8)
    win = jnp.einsum('abrh,abhc->abrc', oh_r, win_c.astype(jnp.int8),
                     preferred_element_type=jnp.int32)
    win = win[:, :mb_w]
    from ..ops.motion import combine_taps
    return combine_taps(win + 128, oy[:, :mb_w], ox[:, :mb_w], block,
                        layout)


def _mc_tiled_fused(ref, mv_h, mv_v, mb_h_local: int, mb_w: int,
                    block: int, halo: int, row0, total_rows: int,
                    layout: str = 'plane'):
    """`_mc_tiled_onehot` with the half-pel taps folded into bf16 weight
    matrices (ops/motion.py `_mc_fused_band` exactness argument; same
    halo'd-slab clamp geometry via `_tiled_band_setup`: global-row clamp
    composed into band indices per tap, edge-replicated columns)."""
    from ..ops.motion import _fused_tap_weights, _fused_tap_weights_pair
    rows_local = mb_h_local * block
    gband, vy, vx, oy, ox, \
        (band_rows, G, n_grp, mb_w_pad, marg, span) = _tiled_band_setup(
            ref, mv_h, mv_v, mb_h_local, mb_w, block, halo, jnp.bfloat16)

    base_r = (jnp.arange(mb_h_local, dtype=jnp.int32)
              * block)[:, None, None]
    taps = jnp.arange(block, dtype=jnp.int32)[None, None, :]

    def band_row(tap_off):
        rows_g = jnp.clip(base_r + row0 + vy[:, :, None] + taps + tap_off,
                          0, total_rows - 1)         # frame-edge clamp
        return jnp.clip(rows_g - row0 - base_r + halo, 0, band_rows - 1)

    # the two row taps clamp independently in GLOBAL row space before
    # mapping into the band, so the pair form takes both explicitly
    w_r = _fused_tap_weights_pair(band_row(0), band_row(1), oy, band_rows)
    base_l = ((jnp.arange(mb_w_pad, dtype=jnp.int32) % G)
              * block)[None, :, None]
    cols0 = (base_l + vx[:, :, None] + taps + marg) \
        .reshape(mb_h_local, n_grp, G, block)
    w_c = _fused_tap_weights(cols0, ox.reshape(mb_h_local, n_grp, G), span)

    win_c = jnp.einsum('aghw,agbcw->agbhc', gband, w_c,
                       preferred_element_type=jnp.bfloat16)
    win_c = win_c.reshape(mb_h_local, mb_w_pad, band_rows, block)
    res = jnp.einsum('abrh,abhc->abrc', w_r, win_c,
                     preferred_element_type=jnp.float32)
    res = res[:, :mb_w]
    pred = jnp.right_shift(res.astype(jnp.int32) + (2 + 4 * 128), 2)
    if layout == 'block':
        return pred
    return pred.transpose(0, 2, 1, 3).reshape(rows_local, mb_w * block)


def decode_frame_planes_tiled(cur: Planes, fwd: Planes, f: FrameArrays,
                              mb_h_local: int, mb_w: int, halo_mb: int,
                              mb_h_total: int, axis: str = 'tile',
                              resid=None, mc_method: str = None) -> Planes:
    """Per-shard frame decode; `f` arrays hold this shard's MBs only."""
    tile_idx = jax.lax.axis_index(axis)
    row0_y = tile_idx.astype(jnp.int32) * (mb_h_local * 16)
    row0_c = tile_idx.astype(jnp.int32) * (mb_h_local * 8)
    halo_y = halo_mb * 16
    halo_c = halo_mb * 8

    if resid is None:
        resid = idct_s32(f.coef.reshape(-1, 6, 8, 8))
    # block-space combine, mirroring ops/frame.decode_frame_planes: only
    # the uint8 carry planes relayout
    ry = _resid_luma_blocks(resid[:, :4], mb_h_local, mb_w)
    rcb = resid[:, 4].reshape(mb_h_local, mb_w, 8, 8)
    rcr = resid[:, 5].reshape(mb_h_local, mb_w, 8, 8)

    written_y = _bmask_mb(f.written, mb_h_local, mb_w, 16)
    written_c = _bmask_mb(f.written, mb_h_local, mb_w, 8)
    coded_y = _bmask_luma(f.coded[:, :4], mb_h_local, mb_w)
    coded_cb = _bmask_mb(f.coded[:, 4], mb_h_local, mb_w, 8)
    coded_cr = _bmask_mb(f.coded[:, 5], mb_h_local, mb_w, 8)
    intra_y = _bmask_mb(f.intra, mb_h_local, mb_w, 16)
    intra_c = _bmask_mb(f.intra, mb_h_local, mb_w, 8)

    ext_y = _exchange_halo(fwd.y, halo_y, axis)
    ext_cr = _exchange_halo(fwd.cr, halo_c, axis)
    ext_cb = _exchange_halo(fwd.cb, halo_c, axis)

    pred_y = _mc_tiled(ext_y, f.mv_h, f.mv_v, mb_h_local, mb_w, 16,
                       halo_y, row0_y, mb_h_total * 16, layout='block',
                       mc_method=mc_method)
    cmh = chroma_mv(f.mv_h)
    cmv = chroma_mv(f.mv_v)
    pred_cr = _mc_tiled(ext_cr, cmh, cmv, mb_h_local, mb_w, 8,
                        halo_c, row0_c, mb_h_total * 8, layout='block',
                        mc_method=mc_method)
    pred_cb = _mc_tiled(ext_cb, cmh, cmv, mb_h_local, mb_w, 8,
                        halo_c, row0_c, mb_h_total * 8, layout='block',
                        mc_method=mc_method)

    base_y = jnp.where(written_y, pred_y,
                       _to_blocks(cur.y, mb_h_local, mb_w,
                                  16).astype(jnp.int32))
    base_cr = jnp.where(written_c, pred_cr,
                        _to_blocks(cur.cr, mb_h_local, mb_w,
                                   8).astype(jnp.int32))
    base_cb = jnp.where(written_c, pred_cb,
                        _to_blocks(cur.cb, mb_h_local, mb_w,
                                   8).astype(jnp.int32))

    return Planes(
        y=_to_plane(_combine(base_y, ry, coded_y, intra_y),
                    mb_h_local, mb_w, 16),
        cr=_to_plane(_combine(base_cr, rcr, coded_cr, intra_c),
                     mb_h_local, mb_w, 8),
        cb=_to_plane(_combine(base_cb, rcb, coded_cb, intra_c),
                     mb_h_local, mb_w, 8),
    )


def _tiled_step(carry, f: FrameArrays, mb_h_local: int, mb_w: int,
                halo_mb: int, mb_h_total: int, axis: str, resid=None,
                mc_method: str = None):
    cur, fwd = carry
    out = decode_frame_planes_tiled(cur, fwd, f, mb_h_local, mb_w,
                                    halo_mb, mb_h_total, axis, resid=resid,
                                    mc_method=mc_method)

    def keep(old, new):
        return jnp.where(f.valid, new, old)

    out = Planes(*[keep(o, n) for o, n in zip(fwd, out)])
    new_cur = Planes(*[keep(c, x) for c, x in zip(cur, fwd)])
    return (new_cur, out), out


def _pad_mb_rows(x: np.ndarray, mb_h: int, mb_w: int,
                 mb_h_pad: int) -> np.ndarray:
    """Reshape a [G, F, mb_h*mb_w, ...] MB axis and zero-pad MB rows;
    arrays without an MB axis (e.g. 'valid') pass through."""
    if x.ndim < 3 or x.shape[2] != mb_h * mb_w:
        return x
    lead = x.shape[:2]
    rest = x.shape[3:]
    x = x.reshape(lead + (mb_h, mb_w) + rest)
    pad = [(0, 0)] * x.ndim
    pad[2] = (0, mb_h_pad - mb_h)
    x = np.pad(x, pad)
    return x.reshape(lead + (mb_h_pad * mb_w,) + rest)


def _pad_rows(stacked: FrameArrays, mb_h: int, mb_w: int,
              mb_h_pad: int) -> FrameArrays:
    return FrameArrays(*[_pad_mb_rows(np.asarray(v), mb_h, mb_w, mb_h_pad)
                         for v in stacked])


def _gop_scan_local(frames, step, rows_local: int, cw: int):
    """Shared per-shard scaffolding: zero reference planes, scan `step`
    over the frames of each local GOP, vmap over local GOPs."""
    def one_gop(fr):
        z = lambda h, w: jnp.zeros((h, w), dtype=jnp.uint8)
        state = (Planes(z(rows_local, cw), z(rows_local >> 1, cw >> 1),
                        z(rows_local >> 1, cw >> 1)),
                 Planes(z(rows_local, cw), z(rows_local >> 1, cw >> 1),
                        z(rows_local >> 1, cw >> 1)))
        state = _pvary(state, ('gop', 'tile'))
        _, outs = jax.lax.scan(step, state, fr)
        return outs

    return jax.vmap(one_gop)(frames)


@functools.partial(jax.jit, static_argnames=('mb_h_pad', 'mb_w', 'halo_mb',
                                             'mb_h_total', 'mesh',
                                             'mc_method'))
def decode_gops_tiled(stacked: FrameArrays, mb_h_pad: int, mb_w: int,
                      halo_mb: int, mb_h_total: int, mesh: Mesh,
                      mc_method: str = None):
    """stacked: [G, F, mb_h_pad*mb_w, ...]; G sharded over 'gop', MB rows
    over 'tile'.  Returns per-frame planes [G, F, rows, W] row-sharded."""
    n_tile = mesh.shape['tile']
    mb_h_local = mb_h_pad // n_tile
    cw = mb_w * 16
    rows_local = mb_h_local * 16

    def local(frames: FrameArrays):
        step = functools.partial(_tiled_step, mb_h_local=mb_h_local,
                                 mb_w=mb_w, halo_mb=halo_mb,
                                 mb_h_total=mb_h_total, axis='tile',
                                 mc_method=mc_method)
        return _gop_scan_local(frames, step, rows_local, cw)

    # MB arrays shard their row blocks over 'tile' (axis 2 of [G,F,mb,...])
    spec_mb = P('gop', None, 'tile')
    in_specs = FrameArrays(
        coef=spec_mb, coded=spec_mb, intra=spec_mb, written=spec_mb,
        mv_h=spec_mb, mv_v=spec_mb, valid=P('gop'))
    out_specs = Planes(P('gop', None, 'tile'), P('gop', None, 'tile'),
                       P('gop', None, 'tile'))
    fn = shard_map(local, mesh=mesh, in_specs=(in_specs,),
                   out_specs=out_specs)
    return fn(stacked)


def decode_tiled(frames: List[FrameData], mb_h: int, mb_w: int, mesh: Mesh,
                 f_code: int = 2, mc_method: str = None) -> List[Planes]:
    """Driver: split GOPs, pad, shard over ('gop','tile'), decode, return
    per-frame full planes in input order."""
    from .gop import stack_gops

    gops = split_gops(frames)
    from .packed import gop_closed
    for gop in gops:
        if not gop_closed(gop):
            raise ValueError('GOP not closed (slice-gap frame exposes '
                             'pre-GOP plane content); decode off-mesh')
    n_gop = mesh.shape['gop']
    n_tile = mesh.shape['tile']
    g = max(1, -(-len(gops) // n_gop)) * n_gop
    fmax = max(len(x) for x in gops)
    stacked, _ = stack_gops(gops, g, fmax, mb_h * mb_w)
    mb_h_pad = -(-mb_h // n_tile) * n_tile
    stacked = _pad_rows(stacked, mb_h, mb_w, mb_h_pad)
    # halo sized from the DATA's actual MV reach (covers f_code > 2 and
    # full_pel streams), floored by the declared f_code
    halo = max(halo_mb_rows(f_code), halo_mb_for_mvs(batch_max_abs_mv(frames)))
    if halo > mb_h_pad // n_tile:
        raise ValueError(
            f'MV reach needs {halo} MB rows of halo > '
            f'{mb_h_pad // n_tile} rows per tile; use fewer tiles')
    outs = decode_gops_tiled(stacked, mb_h_pad, mb_w, halo, mb_h_pad, mesh,
                             mc_method=mc_method)
    result = []
    rows = mb_h * 16
    for gi, gop in enumerate(gops):
        for fi in range(len(gop)):
            result.append(Planes(outs.y[gi, fi][:rows],
                                 outs.cr[gi, fi][:rows >> 1],
                                 outs.cb[gi, fi][:rows >> 1]))
    return result


# ---------------------------------------------------------------------------
# Levels-wire variant: raw int16 VLC levels shard over the mesh and
# dequantize on device (half the host->device bytes of int32 coefficients,
# and the same device-side integer dequant the single-chip pipeline runs).
# ---------------------------------------------------------------------------

def _levels_step(carry, la, intra_q, non_intra_q, mb_h_local: int,
                 mb_w: int, halo_mb: int, mb_h_total: int, axis: str,
                 mc_method: str = None):
    from ..ops.frame import levels_to_frame
    f = levels_to_frame(la, intra_q, non_intra_q)
    return _tiled_step(carry, f, mb_h_local, mb_w, halo_mb, mb_h_total,
                       axis, mc_method=mc_method)


@functools.partial(jax.jit, static_argnames=('mb_h_pad', 'mb_w', 'halo_mb',
                                             'mb_h_total', 'mesh',
                                             'mc_method'))
def decode_gops_tiled_levels(stacked, intra_q: jnp.ndarray,
                             non_intra_q: jnp.ndarray, mb_h_pad: int,
                             mb_w: int, halo_mb: int, mb_h_total: int,
                             mesh: Mesh, mc_method: str = None):
    """stacked: LevelsArrays [G, F, mb_h_pad*mb_w, ...]; G shards over
    'gop', MB rows over 'tile'; dequant+premultiply run on device inside
    each shard (quant matrices replicate)."""
    from ..ops.frame import LevelsArrays
    n_tile = mesh.shape['tile']
    mb_h_local = mb_h_pad // n_tile
    cw = mb_w * 16
    rows_local = mb_h_local * 16

    def local(frames, iq, nq):
        step = functools.partial(
            _levels_step, intra_q=_pvary(iq, ('gop', 'tile')),
            non_intra_q=_pvary(nq, ('gop', 'tile')),
            mb_h_local=mb_h_local, mb_w=mb_w, halo_mb=halo_mb,
            mb_h_total=mb_h_total, axis='tile', mc_method=mc_method)
        return _gop_scan_local(frames, step, rows_local, cw)

    spec_mb = P('gop', None, 'tile')
    in_specs = (LevelsArrays(
        levels=spec_mb, qscale=spec_mb, coded=spec_mb, intra=spec_mb,
        written=spec_mb, mv_h=spec_mb, mv_v=spec_mb, valid=P('gop')),
        P(), P())
    out_specs = Planes(P('gop', None, 'tile'), P('gop', None, 'tile'),
                       P('gop', None, 'tile'))
    fn = shard_map(local, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    return fn(stacked, intra_q, non_intra_q)


def parse_levels_frames(es_or_parser, eof: bool = True):
    """Parse a stream into per-frame dense-levels dicts via the native
    batch parser (falls back to the Python parser's FrameData contract by
    raising if unavailable).  Returns (seq, [frame dicts])."""
    from ..host import best_parser
    if isinstance(es_or_parser, (bytes, bytearray, memoryview)):
        parser = best_parser()
        parser.write(bytes(es_or_parser))
    else:
        parser = es_or_parser
    if not hasattr(parser, 'parse_batch'):
        raise RuntimeError('stream needs the serial-exact path; '
                           'use decode_tiled (FrameData) instead')
    frames = []
    while True:
        b = parser.parse_batch(32, eof=eof, sparse=False, packed=False)
        if b == 'fallback':
            raise RuntimeError('stream needs the serial-exact path; '
                               'use decode_tiled (FrameData) instead')
        if b is None:
            break
        for i in range(b['n']):
            frames.append(dict(
                levels=b['levels'][i], qscale=b['qscale'][i],
                coded=b['coded'][i], intra=b['intra'][i],
                written=b['written'][i], mv=b['mv'][i],
                pic_type=int(b['pic_types'][i])))
        if b['n'] < 32:
            break
    return parser.seq, frames


def decode_tiled_levels(es: bytes, mesh: Mesh, f_code: int = 2,
                        mc_method: str = None) -> List[Planes]:
    """Driver for the levels-wire sharded decode: parse (C++ batch), split
    GOPs, stack [G, F, ...], shard over ('gop','tile'), decode."""
    from ..ops.frame import LevelsArrays

    from .gop import split_at_iframes

    seq, frames = parse_levels_frames(es)
    if not frames:
        return []
    mb_h, mb_w = seq.mb_height, seq.mb_width
    n_mb = mb_h * mb_w
    gops = split_at_iframes(frames, lambda f: f['pic_type'])
    from .packed import gop_closed
    for gop in gops:
        if not gop_closed(gop):
            raise ValueError('GOP not closed (slice-gap frame exposes '
                             'pre-GOP plane content); decode off-mesh')
    n_gop = mesh.shape['gop']
    n_tile = mesh.shape['tile']
    g = max(1, -(-len(gops) // n_gop)) * n_gop
    fmax = max(len(x) for x in gops)

    def stack_field(name, dtype, shape):
        out = np.zeros((g, fmax) + shape, dtype=dtype)
        for gi, gop in enumerate(gops):
            for fi, fr in enumerate(gop):
                out[gi, fi] = fr[name]
        return out

    mv = stack_field('mv', np.int32, (n_mb, 2))
    stacked = LevelsArrays(
        levels=stack_field('levels', np.int16, (n_mb, 6, 64)),
        qscale=stack_field('qscale', np.uint8, (n_mb,)),
        coded=stack_field('coded', bool, (n_mb, 6)),
        intra=stack_field('intra', bool, (n_mb,)),
        written=stack_field('written', bool, (n_mb,)),
        mv_h=np.ascontiguousarray(mv[..., 0]),
        mv_v=np.ascontiguousarray(mv[..., 1]),
        valid=np.array([[fi < len(gops[gi]) if gi < len(gops) else False
                         for fi in range(fmax)] for gi in range(g)]))
    mb_h_pad = -(-mb_h // n_tile) * n_tile
    stacked = LevelsArrays(*[
        _pad_mb_rows(np.asarray(v), mb_h, mb_w, mb_h_pad)
        for v in stacked])
    halo = max(halo_mb_rows(f_code), halo_mb_for_mvs(batch_max_abs_mv(frames)))
    if halo > mb_h_pad // n_tile:
        raise ValueError(
            f'MV reach needs {halo} MB rows of halo > '
            f'{mb_h_pad // n_tile} rows per tile; use fewer tiles')
    iq = jnp.asarray(seq.intra_quant_matrix, dtype=jnp.int32)
    nq = jnp.asarray(seq.non_intra_quant_matrix, dtype=jnp.int32)
    outs = decode_gops_tiled_levels(stacked, iq, nq, mb_h_pad, mb_w, halo,
                                    mb_h_pad, mesh, mc_method=mc_method)
    result = []
    rows = mb_h * 16
    for gi, gop in enumerate(gops):
        for fi in range(len(gop)):
            result.append(Planes(outs.y[gi, fi][:rows],
                                 outs.cr[gi, fi][:rows >> 1],
                                 outs.cb[gi, fi][:rows >> 1]))
    return result
