"""MPEG1 video decoder: host parse + TPU decode pipeline.

Public decoder with the reference's Decoder contract
(connect/write/decode/seek, cf. /root/reference/src/jsmpeg.js:43-54) built
TPU-first: the host parser turns the bitstream into dense per-frame tensors,
and a jitted `lax.scan` over frames runs dequant/IDCT/motion-comp/assembly
on device with the reference planes as the scan carry.
"""

from __future__ import annotations

import functools
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..host.mpeg1_parse import FrameData, MPEG1Parser
from ..ops.cumsum import indicator_cumsum
from ..ops.frame import FrameArrays, LevelsArrays, Planes, \
    blocks_to_planes, decode_frame_planes, decode_frame_step, \
    levels_to_frame, planes_to_blocks

def levels_scan_step(carry, la: LevelsArrays, intra_q, non_intra_q,
                     mb_h: int, mb_w: int, band_halo: int = None,
                     carry_layout: str = 'plane',
                     mc_method: str = None, n_seg: int = 1):
    """Shared lax.scan step for every levels-wire pipeline: dequant +
    IDCT + MC + assembly for one frame.  (A hand-scheduled Pallas
    dequant+IDCT alternative was measured slower than the XLA fusion and
    shelved to tools/idct_pallas_shelved.py; negative result in
    docs/PERF_ANALYSIS.md.)"""
    fr = levels_to_frame(la, intra_q, non_intra_q)
    return decode_frame_step(carry, fr, mb_h=mb_h, mb_w=mb_w,
                             band_halo=band_halo,
                             carry_layout=carry_layout,
                             mc_method=mc_method, n_seg=n_seg)


def frame_to_arrays(f: FrameData, valid: bool = True) -> FrameArrays:
    return FrameArrays(
        coef=f.coef.astype(np.int32),
        coded=f.coded,
        intra=f.intra,
        written=f.written,
        mv_h=f.mv[:, 0].astype(np.int32),
        mv_v=f.mv[:, 1].astype(np.int32),
        valid=np.asarray(valid),
    )


def empty_frame_arrays(n_mb: int) -> FrameArrays:
    return FrameArrays(
        coef=np.zeros((n_mb, 6, 64), np.int32),
        coded=np.zeros((n_mb, 6), bool),
        intra=np.zeros(n_mb, bool),
        written=np.zeros(n_mb, bool),
        mv_h=np.zeros(n_mb, np.int32),
        mv_v=np.zeros(n_mb, np.int32),
        valid=np.asarray(False),
    )


def stack_frames(frames: List[FrameArrays]) -> FrameArrays:
    return FrameArrays(*[np.stack([getattr(f, name) for f in frames])
                         for name in FrameArrays._fields])


@functools.partial(jax.jit, static_argnames=('mb_h', 'mb_w', 'mc_method'))
def decode_one(cur: Planes, fwd: Planes, f: FrameArrays,
               mb_h: int, mb_w: int, mc_method: str = None):
    (new_cur, new_fwd), out = decode_frame_step((cur, fwd), f, mb_h, mb_w,
                                                mc_method=mc_method)
    return new_cur, new_fwd, out


@functools.partial(jax.jit, static_argnames=('mb_h', 'mb_w', 'mc_method'))
def decode_scan(cur: Planes, fwd: Planes, stacked: FrameArrays,
                mb_h: int, mb_w: int, mc_method: str = None):
    """Decode a stack of frames with the reference planes as scan carry."""
    step = functools.partial(decode_frame_step, mb_h=mb_h, mb_w=mb_w,
                             mc_method=mc_method)
    (cur, fwd), outs = jax.lax.scan(step, (cur, fwd), stacked)
    return cur, fwd, outs


@functools.partial(jax.jit, static_argnames=('mb_h', 'mb_w', 'band_halo',
                                             'mc_method', 'n_seg'))
def decode_scan_levels(cur: Planes, fwd: Planes, stacked: LevelsArrays,
                       intra_q: jnp.ndarray, non_intra_q: jnp.ndarray,
                       mb_h: int, mb_w: int, band_halo: int = None,
                       mc_method: str = None, n_seg: int = 1):
    """Raw-levels pipeline: dequant+premultiply fused into the per-frame
    step (XLA fuses it with the IDCT), planes carried across the scan."""

    step = functools.partial(levels_scan_step, intra_q=intra_q,
                             non_intra_q=non_intra_q, mb_h=mb_h, mb_w=mb_w,
                             band_halo=band_halo, mc_method=mc_method,
                             n_seg=n_seg)
    (cur, fwd), outs = jax.lax.scan(step, (cur, fwd), stacked)
    return cur, fwd, outs


@functools.partial(jax.jit, static_argnames=('mb_h', 'mb_w', 'band_halo',
                                             'mc_method'))
def decode_scan_sparse(cur: Planes, fwd: Planes, sp_idx: jnp.ndarray,
                       sp_val: jnp.ndarray, rest: LevelsArrays,
                       intra_q: jnp.ndarray, non_intra_q: jnp.ndarray,
                       mb_h: int, mb_w: int, band_halo: int = None,
                       mc_method: str = None):
    """Sparse-coefficient pipeline: (index, value) pairs scatter into the
    dense level lattice on device (bandwidth-bound hosts upload ~10x fewer
    bytes), then the raw-levels scan runs unchanged.  Padding entries carry
    out-of-range indices and are dropped by the scatter."""
    f, n_mb = rest.qscale.shape
    flat = jnp.zeros((f * n_mb * 6 * 64,), jnp.int16)
    flat = flat.at[sp_idx].set(sp_val, mode='drop')
    stacked = rest._replace(levels=flat.reshape(f, n_mb, 6, 64))

    step = functools.partial(levels_scan_step, intra_q=intra_q,
                             non_intra_q=non_intra_q, mb_h=mb_h, mb_w=mb_w,
                             band_halo=band_halo, mc_method=mc_method)
    (cur, fwd), outs = jax.lax.scan(step, (cur, fwd), stacked)
    return cur, fwd, outs


def _bitmap_bytes(n_frames: int, n_mb: int) -> int:
    return (n_frames * n_mb + 7) // 8


def unpack_fused(buf: jnp.ndarray, n_frames: int, n_mb: int, n_runs: int,
                 mv_wide: bool = False, ids_blk: int = 0,
                 n_pairs: int = None, n_esc: int = None):
    """Decode the single-upload wire buffer into per-MB streams.

    Layout (wire v2, round 3): [valid F][run-start bitmap B=(F*n_mb+7)//8]
    [run records][sp_pos P][sp_v8 i8 P][sp_esc LE i16 2*E].  P and E
    arrive as the static args n_pairs/n_esc (eighth-octave buckets, the
    escape stream sized on its own); with n_pairs=None the legacy
    length-derivation applies: P = (len-F-B-wR)*4//9 and E = P//8 (the
    mesh paths keep this form so cells agree on one shape).
    Per-MB metadata is run-length encoded over
    (flags, cbp, mv) tuples, but the run LENGTHS never ride the wire:
    one bit per MB marks run starts (bitorder little), and the device
    expands them with a single exact MXU cumsum -- smaller than the old
    u16 lengths (8 B/run) AND cheaper than the start-scatter it replaces.
    Run records are w=4 bytes [flags, cbp, mv_h i8, mv_v i8] when every
    |mv| fits int8 (the common case; one int32 row-take per MB), or
    w=8 bytes [mv_h i16, mv_v i16, flags, cbp, 0, 0] when the batch
    carries wide vectors (static `mv_wide`, a separate jit variant).
    Coefficient values ride as int8 with -128 escaping to the int16 side
    stream (~2 B/coefficient on the wire).

    With `ids_blk` > 0 (the `wire_ids` fast-link option) the wire also
    carries [fpb u16 F][blk_rel u16 ids_blk] between the records and the
    pair streams: per-frame coded-block counts and each coded block's
    within-frame id (mb*6 + blk, emission order; 0xFFFF pads).  The
    device then skips the coded-mask ordinal computation entirely (see
    packed_to_levels) at +2 B/coded block of upload -- only worth it
    where H2D is cheap.

    Returns (valid[F], flags[F,n_mb], cbp[F,n_mb], mv16[F,n_mb,2],
    sp_pos[P], sp_val[P], blk_dense[ids_blk] int32 or None)."""
    F = n_frames
    R = n_runs
    B = _bitmap_bytes(F, n_mb)
    w = 8 if mv_wide else 4
    ids_bytes = 2 * F + 2 * ids_blk if ids_blk else 0
    if n_pairs is None:     # legacy: sizes derivable from length alone
        P = (buf.shape[0] - F - B - w * R - ids_bytes) * 4 // 9
        E = P // 8
    else:                   # fine-bucketed: escape stream sized on its own
        P = n_pairs
        E = P // 8 if n_esc is None else n_esc
    o = F
    valid = buf[:F] != 0
    bm = buf[o:o + B]
    o += B
    rec = buf[o:o + w * R]
    o += w * R
    blk_dense = None
    if ids_blk:
        fpb = jax.lax.bitcast_convert_type(
            buf[o:o + 2 * F].reshape(F, 2), jnp.uint16).astype(jnp.int32)
        o += 2 * F
        blk16 = jax.lax.bitcast_convert_type(
            buf[o:o + 2 * ids_blk].reshape(ids_blk, 2), jnp.uint16)
        o += 2 * ids_blk
        # frame of each coded block: scatter-add a 1 at every frame's
        # first block ordinal (empty frames stack their start on the
        # next frame's; per-slot counts stay <= F, bf16-exact), one MXU
        # cumsum, minus one
        starts = jnp.cumsum(fpb) - fpb
        ones = jnp.zeros((ids_blk,), jnp.float32).at[starts].add(
            1.0, mode='drop')
        framei = indicator_cumsum(ones, vmax=256) - 1
        blk_dense = jnp.where(blk16 == jnp.uint16(0xFFFF),
                              F * n_mb * 6,
                              framei * (n_mb * 6) + blk16.astype(jnp.int32))
    sp_pos = buf[o:o + P]
    o += P
    sp_v8 = jax.lax.bitcast_convert_type(buf[o:o + P], jnp.int8)
    o += P
    sp_esc = jax.lax.bitcast_convert_type(
        buf[o:o + 2 * E].reshape(E, 2), jnp.int16)
    is_esc = sp_v8 == -128
    eslot = jnp.clip(indicator_cumsum(is_esc) - 1, 0, E - 1)
    sp_val = jnp.where(is_esc, sp_esc[eslot], sp_v8.astype(jnp.int16))

    # expand runs -> per-MB streams: run slot per MB = (number of run
    # starts at or before the MB) - 1, straight off the bitmap with one
    # exact MXU cumsum (ops/cumsum.py).  MBs of padding frames (no run
    # starts) read the last real run's values, discarded by the valid
    # mask; an all-empty cell reads the zero record (flags 0: not
    # written, not coded).
    bits = ((bm[:, None] >> jnp.arange(8, dtype=jnp.uint8)) & 1)
    slot = jnp.maximum(
        indicator_cumsum(bits.reshape(-1)[:F * n_mb]) - 1, 0)
    if mv_wide:
        tbl = jax.lax.bitcast_convert_type(
            rec.reshape(R, 2, 4), jnp.int32)
        taken = jnp.take(tbl, slot, axis=0)
        mv16 = jax.lax.bitcast_convert_type(
            taken[:, 0], jnp.int16).reshape(F, n_mb, 2)
        meta = taken[:, 1]
        flags = (meta & 0xFF).astype(jnp.uint8).reshape(F, n_mb)
        cbp = ((meta >> 8) & 0xFF).astype(jnp.uint8).reshape(F, n_mb)
    else:
        # ONE int32 column: [flags, cbp, mv_h i8, mv_v i8] per record --
        # a single-column gather (cost is per index on TPU)
        tbl = jax.lax.bitcast_convert_type(rec.reshape(R, 4), jnp.int32)
        taken = jnp.take(tbl, slot, axis=0)
        bu = jax.lax.bitcast_convert_type(taken, jnp.uint8)
        bi = jax.lax.bitcast_convert_type(taken, jnp.int8)
        flags = bu[:, 0].reshape(F, n_mb)
        cbp = bu[:, 1].reshape(F, n_mb)
        mv16 = bi[:, 2:4].astype(jnp.int16).reshape(F, n_mb, 2)
    return valid, flags, cbp, mv16, sp_pos, sp_val, blk_dense


@functools.partial(jax.jit,
                   static_argnames=('mb_h', 'mb_w', 'n_frames', 'n_blk',
                                    'n_runs', 'band_halo', 'mv_wide',
                                    'wire_ids', 'block_carry', 'n_pairs',
                                    'n_esc', 'mc_method', 'n_seg'))
def decode_scan_fused(cur: Planes, fwd: Planes, buf: jnp.ndarray,
                      intra_q: jnp.ndarray, non_intra_q: jnp.ndarray,
                      mb_h: int, mb_w: int, n_frames: int, n_blk: int,
                      n_runs: int, band_halo: int = None,
                      mv_wide: bool = False, wire_ids: bool = False,
                      block_carry: bool = False, n_pairs: int = None,
                      n_esc: int = None, mc_method: str = None,
                      n_seg: int = 1, valid_seg: jnp.ndarray = None):
    """Single-upload variant of decode_scan_packed: the whole batch rides
    in ONE uint8 buffer (one transport round trip on high-latency links);
    see unpack_fused for the wire layout.

    n_seg > 1 decodes `n_seg` independent streams stacked along MB rows
    as ONE joint frame per step (mb_h = n_seg * per-stream mb_h): motion
    clamps at segment boundaries (ops/motion.py) and `valid_seg`
    (bool [n_frames, n_seg]) masks each stream's padding frames so
    unequal-length streams ride one scan (parallel/streams.py)."""
    valid, flags, cbp, mv16, sp_pos, sp_val, blk_dense = unpack_fused(
        buf, n_frames, mb_h * mb_w, n_runs, mv_wide,
        n_blk if wire_ids else 0, n_pairs=n_pairs, n_esc=n_esc)
    if valid_seg is not None:
        valid = valid[:, None] & valid_seg
    return _scan_packed(cur, fwd, flags, cbp, mv16, sp_pos, sp_val,
                        intra_q, non_intra_q, valid, mb_h, mb_w, n_blk,
                        band_halo, blk_dense, block_carry, mc_method,
                        n_seg)


# coefficient-scatter segment size: XLA compile time for one big scatter
# grows superlinearly with its size (393K pairs ~100 s, 3.1M pairs ~890 s
# over the tunnel), so larger pair buckets scatter in fixed-size segments
# under a fori_loop -- the compiled graph holds ONE segment-sized scatter
SCATTER_SEG = 393216

# packed_to_levels formulation crossover (total dense blocks F*n_mb*6):
# at or above this, per-pair direct flat scatter beats the compact
# lattice + row-wise expand (measured round 5: 1080p/32f 1.57M blocks,
# direct 17 ms vs expand 69 ms; 720p/32f 0.69M blocks, expand wins ~3%)
P2L_DIRECT_MIN_BLOCKS = 1 << 20


def _scatter_pairs(flat: jnp.ndarray, idx: jnp.ndarray,
                   val: jnp.ndarray) -> jnp.ndarray:
    """flat.at[idx].set(val, drop) in SCATTER_SEG-sized segments.  idx is
    unique-or-out-of-range within a batch, so segment order is free."""
    P = idx.shape[0]
    if P <= SCATTER_SEG:
        return flat.at[idx].set(val, mode='drop')
    assert P % SCATTER_SEG == 0

    def body(i, f):
        s = i * SCATTER_SEG
        ii = jax.lax.dynamic_slice(idx, (s,), (SCATTER_SEG,))
        vv = jax.lax.dynamic_slice(val, (s,), (SCATTER_SEG,))
        return f.at[ii].set(vv, mode='drop')

    return jax.lax.fori_loop(0, P // SCATTER_SEG, body, flat)


def packed_to_levels(flags: jnp.ndarray, cbp: jnp.ndarray,
                     mv16: jnp.ndarray, sp_pos: jnp.ndarray,
                     sp_val: jnp.ndarray, valid: jnp.ndarray,
                     n_blk: int, blk_dense: jnp.ndarray = None
                     ) -> LevelsArrays:
    """Packed-wire -> dense LevelsArrays (3 B/coefficient + 8 B/MB on the
    wire): per-MB metadata rides packed into bytes and coefficients as
    (pos, value) pairs whose block association is carried by flag bits
    (bit 7 = first pair of a coded block, bit 6 = empty-coded-block
    marker).  The device rebuilds global scatter indices from the cbp
    bitmap: coded-block ids in row-major (frame, mb, block) order match
    the host's emission order."""
    F, n_mb = flags.shape
    qscale = (flags & 31).astype(jnp.uint8)
    intra = (flags & 0x20) != 0
    written = (flags & 0x40) != 0
    coded = (cbp[..., None] & (1 << jnp.arange(6, dtype=jnp.uint8))) != 0
    oob = F * n_mb * 6
    if blk_dense is None:
        # coded-block ids in row-major order, fixed-size formulation
        # (the scatter is sized by the mask, not by n_blk: one compile
        # shape).  With wire_ids the host ships these ids instead
        # (blk_dense from unpack_fused) and this block never runs.
        mask = coded.reshape(-1)
        dst = jnp.where(mask, indicator_cumsum(mask) - 1, n_blk + 1)
        blk_dense = jnp.full((n_blk + 1,), oob, jnp.int32).at[dst].set(
            jnp.arange(mask.shape[0], dtype=jnp.int32),
            mode='drop')[:n_blk]
    slot = indicator_cumsum(sp_pos >> 7) - 1
    pair_ok = (sp_pos & 0x40) == 0
    if oob >= P2L_DIRECT_MIN_BLOCKS:
        # large grids: pairs scatter DIRECTLY into the dense lattice
        # (gather each pair's flat block id from the ordinal map, one
        # per-pair scatter).  Round 2 measured the compact+row-expand
        # formulation below as the winner at 720p; round 5 re-measured
        # at 1080p where the row expand dominates packed_to_levels (69
        # of 85 ms -- HALF the whole decode step) while this direct
        # scatter does the same job in 17 ms, bit-identical: 1080p went
        # 190 -> 298 fps at otherwise-default flags.  720p (0.69M
        # blocks) stays on the row-expand path, which is ~3% faster
        # there (docs/PERF_ANALYSIS.md round-5 section).
        gid = blk_dense[jnp.clip(slot, 0, n_blk - 1)]
        fidx = jnp.where(pair_ok,
                         gid * 64 + (sp_pos & 63).astype(gid.dtype),
                         oob * 64)
        flat = jnp.zeros((F * n_mb * 6 * 64,), jnp.int16)
        flat = _scatter_pairs(flat, fidx, sp_val).reshape(F * n_mb * 6, 64)
    else:
        # small grids: compact per-coded-block lattice by ordinal, then
        # one row-wise expand (n_blk row updates)
        cidx = jnp.where(pair_ok,
                         jnp.clip(slot, 0, n_blk - 1) * 64
                         + (sp_pos & 63).astype(slot.dtype),
                         n_blk * 64)
        compact = jnp.zeros((n_blk * 64,), jnp.int16)
        compact = _scatter_pairs(compact, cidx, sp_val).reshape(n_blk, 64)
        flat = jnp.zeros((F * n_mb * 6, 64), jnp.int16).at[blk_dense].set(
            compact, mode='drop')
    return LevelsArrays(
        levels=flat.reshape(F, n_mb, 6, 64), qscale=qscale, coded=coded,
        intra=intra, written=written, mv_h=mv16[..., 0].astype(jnp.int32),
        mv_v=mv16[..., 1].astype(jnp.int32), valid=valid)


@functools.partial(jax.jit, static_argnames=('mb_h', 'mb_w', 'n_blk',
                                              'band_halo', 'block_carry',
                                              'mc_method', 'n_seg'))
def decode_scan_packed(cur: Planes, fwd: Planes, flags: jnp.ndarray,
                       cbp: jnp.ndarray, mv16: jnp.ndarray,
                       sp_pos: jnp.ndarray, sp_val: jnp.ndarray,
                       intra_q: jnp.ndarray, non_intra_q: jnp.ndarray,
                       valid: jnp.ndarray, mb_h: int, mb_w: int, n_blk: int,
                       band_halo: int = None,
                       blk_dense: jnp.ndarray = None,
                       block_carry: bool = False,
                       mc_method: str = None, n_seg: int = 1):
    """Packed-wire pipeline: see packed_to_levels for the wire format.

    block_carry=True scans with the reference planes carried in MB-block
    layout (one uint8 relayout per plane per step instead of two,
    ops/frame.py) and converts carry + stacked outputs at the batch
    boundaries; the external contract is identical."""
    stacked = packed_to_levels(flags, cbp, mv16, sp_pos, sp_val, valid,
                               n_blk, blk_dense)

    if block_carry:
        cur = planes_to_blocks(cur, mb_h, mb_w)
        fwd = planes_to_blocks(fwd, mb_h, mb_w)
    step = functools.partial(
        levels_scan_step, intra_q=intra_q,
        non_intra_q=non_intra_q, mb_h=mb_h, mb_w=mb_w,
        band_halo=band_halo,
        carry_layout='block' if block_carry else 'plane',
        mc_method=mc_method, n_seg=n_seg)
    (cur, fwd), outs = jax.lax.scan(step, (cur, fwd), stacked)
    if block_carry:
        cur = blocks_to_planes(cur, mb_h, mb_w)
        fwd = blocks_to_planes(fwd, mb_h, mb_w)
        # one batched relayout per plane for the whole scan's outputs
        unblk = lambda x, b: x.transpose(0, 1, 3, 2, 4).reshape(
            x.shape[0], mb_h * b, mb_w * b)
        outs = Planes(unblk(outs.y, 16), unblk(outs.cr, 8),
                      unblk(outs.cb, 8))
    return cur, fwd, outs


def _scan_packed(cur, fwd, flags, cbp, mv16, sp_pos, sp_val, intra_q,
                 non_intra_q, valid, mb_h, mb_w, n_blk, band_halo=None,
                 blk_dense=None, block_carry=False, mc_method=None,
                 n_seg=1):
    return decode_scan_packed.__wrapped__(cur, fwd, flags, cbp, mv16,
                                          sp_pos, sp_val, intra_q,
                                          non_intra_q, valid, mb_h, mb_w,
                                          n_blk, band_halo, blk_dense,
                                          block_carry, mc_method, n_seg)


def _bucket(n: int, lo: int = 4096) -> int:
    """Smallest {2^k, 1.5*2^k} >= n: bounded jit variants, <=33% padding."""
    b = lo
    while b < n:
        h = b + (b >> 1)
        if h >= n:
            return h
        b <<= 1
    return b


def _bucket_fine(n: int, lo: int = 4096) -> int:
    """Smallest m*2^k >= n with m in 8..15 (eighth-octave steps,
    <=12.5% padding).  The wire is upload-bound on the tunneled
    transport, so bucket padding is paid in real transfer time; callers
    that need stability across batches add stickiness on top
    (_sticky_bucket) rather than coarser steps."""
    if n <= lo:
        return lo
    k = max((n - 1).bit_length() - 4, 0)
    m = -(-n >> k) if k else n          # ceil(n / 2^k)
    return m << k


# fine buckets pay only at scale: below this many slots the absolute
# padding of a coarse step is a few kB while every extra bucket value is
# a full XLA recompile (~100 s over the tunnel), so small sizes stay on
# the coarse {2^k, 1.5*2^k} steps whose floors absorb batch-to-batch
# wander
FINE_MIN = 32768


def _wire_bucket(n: int, lo: int) -> int:
    n = max(n, 1)
    return _bucket(n, lo) if n <= FINE_MIN else _bucket_fine(n, lo)


def _sticky_bucket(floors: dict, key: str, fine: int) -> int:
    """Reuse the caller's previous bucket while it still fits and wastes
    <= ~25% over the current fine bucket -- a stream whose sizes wander
    across one bucket boundary then compiles ONE jit variant, not two."""
    if floors is None:
        return fine
    prev = floors.get(key)
    if prev is not None and fine <= prev <= fine + (fine >> 2):
        return prev
    floors[key] = fine
    return fine


_POPCOUNT8 = np.array([bin(x).count('1') for x in range(256)], np.int64)


def split_packed_batch(batch: dict) -> list:
    """Split a packed batch into frame groups of <= SCATTER_SEG coefficient
    pairs each.  Big-pair jit variants compile pathologically slowly over
    the tunnel (~16 min for 3M pairs vs ~100 s for one segment), so
    coefficient-dense batches run as several scans of the SAME small
    variant, threading the reference planes through the carry."""
    n = batch['n']
    pairs_pf = batch.get('pairs_pf')
    if pairs_pf is None or n <= 1 or len(batch['sp_pos']) <= SCATTER_SEG:
        return [batch]
    groups = []
    start, acc = 0, 0
    for k in range(n):
        if start < k and acc + int(pairs_pf[k]) > SCATTER_SEG:
            groups.append((start, k))
            start, acc = k, 0
        acc += int(pairs_pf[k])
    groups.append((start, n))
    if len(groups) == 1:
        return [batch]
    pp = np.concatenate([[0], np.cumsum(pairs_pf)])
    rr = np.concatenate([[0], np.cumsum(batch['runs_pf'])])
    ee = np.concatenate([[0], np.cumsum(batch['escs_pf'])])
    out = []
    for a, b in groups:
        rl = batch['run_len'][rr[a]:rr[b]]
        rc = batch['run_cbp'][rr[a]:rr[b]]
        out.append(dict(
            n=b - a,
            run_len=rl,
            run_flags=batch['run_flags'][rr[a]:rr[b]],
            run_cbp=rc,
            run_mv=batch['run_mv'][rr[a]:rr[b]],
            sp_pos=batch['sp_pos'][pp[a]:pp[b]],
            sp_v8=batch['sp_v8'][pp[a]:pp[b]],
            sp_esc=batch['sp_esc'][ee[a]:ee[b]],
            n_blocks=int((_POPCOUNT8[rc] * rl.astype(np.int64)).sum()),
            pic_types=batch['pic_types'][a:b]))
    return out


def _pair_bucket(n: int) -> int:
    """Pair-count bucket: {2^k, 1.5*2^k} below one scatter segment, then
    whole multiples of SCATTER_SEG (the jit variant holds one segment-
    sized scatter either way; see _scatter_pairs)."""
    if n <= SCATTER_SEG:
        return _bucket(n)
    return -(-n // SCATTER_SEG) * SCATTER_SEG


def _pair_bucket_fine(n: int) -> int:
    """Size-thresholded pair bucket below one scatter segment, then
    whole multiples of SCATTER_SEG (single-chip fused path; the mesh
    paths keep the coarse buckets so cells agree on one shape)."""
    if n <= SCATTER_SEG:
        return min(_wire_bucket(n, 4096), SCATTER_SEG)
    return -(-n // SCATTER_SEG) * SCATTER_SEG


def fused_pair_bucket(total: int, n_esc: int) -> int:
    """Pair bucket large enough for `total` pairs AND `n_esc` escapes
    (the escape stream caps at bucket//8)."""
    bucket = _pair_bucket(max(total, 1))
    while bucket // 8 < n_esc:        # escape stream must fit its P//8 cap
        bucket = _pair_bucket(bucket + 1)
    return bucket


def mv_fits_narrow(mv: np.ndarray) -> bool:
    """True when every component of an int16 MV array fits int8 (the
    narrow 4-byte run record)."""
    return bool(mv.size == 0 or (mv.min() >= -128 and mv.max() <= 127))


def fused_buffer_len(n_frames: int, n_mb: int, n_pairs: int, n_runs: int,
                     mv_wide: bool, ids_blk: int = 0,
                     n_esc: int = None) -> int:
    """Total wire-v2 buffer length for the given static sizes.  n_esc
    sizes the int16 escape side stream independently (the fine-bucketed
    single-chip path); None keeps the legacy n_pairs//8 reserve whose
    size is derivable from the buffer length alone (mesh paths)."""
    return (n_frames + _bitmap_bytes(n_frames, n_mb)
            + (8 if mv_wide else 4) * n_runs
            + (2 * n_frames + 2 * ids_blk if ids_blk else 0)
            + 2 * n_pairs
            + 2 * (n_pairs // 8 if n_esc is None else n_esc))


def build_fused_buffer(batch: dict, n_frames: int, n_mb: int,
                       wire_ids: bool = False, sticky: dict = None):
    """Assemble the single-upload wire buffer for decode_scan_fused from a
    packed parse_batch dict.  Returns (buf uint8, n_blk, n_runs, mv_wide,
    n_pairs, n_esc) with bucketed static sizes (see unpack_fused for the
    layout).

    Sizes use eighth-octave buckets (<=12.5% padding: the wire is
    upload-bound, so every padding byte is paid in transfer time) with
    an independently-sized escape stream.  `sticky` is an optional
    mutable dict the caller carries across batches: sizes that wander
    across one bucket boundary then reuse the previous bucket instead of
    compiling a second jit variant."""
    if n_frames == 1:
        # streaming/latency path: per-frame sizes vary every dispatch and
        # the whole wire is ~36 kB, so fine buckets would trade compile
        # stalls (a new jit variant per boundary crossed) for a ~0.4 ms
        # upload saving -- keep the coarse steps here
        n_pairs = fused_pair_bucket(len(batch['sp_pos']),
                                    len(batch['sp_esc']))
        n_esc = None
        n_runs = _bucket(max(len(batch['run_len']), 1), lo=256)
    else:
        n_pairs = _sticky_bucket(
            sticky, 'pairs', _pair_bucket_fine(max(len(batch['sp_pos']), 1)))
        n_esc = _sticky_bucket(sticky, 'esc',
                               _wire_bucket(len(batch['sp_esc']), lo=1024))
        n_runs = _sticky_bucket(sticky, 'runs',
                                _wire_bucket(len(batch['run_len']), lo=512))
    n_blk = _bucket(max(batch['n_blocks'], 1), lo=1024)
    mv_wide = not mv_fits_narrow(batch['run_mv'])
    buf = build_fused_buffer_sized(batch, n_frames, n_pairs, n_runs, n_mb,
                                   mv_wide, n_blk if wire_ids else 0,
                                   n_esc=n_esc)
    return buf, n_blk, n_runs, mv_wide, n_pairs, n_esc


def build_fused_buffer_sized(batch: dict, n_frames: int, n_pairs: int,
                             n_runs: int, n_mb: int,
                             mv_wide: bool = False,
                             ids_blk: int = 0,
                             n_esc: int = None) -> np.ndarray:
    """build_fused_buffer with caller-fixed bucket sizes (mesh cells share
    one shape so the sharded decode compiles once).  n_esc=None keeps the
    legacy n_pairs//8 escape reserve (length-derivable, mesh paths)."""
    F = n_frames
    n = batch['n']
    total = len(batch['sp_pos'])
    actual_esc = len(batch['sp_esc'])
    esc_cap = n_pairs // 8 if n_esc is None else n_esc
    bucket = n_pairs
    rt = len(batch['run_len'])
    assert total <= bucket and actual_esc <= esc_cap and rt <= n_runs
    B = _bitmap_bytes(F, n_mb)
    w = 8 if mv_wide else 4
    buf = np.zeros(fused_buffer_len(F, n_mb, bucket, n_runs, mv_wide,
                                    ids_blk, n_esc=n_esc), dtype=np.uint8)
    buf[:F] = np.arange(F) < n
    o = F
    # run-start bitmap: bit (i & 7) of byte (i >> 3) marks MB i opening a
    # run.  Real runs are never empty (the RLE invariant; asserted --
    # an empty mid-stream run would desync slot<->record), so start
    # positions are distinct and the device's bit-cumsum numbers runs in
    # record order.
    lens = batch['run_len'].astype(np.int64)
    assert rt == 0 or (lens.min() > 0 and lens.sum() <= F * n_mb)
    starts = np.cumsum(lens) - lens
    bm = np.zeros(B, np.uint8)
    np.bitwise_or.at(bm, starts >> 3, (1 << (starts & 7)).astype(np.uint8))
    buf[o:o + B] = bm
    o += B
    rec = np.zeros((n_runs, w), np.uint8)
    mv = batch['run_mv']
    if mv_wide:
        rec[:rt, 0:4] = mv.astype('<i2').reshape(rt, 2).view(
            np.uint8).reshape(rt, 4)
        rec[:rt, 4] = batch['run_flags']
        rec[:rt, 5] = batch['run_cbp']
    else:
        assert mv_fits_narrow(mv)
        rec[:rt, 0] = batch['run_flags']
        rec[:rt, 1] = batch['run_cbp']
        rec[:rt, 2:4] = mv.astype(np.int8).reshape(rt, 2).view(np.uint8)
    buf[o:o + w * n_runs] = rec.reshape(-1)
    o += w * n_runs
    if ids_blk:
        # per-frame coded-block counts + per-coded-block within-frame
        # ids, emission order (the wire_ids fast-link option)
        if n_mb * 6 > 0xFFFE:
            raise ValueError(
                f'wire_ids block ids are uint16 (0xFFFF = padding '
                f'sentinel); a {n_mb}-MB grid needs ids up to '
                f'{n_mb * 6 - 1} — disable wire_ids for this geometry')
        cb_mb = np.repeat(batch['run_cbp'], lens)
        fpb = np.zeros(F, '<u2')
        if n:
            fpb[:n] = _POPCOUNT8[cb_mb].reshape(n, n_mb).sum(axis=1)
        buf[o:o + 2 * F] = fpb.view(np.uint8)
        o += 2 * F
        coded6 = (cb_mb[:, None] >> np.arange(6, dtype=np.uint8)) & 1
        rel = ((np.arange(n * n_mb, dtype=np.int64) % n_mb)[:, None] * 6
               + np.arange(6))
        blk_rel = rel[coded6.astype(bool)]
        assert len(blk_rel) <= ids_blk
        ids = np.full(ids_blk, 0xFFFF, '<u2')
        ids[:len(blk_rel)] = blk_rel
        buf[o:o + 2 * ids_blk] = ids.view(np.uint8)
        o += 2 * ids_blk
    # padding pairs: bit 6 set (never scattered), bit 7 clear (do not
    # advance the block slot); padding values 0 (not the escape sentinel)
    buf[o:o + bucket] = 0x40
    buf[o:o + total] = batch['sp_pos']
    o += bucket
    buf[o:o + total] = batch['sp_v8'].view(np.uint8)
    o += bucket
    buf[o:o + 2 * actual_esc] = batch['sp_esc'].view(np.uint8)
    return buf


class PlanesBatch:
    """Lazy view over the stacked output of one device scan: slicing a
    frame out of the batch is a device op (a dispatch over the transport),
    so it happens only when a frame is actually touched."""

    def __init__(self, outs: Planes, n: int):
        self._outs = outs
        self._n = n

    def __len__(self) -> int:
        return self._n

    def frame(self, i: int) -> Planes:
        if not -self._n <= i < self._n:
            raise IndexError(i)
        i = i % self._n
        o = self._outs
        return Planes(o.y[i], o.cr[i], o.cb[i])

    def fetch_all(self) -> Planes:
        """All frames as ONE host readback per plane (numpy [n, H, W]):
        3 RPC round trips for the whole batch instead of 3 per frame."""
        from ..utils import fetch
        o = self._outs
        return Planes(fetch(o.y[:self._n]), fetch(o.cr[:self._n]),
                      fetch(o.cb[:self._n]))


class FrameSeq:
    """List-like concatenation of PlanesBatch chunks + eager Planes.

    Frames decoded under retain=False were rendered to the destination and
    their device arrays released; they count toward len() but indexing
    them raises (there is nothing left to return)."""

    def __init__(self):
        self._chunks: list = []
        self._len = 0
        self._released = 0

    def append_batch(self, batch: PlanesBatch) -> None:
        self._chunks.append(batch)
        self._len += len(batch)

    def append(self, planes: Planes) -> None:
        self._chunks.append(planes)
        self._len += 1

    def count_only(self, n: int) -> None:
        """Record frames that were already consumed (rendered + released)
        without retaining their device arrays."""
        self._released += n

    def __len__(self) -> int:
        return self._released + self._len

    def __getitem__(self, i: int):
        total = self._released + self._len
        if not -total <= i < total:
            raise IndexError(i)
        i = i % total
        if i < self._released:
            raise IndexError(
                f'frame {i} was rendered and released (retain=False)')
        i -= self._released
        for c in self._chunks:
            n = len(c) if isinstance(c, PlanesBatch) else 1
            if i < n:
                return c.frame(i) if isinstance(c, PlanesBatch) else c
            i -= n
        raise IndexError(i)

    def __iter__(self):
        for i in range(self._released, self._released + self._len):
            yield self[i]

    def stacked_planes(self) -> Optional[Planes]:
        """Every retained frame as ONE stacked Planes ([n, H, W] per
        plane): whole-chunk slices concatenated in a single device op,
        so a later host fetch costs 3 RPCs per BATCH instead of 3 per
        frame (the demoted-stream serving path, parallel/streams.py).
        None when nothing is retained."""
        ys, crs, cbs = [], [], []
        for c in self._chunks:
            if isinstance(c, PlanesBatch):
                o = c._outs
                ys.append(o.y[:c._n])
                crs.append(o.cr[:c._n])
                cbs.append(o.cb[:c._n])
            else:
                ys.append(c.y[None])
                crs.append(c.cr[None])
                cbs.append(c.cb[None])
        if not ys:
            return None
        cat = lambda xs: xs[0] if len(xs) == 1 else jnp.concatenate(xs)
        return Planes(cat(ys), cat(crs), cat(cbs))


_upload_probe: dict = {}

# wire_ids costs +2 B per coded block of upload and saves the device-side
# coded-ordinal cumsum (measured +8% device rate, BENCH_r04 ids A/B row).
# It pays off iff H2D is fast enough that the extra bytes cost less than
# the saved device time: ~0.2 MB extra per 32-frame 720p batch needs to
# upload in under the ~3 ms it saves -> ~100 MB/s breakeven; threshold set
# 2x above it so the slow tunneled link here stays comfortably OFF.
WIRE_IDS_FAST_LINK_MB_S = 200.0


def transport_upload_mb_s(refresh: bool = False) -> float:
    """One-shot per-process H2D probe: device_put a 1 MB buffer and force
    materialization with a tiny fetch (block_until_ready returns early on
    some transports).  Cached so serving fleets pay it once."""
    if _upload_probe and not refresh:
        return _upload_probe['mb_s']
    import time

    from ..utils import fetch
    buf = np.zeros(1 << 20, np.uint8)
    np.asarray(fetch(jax.device_put(buf[:4096])[:4]))   # wake link + jit
    best = 0.0
    for _ in range(2):
        t0 = time.monotonic()
        np.asarray(fetch(jax.device_put(buf)[:4]))
        best = max(best, len(buf) / 1e6 / (time.monotonic() - t0))
    _upload_probe['mb_s'] = best
    return best


def auto_wire_ids() -> bool:
    """The wire_ids policy: ship ids on fast H2D links, save the bytes on
    slow ones (see WIRE_IDS_FAST_LINK_MB_S)."""
    try:
        return transport_upload_mb_s() >= WIRE_IDS_FAST_LINK_MB_S
    except Exception:       # no usable device: the flag is moot
        return False


def tuned_mc_flags(n_mb: int, mc_method=None, block_carry=None,
                   joint: bool = False):
    """Geometry-tuned (mc_method, block_carry) shared by the single-stream
    decoder and the serving fleets.  Explicit settings win.  With both
    unset, grids of >= MPEG1Decoder.BIG_FRAME_MBS on an accelerator use
    the round-5 sweep winners: single-frame grids flip to fused_pair +
    block-space carry jointly (1080p 298 -> 361 fps; each flag alone
    measured as a loss); stacked JOINT grids (joint=True) take
    fused_pair alone (the stacked S=4 sweep: fp 631 > fp+bc 621 >
    default 613)."""
    if mc_method is None and block_carry is None:
        if (n_mb >= MPEG1Decoder.BIG_FRAME_MBS
                and jax.default_backend() != 'cpu'):
            return 'fused_pair', not joint
    return mc_method, bool(block_carry)


def resolve_wire_ids(value) -> object:
    """Normalize a wire_ids option/env value: True/False pass through,
    None/''/'auto' defer to the transport probe (returned as 'auto' for
    lazy resolution), '0'/'false' disable."""
    if isinstance(value, bool):
        return value
    if value in (None, '', 'auto'):
        return 'auto'
    return value not in ('0', 'false', 'False', 0)


class MPEG1Decoder:
    """Streaming-capable MPEG1 video decoder (TPU pipeline).

    write() bytes in, decode() one frame out -- or decode_available() to
    batch every parsed picture through a single device scan (the
    high-throughput path).
    """

    def __init__(self, options: Optional[dict] = None):
        options = options or {}
        use_native = options.get('native')
        if use_native is None:
            from ..host import best_parser
            self.parser = best_parser()
        elif use_native:
            from ..host.native import NativeMPEG1Parser
            self.parser = NativeMPEG1Parser()
        else:
            self.parser = MPEG1Parser()
        self.destination = None
        self._cur: Optional[Planes] = None
        self._fwd: Optional[Planes] = None
        self.frame_rate = 30.0
        self.on_decode = options.get('onVideoDecode')
        self.decode_first_frame = options.get('decodeFirstFrame', False)
        self._first_frame_done = False
        self.frames_decoded = 0
        # timestamp collection for static-file A/V sync + seek
        # (semantics of the reference Decoder.Base, src/decoder.js:36-102)
        self.streaming = bool(options.get('streaming'))
        # fast-link wire option: ship coded-block ids (+2 B/block) so the
        # device skips the ordinal computation.  Default 'auto': resolved
        # lazily from a one-shot H2D transport probe (fast links turn it
        # on, the tunneled upload-bound link here stays off).  Explicit
        # option or env ('0'/'false' = OFF, '1' = ON, 'auto') wins.
        wi = options.get('wire_ids')
        if wi is None:
            wi = os.environ.get('JSMPEG_TPU_WIRE_IDS')
        self._wire_ids = resolve_wire_ids(wi)
        # scan-carry layout: carry reference planes in MB-block layout
        # (halves per-step uint8 relayouts).  Default auto (None): OFF at
        # 720p-class geometry, ON jointly with fused_pair MC at
        # 1080p-class (the round-5 sweep winners; see _tuned_flags).
        # Env '0'/'false' forces OFF, '1' forces ON, ''/'auto' = auto.
        bc = options.get('block_carry')
        if bc is None:
            bc = os.environ.get('JSMPEG_TPU_BLOCK_CARRY')
        self.block_carry = (None if bc in (None, '', 'auto')
                            else bc not in ('0', 'false', 'False',
                                            0, False))
        # motion-compensation formulation override ('fused' folds the
        # half-pel taps into bf16 weight matmuls, ops/motion.py; None =
        # backend auto).  Bit-exact either way; A/B'd on-chip before any
        # default flip.
        self.mc_method = options.get(
            'mc_method', os.environ.get('JSMPEG_TPU_MC') or None)
        # upload mode: skip the explicit device_put and let the jitted
        # call transfer the wire buffer (fewer transport round trips; but
        # loses the feeder thread's overlap).  Default auto (None):
        # inline on single-frame dispatches -- the streaming latency
        # path, where the round-4 A/B measured p95 54 vs 131 ms -- and
        # feeder-overlapped on multi-frame batches, where overlap wins
        # the sustained rate.  Explicit option or env ('0' = feeder,
        # '1' = inline, 'auto') wins.
        ih = options.get('inline_upload')
        if ih is None:
            ih = os.environ.get('JSMPEG_TPU_INLINE_H2D')
        self.inline_upload = (None if ih in (None, '', 'auto')
                              else ih not in ('0', 'false', 'False',
                                              0, False))
        # serving cold-start: compile the single-frame scan variants on
        # a dedicated thread as soon as the sequence header arrives
        env_pw = os.environ.get('JSMPEG_TPU_PREWARM')
        self.prewarm_on_connect = bool(options.get(
            'prewarm', env_pw not in (None, '', '0', 'false', 'False')))
        self._prewarmed = False
        self.buffer_size = options.get('videoBufferSize', 512 * 1024)
        self.collect_timestamps = not self.streaming
        self.bytes_written = 0
        self.timestamps: list = []      # (bit_index, pts)
        self.timestamp_index = 0
        self.start_time = 0.0
        self.decoded_time = 0.0
        self.can_play = False

    # ------------------------------------------------------- decoder API

    @property
    def wire_ids(self) -> bool:
        """'auto' resolves on first read (i.e. at the first wire build,
        so parse-only uses never pay the device probe).  Probe-chosen
        True quietly drops back to False on grids whose block ids exceed
        the uint16 wire field (only an explicit True should refuse)."""
        if self._wire_ids == 'auto':
            self._wire_ids = auto_wire_ids()
            if (self._wire_ids and self.parser.seq is not None
                    and self.parser.seq.mb_size * 6 > 0xFFFE):
                self._wire_ids = False
        return self._wire_ids

    @wire_ids.setter
    def wire_ids(self, value) -> None:
        self._wire_ids = resolve_wire_ids(value)

    def connect(self, destination) -> None:
        self.destination = destination

    def write(self, pts, buffers) -> None:
        if isinstance(buffers, (bytes, bytearray, memoryview, np.ndarray)):
            buffers = [buffers]
        if self.collect_timestamps and pts is not None:
            if not self.timestamps:
                self.start_time = pts
                self.decoded_time = pts
            self.timestamps.append((self.bytes_written << 3, pts))
        for b in buffers:
            data = bytes(b)
            self.bytes_written += len(data)
            self.parser.write(data)
        if self.streaming:
            self._enforce_buffer_cap()
        self.can_play = True
        if self.prewarm_on_connect:
            self._maybe_prewarm()
        if self.parser.has_sequence_header and self._cur is None:
            self._init_planes()
            if self.decode_first_frame and not self._first_frame_done:
                # immediate first-frame decode on header detect (preview
                # while paused; reference src/mpeg1.js:29-42)
                self._first_frame_done = True
                self.decode()

    def _enforce_buffer_cap(self) -> None:
        # EVICT-mode memory bound (reference src/buffer.js:30-62): drop
        # consumed bytes; if unread data still exceeds the cap, drop it all
        # (the reference's emergency evac -- streaming prefers staying
        # current over completeness)
        bits = self.parser.bits
        bits.evict_consumed()
        unread = bits.byte_length - (bits.index >> 3)
        if unread > self.buffer_size:
            bits.index = bits.byte_length << 3
            bits.evict_consumed()

    @property
    def current_time(self) -> float:
        return self.decoded_time

    def seek(self, time: float, to_iframe: bool = False) -> None:
        if not self.collect_timestamps:
            return
        self.timestamp_index = 0
        for i, (_, t) in enumerate(self.timestamps):
            if t > time:
                break
            self.timestamp_index = i
        if self.timestamps:
            idx, t = self.timestamps[self.timestamp_index]
            self.parser.bits.index = idx
            self.decoded_time = t
        else:
            self.parser.bits.index = 0
            self.decoded_time = self.start_time
        if to_iframe and hasattr(self.parser, 'seek_iframe'):
            # snap forward to the next I picture: a clean GOP-aligned
            # resume (the reference decodes from the raw byte position and
            # shows artifacts until the next I refresh)
            self.parser.seek_iframe()

    def advance_decoded_time(self, seconds: float) -> None:
        if self.collect_timestamps:
            new_index = -1
            current = self.parser.bits.index
            for i in range(self.timestamp_index, len(self.timestamps)):
                if self.timestamps[i][0] > current:
                    break
                new_index = i
            if new_index != -1 and new_index != self.timestamp_index:
                self.timestamp_index = new_index
                self.decoded_time = self.timestamps[new_index][1]
                return
        self.decoded_time += seconds

    def _init_planes(self) -> None:
        seq = self.parser.seq
        # forbidden/reserved picture-rate codes map to 0.0
        # (tables.PICTURE_RATE, ISO 11172-2 table 2-5): keep the previous
        # (default 30) rate instead of dividing by zero per decoded frame
        # -- the JS reference silently produces Infinity timestamps here
        # (1/0 in JS); a finite fallback is the documented deviation
        # (corrupted-header robustness, found by tools/fuzz_soak.py)
        if seq.frame_rate > 0:
            self.frame_rate = seq.frame_rate
        cw, ch = seq.coded_width, seq.coded_height
        z = lambda h, w: jnp.zeros((h, w), dtype=jnp.uint8)
        self._cur = Planes(z(ch, cw), z(ch >> 1, cw >> 1), z(ch >> 1, cw >> 1))
        self._fwd = Planes(z(ch, cw), z(ch >> 1, cw >> 1), z(ch >> 1, cw >> 1))
        if self.destination is not None:
            if hasattr(self.destination, 'resize'):
                self.destination.resize(seq.width, seq.height)
            if hasattr(self.destination, 'frame_rate'):
                self.destination.frame_rate = self.frame_rate

    @property
    def seq(self):
        return self.parser.seq

    def decode(self, eof: bool = False):
        """Decode one picture; returns Planes or None."""
        import time as _time
        t0 = _time.monotonic()
        out = None
        if hasattr(self.parser, 'parse_batch'):
            # packed single-frame batch: ~2 orders of magnitude less wire
            # traffic than dense coefficients (the live-streaming hot path)
            batch = self.parser.parse_batch(1, eof=eof)
            if batch is None:
                return None
            if isinstance(batch, dict):
                outs = self._dispatch_batch(batch, n_frames=1)
                out = Planes(outs.y[0], outs.cr[0], outs.cb[0])
        if out is None:
            fd = self.parser.parse_frame(eof=eof)
            if fd is None:
                return None
            seq = self.parser.seq
            # explicit transfer: jit-argument conversion is much slower
            # than a bulk device_put on some PJRT transports
            arrays = jax.device_put(frame_to_arrays(fd))
            self._cur, self._fwd, out = decode_one(
                self._cur, self._fwd, arrays,
                mb_h=seq.mb_height, mb_w=seq.mb_width,
                mc_method=self.mc_method)
        self.advance_decoded_time(1.0 / self.frame_rate)
        self.frames_decoded += 1
        if self.streaming:
            self.parser.bits.evict_consumed()
        if self.destination is not None:
            # one packed readback instead of the sink's three per-plane
            # fetches (per-RPC latency dominates single-frame readbacks)
            from ..utils import fetch_planes_packed
            out = fetch_planes_packed(out)
            self.destination.render(out.y, out.cr, out.cb)
        if self.on_decode is not None:
            self.on_decode(self, _time.monotonic() - t0)
        return out

    # frames per batched device scan (padded; power-of-two buckets keep the
    # number of compiled variants small)
    BATCH_FRAMES = 32

    def decode_available(self, eof: bool = False, pad_to: int = 0,
                         retain: bool = True, mesh=None):
        """Parse every complete picture buffered and decode them in one or
        more device scans.  Returns a FrameSeq of Planes (device arrays;
        per-frame slices materialize lazily on access).

        retain=False (requires a connected destination) renders each batch
        as soon as it completes and releases its device arrays -- bounded
        device memory for arbitrarily long files; the returned FrameSeq
        then only carries the frame count.

        mesh: an optional ('gop', 'tile') jax Mesh -- GOPs shard over
        'gop' (DP) and macroblock-row slabs over 'tile' (spatial TP with
        halo exchange), with the packed wire split per shard so every
        device uploads only its own bytes (parallel/packed.py)."""
        if not retain and self.destination is None:
            raise ValueError('retain=False requires a connected destination '
                             '(frames are rendered and released per batch)')
        release = not retain
        if mesh is not None and hasattr(self.parser, 'parse_batch'):
            return self._decode_available_mesh(mesh, eof, release)
        outs = FrameSeq()
        if hasattr(self.parser, 'parse_batch'):
            needs_serial = self._decode_available_batch(eof, outs, release)
            if needs_serial:
                # quirk leak or malformed data: finish with the always-exact
                # serial coefficient path
                for p in self._decode_available_serial(eof, pad_to) or []:
                    if release:
                        self._render_packed(p)
                        outs.count_only(1)
                    else:
                        outs.append(p)
        else:
            for p in self._decode_available_serial(eof, pad_to) or []:
                if release:
                    self._render_packed(p)
                    outs.count_only(1)
                else:
                    outs.append(p)
        if not len(outs):
            return None
        if self.destination is not None and not release:
            for p in outs:
                self._render_packed(p)
        return outs

    def _render_packed(self, p) -> None:
        """Render one frame, fetching all three planes in one RPC."""
        from ..utils import fetch_planes_packed
        p = fetch_planes_packed(p)
        self.destination.render(p.y, p.cr, p.cb)

    def _quant_matrices(self):
        """Quant matrices as device-resident constants (cached)."""
        seq = self.parser.seq
        key = (seq.intra_quant_matrix.tobytes(),
               seq.non_intra_quant_matrix.tobytes())
        if getattr(self, '_quant_key', None) != key:
            self._quant_key = key
            self._quant_dev = jax.device_put(
                (jnp.asarray(seq.intra_quant_matrix, dtype=jnp.int32),
                 jnp.asarray(seq.non_intra_quant_matrix, dtype=jnp.int32)))
        return self._quant_dev

    @staticmethod
    def _band_halo(batch):
        """Static (vertical, horizontal) band buckets for the 2D one-hot
        MC from the batch's actual MVs (host-side, cheap); None = full
        windows."""
        from ..ops.motion import band_halo_for
        mv = batch.get('run_mv')
        if (mv is None or not mv.size) and 'mv' in batch:
            mv = batch['mv'].reshape(-1, 2)
        if mv is None or not mv.size:
            return (16, 16)
        bh = band_halo_for(int(np.abs(mv[:, 0]).max()))
        bv = band_halo_for(int(np.abs(mv[:, 1]).max()))
        # bh == 0 (horizontal reach beyond buckets) still allows the
        # row band with full-width columns; bv == 0 disables banding
        return (bv, bh) if bv else None

    class _ResolvedFuture:
        """Future-shaped wrapper for an already-transferred buffer."""

        def __init__(self, v):
            self._v = v

        def result(self):
            return self._v

    def _h2d_pool(self):
        """Single-worker feeder thread for wire uploads: device_put of
        batch k+1 runs while scan k executes and its outputs are fetched
        (the sustained tunnel H2D rate is the e2e bottleneck)."""
        pool = getattr(self, '_h2d', None)
        if pool is None:
            from concurrent.futures import ThreadPoolExecutor
            self._h2d = pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix='jsmpeg-h2d')
        return pool

    def prewarm(self, width: int = None, height: int = None) -> int:
        """Compile the single-frame streaming scan variants ahead of the
        first real frame (serving cold-start: otherwise the stream's
        first I-frame pays its XLA compile inside the latency budget;
        the reference's WASM decoder has no compile step to hide,
        /root/reference/src/websocket.js connect-then-decode flow).

        Bucket statics are predicted from the resolution: the all-coded
        I-frame blocks bucket at ~3 pairs/block, and a quarter-density
        typical-P bucket.  A mispredicted bucket only wastes one compile
        -- and with the persistent compilation cache every prediction is
        a disk hit on warm restarts.  Resolution comes from the parsed
        sequence header when available, else the arguments.  Returns the
        number of variants compiled (0 = resolution unknown)."""
        seq = self.parser.seq
        if seq is not None:
            mb_h, mb_w = seq.mb_height, seq.mb_width
        elif width and height:
            mb_h, mb_w = -(-height // 16), -(-width // 16)
        else:
            return 0
        n_mb = mb_h * mb_w
        z = lambda h, w: jnp.zeros((h, w), jnp.uint8)
        mk = lambda: Planes(z(mb_h * 16, mb_w * 16), z(mb_h * 8, mb_w * 8),
                            z(mb_h * 8, mb_w * 8))
        # jit variants key on shapes + statics only: zero quant matrices
        # and a zero wire buffer compile the exact program real frames run
        iq = jnp.zeros(64, jnp.int32)
        nq = jnp.zeros(64, jnp.int32)
        compiled = 0
        mc_t, bc_t = self._tuned_flags(n_mb)
        for n_blk, n_pairs, n_runs in self._prewarm_statics(mb_h, mb_w):
            ids_blk = n_blk if self.wire_ids else 0
            # n_pairs/n_esc are STATIC jit args on the real dispatch
            # (_dispatch_packed passes the F=1 coarse bucket and
            # n_esc=None): the prewarm call must spell them identically
            # or its compile can never be the one real frames reuse
            L = fused_buffer_len(1, n_mb, n_pairs, n_runs, False, ids_blk)
            buf = jax.device_put(np.zeros(L, np.uint8))
            _, _, outs = decode_scan_fused(
                mk(), mk(), buf, iq, nq, mb_h=mb_h, mb_w=mb_w,
                n_frames=1, n_blk=n_blk, n_runs=n_runs,
                band_halo=(16, 16), mv_wide=False,
                wire_ids=self.wire_ids, block_carry=bc_t,
                n_pairs=n_pairs, n_esc=None, mc_method=mc_t)
            jax.block_until_ready(outs.y)
            compiled += 1
        return compiled

    @staticmethod
    def _prewarm_statics(mb_h: int, mb_w: int):
        """Predicted F=1 static buckets [(n_blk, n_pairs, n_runs)],
        deduplicated (at small resolutions the I and P guesses collapse
        into the same bucket floors -- one variant, not two).

        Density constants are CALIBRATED against the realistic-statistics
        720p fixture at the bench operating point (testing/gen.py
        encode_realistic_stream, ~5 Mbit/s): its measured per-frame
        statics are I = (24576, 131072, 256) and P = (2048, 6144, 2048)
        at mb 45x80 -- an all-coded I-frame at ~5.5 pairs/block with one
        run, and a typical P-frame with ~8% of blocks coded at ~3
        pairs/block and ~n_mb/2 runs.  Both tuples below reproduce those
        exactly; the coarse F=1 bucket steps absorb ~±25% of content
        drift around them."""
        n_mb = mb_h * mb_w
        blocks_i = 6 * n_mb
        out = []
        for nb, npair, nruns in (
                (blocks_i, 11 * blocks_i // 2, 1),
                (blocks_i // 12, blocks_i // 4, n_mb // 2)):
            n_blk = _bucket(max(nb, 1), lo=1024)
            n_pairs = fused_pair_bucket(max(npair, 1),
                                        max(npair, 1) // 16)
            n_runs = _bucket(max(nruns, 1), lo=256)
            t = (n_blk, n_pairs, n_runs)
            if t not in out:
                out.append(t)
        return out

    def _maybe_prewarm(self) -> None:
        """Fire the connect-time prewarm once, on its OWN daemon thread,
        as soon as the sequence header is parsed (streaming decoders with
        the 'prewarm' option / JSMPEG_TPU_PREWARM env set).  Not the
        feeder pool: a mispredicted bucket compiles for ~100 s over the
        tunnel, and the single-worker H2D queue must stay free for the
        first real frame's upload.  If the prediction hits, the first
        frame's identical jit signature waits on (and reuses) the
        in-flight compile instead of starting its own."""
        if self._prewarmed or self.parser.seq is None:
            return
        if os.environ.get('JSMPEG_TPU_SYNC_H2D'):
            # the sync escape hatch exists because this transport's
            # device_put is not thread-safe: a background prewarm would
            # reintroduce exactly the concurrent transfer it prevents
            # (callers may still invoke prewarm() explicitly, which runs
            # on -- and blocks -- their own thread)
            self._prewarmed = True
            return
        self._prewarmed = True
        import threading
        threading.Thread(target=self.prewarm, daemon=True,
                         name='jsmpeg-prewarm').start()

    # mb_size at or above which the 1080p-sweep winners (fused_pair MC +
    # block-space carry, measured 361 vs 298 fps at otherwise-default
    # flags) become the packed-path defaults; 720p (3600 MBs) keeps
    # fused + plane carry, its own measured winners
    BIG_FRAME_MBS = 6000

    def _tuned_flags(self, n_mb: int = None):
        """Resolve (mc_method, block_carry) for the packed dispatch:
        explicit settings win; with BOTH unset, big frames on an
        accelerator flip to the round-5 1080p sweep winners jointly
        (each flag alone measured as a loss there -- the win does not
        decompose)."""
        if n_mb is None:
            seq = self.parser.seq
            n_mb = seq.mb_size if seq is not None else 0
        return tuned_mc_flags(n_mb, self.mc_method, self.block_carry)

    def _stage_packed(self, batch, n_frames=None):
        """Assemble one packed batch's fused wire buffer and start its
        H2D transfer on the feeder thread.  Returns the staging dict
        _dispatch_packed consumes; the future resolves to the device
        buffer.  JSMPEG_TPU_SYNC_H2D=1 keeps the upload on the calling
        thread (escape hatch for transports whose device_put is not
        thread-safe)."""
        seq = self.parser.seq
        F = n_frames or self.BATCH_FRAMES
        sticky = getattr(self, '_wire_sticky', None)
        if sticky is None:
            sticky = self._wire_sticky = {}
        buf, n_blk, n_runs, mv_wide, n_pairs, n_esc = build_fused_buffer(
            batch, F, seq.mb_size, wire_ids=self.wire_ids, sticky=sticky)
        inline = (self.inline_upload if self.inline_upload is not None
                  else F == 1)
        if inline:
            # hand the host buffer straight to the jitted call: PJRT
            # folds the transfer into the dispatch (latency A/B -- on
            # some transports this saves a device_put round trip; the
            # sustained pipeline prefers the feeder thread's overlap)
            fut = self._ResolvedFuture(buf)
        elif os.environ.get('JSMPEG_TPU_SYNC_H2D'):
            fut = self._ResolvedFuture(jax.device_put(buf))
        else:
            fut = self._h2d_pool().submit(jax.device_put, buf)
        return dict(fut=fut,
                    F=F, n_blk=n_blk, n_runs=n_runs, mv_wide=mv_wide,
                    n_pairs=n_pairs, n_esc=n_esc,
                    band_halo=self._band_halo(batch),
                    wire_ids=self.wire_ids)

    def _dispatch_packed(self, batch, n_frames=None, staged=None):
        """Upload one packed batch as a single fused byte buffer and
        dispatch its device scan (async).  One transfer per batch: the
        transport has high per-RPC latency, so round trips dominate small
        uploads."""
        seq = self.parser.seq
        iq, nq = self._quant_matrices()
        if staged is None:
            staged = self._stage_packed(batch, n_frames)
        dev = staged['fut'].result()
        mc_t, bc_t = self._tuned_flags()
        self._cur, self._fwd, outs = decode_scan_fused(
            self._cur, self._fwd, dev, iq, nq,
            mb_h=seq.mb_height, mb_w=seq.mb_width, n_frames=staged['F'],
            n_blk=staged['n_blk'], n_runs=staged['n_runs'],
            band_halo=staged['band_halo'], mv_wide=staged['mv_wide'],
            wire_ids=staged['wire_ids'], block_carry=bc_t,
            n_pairs=staged.get('n_pairs'), n_esc=staged.get('n_esc'),
            mc_method=mc_t)
        return outs

    def _dispatch_batch(self, batch, n_frames=None, staged=None):
        """Upload one parsed batch (any wire format) and dispatch its
        device scan; returns the stacked Planes output (async)."""
        if 'sp_pos' in batch:
            return self._dispatch_packed(batch, n_frames, staged)
        seq = self.parser.seq
        n = batch['n']
        # F must match the leading axis of the parsed arrays: decode()'s
        # single-frame fallback arrives here with n_frames=1
        F = batch['qscale'].shape[0] if 'qscale' in batch else \
            (n_frames or self.BATCH_FRAMES)
        iq = jnp.asarray(seq.intra_quant_matrix, dtype=jnp.int32)
        nq = jnp.asarray(seq.non_intra_quant_matrix, dtype=jnp.int32)
        common = dict(
            qscale=batch['qscale'],
            coded=batch['coded'].astype(bool),
            intra=batch['intra'].astype(bool),
            written=batch['written'].astype(bool),
            mv_h=np.ascontiguousarray(batch['mv'][..., 0]),
            mv_v=np.ascontiguousarray(batch['mv'][..., 1]),
            valid=(np.arange(F) < n))
        if 'sp_idx' in batch:
            total = len(batch['sp_idx'])
            bucket = _bucket(max(total, 1))
            oob = F * seq.mb_size * 6 * 64
            sp_idx = np.full(bucket, oob, dtype=np.int32)
            sp_val = np.zeros(bucket, dtype=np.int16)
            sp_idx[:total] = batch['sp_idx']
            sp_val[:total] = batch['sp_val']
            rest = LevelsArrays(levels=np.zeros(0, np.int16), **common)
            sp_idx, sp_val, rest = jax.device_put((sp_idx, sp_val, rest))
            self._cur, self._fwd, outs = decode_scan_sparse(
                self._cur, self._fwd, sp_idx, sp_val, rest, iq, nq,
                mb_h=seq.mb_height, mb_w=seq.mb_width,
                band_halo=self._band_halo(batch),
                mc_method=self.mc_method)
        else:
            stacked = LevelsArrays(levels=batch['levels'], **common)
            stacked = jax.device_put(stacked)
            self._cur, self._fwd, outs = decode_scan_levels(
                self._cur, self._fwd, stacked, iq, nq,
                mb_h=seq.mb_height, mb_w=seq.mb_width,
                band_halo=self._band_halo(batch),
                mc_method=self.mc_method)
        return outs

    def _decode_available_batch(self, eof: bool, outs_all: 'FrameSeq',
                                release: bool = False):
        """Threaded C++ parse + packed-wire device pipeline, with the parse
        of batch k+1 overlapped against the (async) upload + scan of batch
        k.  Returns needs_serial_fallback.  release=True renders each
        batch to the destination and drops its device arrays."""
        def stage_groups(b):
            """Split a parsed batch into scatter-bounded frame groups and
            start each group's wire upload on the feeder thread.  Split
            groups scan a frame axis bucketed to their OWN length (a
            coefficient-dense batch splits into ~8 groups of a few
            frames each; scanning BATCH_FRAMES slots per group did ~8x
            the step work -- the dense-stress floor of round 2).  The
            bucket set {2,3,4,6,...} keeps the extra jit variants
            bounded and disk-cached."""
            if not isinstance(b, dict):
                return []
            groups = split_packed_batch(b) if 'sp_pos' in b else [b]
            fg = (None if len(groups) == 1
                  else [_bucket(g['n'], lo=2) for g in groups])
            return [(g, self._stage_packed(
                        g, n_frames=fg[i] if fg else None)
                     if 'sp_pos' in g else None)
                    for i, g in enumerate(groups)]

        def consume(dispatched):
            for outs, gn in dispatched:
                pb = PlanesBatch(Planes(outs.y, outs.cr, outs.cb), gn)
                if release:
                    # ONE bulk readback per plane per group (the sinks'
                    # per-frame fetch would cost 3 RPC round trips per
                    # frame over the tunneled transport)
                    ys, crs, cbs = pb.fetch_all()
                    for i in range(gn):
                        self.destination.render(ys[i], crs[i], cbs[i])
                    outs_all.count_only(gn)
                else:
                    outs_all.append_batch(pb)

        batch = self.parser.parse_batch(self.BATCH_FRAMES, eof=eof)
        staged = stage_groups(batch)
        pending = []              # dispatched batch awaiting render
        while True:
            if batch == 'fallback':
                consume(pending)
                return True
            if batch is None:
                consume(pending)
                return False
            # four-way overlap per iteration: the device scans batch k
            # (dispatch is async), the C++ parser (GIL released) produces
            # batch k+1, the feeder thread uploads k+1's wire, and the
            # main thread fetches batch k-1's outputs -- render runs one
            # batch behind dispatch so readback RPCs never leave the
            # device idle.  Coefficient-dense batches split into frame
            # groups so every jit variant keeps a one-segment scatter.
            n = batch['n']
            dispatched = [(self._dispatch_batch(g, n_frames=None, staged=s),
                           g['n']) for g, s in staged]
            batch = (self.parser.parse_batch(self.BATCH_FRAMES, eof=eof)
                     if n == self.BATCH_FRAMES else None)
            staged = stage_groups(batch)
            self.frames_decoded += n
            for _ in range(n):
                self.advance_decoded_time(1.0 / self.frame_rate)
            consume(pending)
            pending = dispatched

    def _mesh_decoder(self, mesh):
        from ..parallel.packed import MeshPackedDecoder
        md = getattr(self, '_mesh_dec', None)
        if (md is None or md.mesh is not mesh
                or md.seq is not self.parser.seq
                or md.mc_method != self.mc_method):
            self._mesh_dec = md = MeshPackedDecoder(
                mesh, self.parser.seq, mc_method=self.mc_method)
        return md

    def _decode_available_mesh(self, mesh, eof: bool, release: bool):
        """Mesh-parallel decode_available: the packed wire splits per
        (gop, tile) shard and each device decodes only its own cells.
        Coefficient-dense batches (packed-cap overflow) run on the default
        device; quirky streams finish on the serial-exact path.  The
        reference-plane carry threads through all three."""
        from ..parallel.packed import split_packed_frames
        if self.parser.seq is None:
            return None
        outs_all = FrameSeq()
        pending: list = []
        rows = self.parser.seq.mb_height * 16

        def emit(pb: PlanesBatch):
            if release:
                ys, crs, cbs = pb.fetch_all()   # one readback per plane
                for i in range(len(pb)):
                    self.destination.render(ys[i], crs[i], cbs[i])
                outs_all.count_only(len(pb))
            else:
                outs_all.append_batch(pb)

        def account(n: int):
            self.frames_decoded += n
            for _ in range(n):
                self.advance_decoded_time(1.0 / self.frame_rate)

        def flush():
            if not pending:
                return
            from ..parallel.packed import gops_all_closed
            md = self._mesh_decoder(mesh)
            if not md.fits_mesh(pending) or not gops_all_closed(pending):
                # off-mesh fallback, threading the same carry: either the
                # batch's MV reach exceeds the per-tile halo (f_code
                # beyond the floor / full_pel doubling), or a slice-gap
                # frame makes a GOP depend on pre-GOP plane content
                # (parallel/packed.gop_closed)
                from ..parallel.packed import merge_packed_frames
                for a in range(0, len(pending), self.BATCH_FRAMES):
                    group = pending[a:a + self.BATCH_FRAMES]
                    batch = merge_packed_frames(group)
                    outs = self._dispatch_packed(
                        batch, n_frames=_bucket(len(group), lo=2))
                    emit(PlanesBatch(Planes(outs.y, outs.cr, outs.cb),
                                     len(group)))
                account(len(pending))
                pending.clear()
                return
            # a leading I picture overwrites every pixel, so the carry
            # only matters for a mid-GOP continuation
            init = (None if pending[0]['pic_type'] == 1
                    else (self._cur, self._fwd))
            outs, gl, carry = md.decode(pending, init=init)
            self._cur, self._fwd = carry
            account(len(pending))
            pending.clear()
            for gi, gn in enumerate(gl):
                emit(PlanesBatch(Planes(outs.y[gi, :, :rows],
                                        outs.cr[gi, :, :rows >> 1],
                                        outs.cb[gi, :, :rows >> 1]), gn))

        # bounded device/host memory for arbitrarily long files: flush a
        # mesh dispatch once every device has ~BATCH_FRAMES frames queued
        # (one jit variant; outputs render-and-release per flush)
        flush_limit = self.BATCH_FRAMES * mesh.shape['gop']
        needs_serial = False
        while True:
            batch = self.parser.parse_batch(self.BATCH_FRAMES, eof=eof)
            if batch == 'fallback':
                needs_serial = True
                break
            if batch is None:
                break
            if 'sp_pos' not in batch:
                flush()
                n = batch['n']
                outs = self._dispatch_batch(batch, n_frames=None)
                account(n)
                emit(PlanesBatch(Planes(outs.y, outs.cr, outs.cb), n))
                if n < self.BATCH_FRAMES:
                    break
                continue
            pending.extend(split_packed_frames(batch))
            if len(pending) >= flush_limit:
                flush()
            if batch['n'] < self.BATCH_FRAMES:
                break
        flush()
        if needs_serial:
            for p in self._decode_available_serial(eof) or []:
                if release:
                    self._render_packed(p)
                    outs_all.count_only(1)
                else:
                    outs_all.append(p)
        if not len(outs_all):
            return None
        if self.destination is not None and not release:
            for p in outs_all:
                self._render_packed(p)
        return outs_all

    def _decode_available_serial(self, eof: bool = False, pad_to: int = 0):
        frames = []
        while True:
            fd = self.parser.parse_frame(eof=eof)
            if fd is None:
                break
            frames.append(frame_to_arrays(fd))
            self.frames_decoded += 1
            self.advance_decoded_time(1.0 / self.frame_rate)
        if not frames:
            return None
        seq = self.parser.seq
        n = len(frames)
        if pad_to > n:
            frames += [empty_frame_arrays(seq.mb_size)] * (pad_to - n)
        stacked = jax.device_put(stack_frames(frames))
        self._cur, self._fwd, outs = decode_scan(
            self._cur, self._fwd, stacked,
            mb_h=seq.mb_height, mb_w=seq.mb_width)
        return [Planes(outs.y[i], outs.cr[i], outs.cb[i]) for i in range(n)]
