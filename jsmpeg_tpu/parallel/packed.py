"""Packed-wire mesh decode: the flagship multi-chip pipeline.

The single-chip path ships ~2 B/coefficient over the wire (see
models/mpeg1.py decode_scan_fused); this module shards that SAME packed
wire over a ('gop', 'tile') mesh instead of the dense int16 level slabs
that decode_tiled_levels uploads (~50x the bytes).  The host splits each
picture's packed streams at macroblock-tile boundaries -- runs re-RLE'd
per MB-row slab, coefficient pairs cut at coded-block boundaries -- and
builds ONE fused uint8 buffer per (gop, tile) cell.  The buffers stack
[G, T, L], shard over the mesh, and every device unpacks only its own
cells, scatters its local coefficient lattice, and runs the halo-exchange
tiled scan (parallel/tiles.py).

Capability-equivalent of the reference Player composing everything
(/root/reference/src/player.js:27-55) extended to the device mesh; the
reference itself is single-threaded and has no parallel decode.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.mpeg1 import (_bucket, build_fused_buffer_sized,
                            fused_buffer_len, fused_pair_bucket,
                            mv_fits_narrow, packed_to_levels, unpack_fused)
from ..ops.frame import Planes
from .gop import split_at_iframes
from .mesh import _pvary, shard_map
from .tiles import (_levels_step, batch_max_abs_mv, halo_mb_for_mvs,
                    halo_mb_rows)

_POPCOUNT8 = np.array([bin(x).count('1') for x in range(256)], np.uint8)

# one RLE run covers at most 65535 MBs (u16 wire field); a tile slab of a
# single picture never comes close (720p is 3600 MBs total)
_RUN_CAP = 0xFFFF


def split_packed_frames(batch: dict) -> List[dict]:
    """Slice a packed parse_batch dict into per-frame packed dicts using
    the per-frame counts the parser records."""
    n = batch['n']
    pp = np.concatenate([[0], np.cumsum(batch['pairs_pf'])]).astype(np.int64)
    rr = np.concatenate([[0], np.cumsum(batch['runs_pf'])]).astype(np.int64)
    ee = np.concatenate([[0], np.cumsum(batch['escs_pf'])]).astype(np.int64)
    # the per-frame cumulative counts cover frames [0, n); frame n-1's
    # streams end at the batch totals
    pp = np.append(pp[:n], len(batch['sp_pos']))
    rr = np.append(rr[:n], len(batch['run_len']))
    ee = np.append(ee[:n], len(batch['sp_esc']))
    out = []
    for i in range(n):
        out.append(dict(
            run_len=batch['run_len'][rr[i]:rr[i + 1]],
            run_flags=batch['run_flags'][rr[i]:rr[i + 1]],
            run_cbp=batch['run_cbp'][rr[i]:rr[i + 1]],
            run_mv=batch['run_mv'][rr[i]:rr[i + 1]],
            sp_pos=batch['sp_pos'][pp[i]:pp[i + 1]],
            sp_v8=batch['sp_v8'][pp[i]:pp[i + 1]],
            sp_esc=batch['sp_esc'][ee[i]:ee[i + 1]],
            pic_type=int(batch['pic_types'][i])))
    return out


def _rle(fl: np.ndarray, cb: np.ndarray, mv: np.ndarray):
    """Re-run-length-encode per-MB (flags, cbp, mv) streams (runs of
    identical tuples, the parser's wire invariant)."""
    n = len(fl)
    if n == 0:
        return (np.zeros(0, np.uint16), np.zeros(0, np.uint8),
                np.zeros(0, np.uint8), np.zeros((0, 2), np.int16))
    change = np.ones(n, bool)
    change[1:] = ((fl[1:] != fl[:-1]) | (cb[1:] != cb[:-1])
                  | (mv[1:] != mv[:-1]).any(axis=1))
    starts = np.flatnonzero(change)
    lens = np.diff(np.append(starts, n))
    if lens.max(initial=0) > _RUN_CAP:           # split over-long runs
        reps = -(-lens // _RUN_CAP)
        starts = np.repeat(starts, reps)
        lens = np.repeat(lens, reps)
        k = np.concatenate([np.arange(r) for r in reps])
        lens = np.minimum(lens - k * _RUN_CAP, _RUN_CAP)
    return (lens.astype(np.uint16), fl[starts], cb[starts], mv[starts])


def split_frame_tiles(fr: dict, n_mb: int, mb_w: int, mb_h_local: int,
                      n_tile: int) -> List[dict]:
    """Split one picture's packed streams into n_tile per-slab dicts.

    Tile t owns MB rows [t*mb_h_local, (t+1)*mb_h_local) of the padded
    grid; slabs beyond the real mb_h are padding runs (flags=0: not
    written, not coded -- cropped from the output)."""
    mpt = mb_h_local * mb_w
    run_len = fr['run_len'].astype(np.int64)
    fl_mb = np.repeat(fr['run_flags'], run_len)
    cb_mb = np.repeat(fr['run_cbp'], run_len)
    mv_mb = np.repeat(fr['run_mv'], run_len, axis=0)
    blk_per_mb = _POPCOUNT8[cb_mb]
    cum_blk = np.concatenate([[0], np.cumsum(blk_per_mb)]).astype(np.int64)
    sp_pos = fr['sp_pos']
    starts = np.flatnonzero(sp_pos & 0x80)       # block-start pair indices
    esc_cum = np.concatenate(
        [[0], np.cumsum(fr['sp_v8'] == -128)]).astype(np.int64)
    n_pairs = len(sp_pos)
    tiles = []
    for t in range(n_tile):
        a = min(t * mpt, n_mb)
        b = min((t + 1) * mpt, n_mb)
        rl, rf, rc, rm = _rle(fl_mb[a:b], cb_mb[a:b], mv_mb[a:b])
        pad = mpt - (b - a)
        if pad:
            k = -(-pad // _RUN_CAP)
            pl = np.full(k, _RUN_CAP, np.int64)
            pl[-1] = pad - (k - 1) * _RUN_CAP
            rl = np.concatenate([rl, pl.astype(np.uint16)])
            rf = np.concatenate([rf, np.zeros(k, np.uint8)])
            rc = np.concatenate([rc, np.zeros(k, np.uint8)])
            rm = np.concatenate([rm, np.zeros((k, 2), np.int16)])
        b0, b1 = cum_blk[a], cum_blk[b]
        p0 = starts[b0] if b0 < len(starts) else n_pairs
        p1 = starts[b1] if b1 < len(starts) else n_pairs
        tiles.append(dict(
            run_len=rl, run_flags=rf, run_cbp=rc, run_mv=rm,
            sp_pos=sp_pos[p0:p1], sp_v8=fr['sp_v8'][p0:p1],
            sp_esc=fr['sp_esc'][esc_cum[p0]:esc_cum[p1]],
            n_blocks=int(b1 - b0)))
    return tiles


def gop_closed(gop_frames: List[dict]) -> bool:
    """True when this GOP is an independent decode unit.

    Reference semantics: a macroblock covered by no slice (a slice gap --
    non-conformant but decodable; the reference leaves the plane's stale
    pixels, frame n-2 after the double-buffer swap) exposes PRE-GOP
    content when it sits in the GOP's leading I or first P frame: during
    those two frames the 'current' buffer still holds pixels from before
    the GOP's I refresh.  From frame 2 on the stale buffer is the GOP's
    own frame n-2, which the per-cell scan carries correctly.  Uncovered
    MB <=> run_flags has neither written (0x40) nor intra (0x20).

    Found by the round-5 fuzz soak (seed 799): a slice-gap P frame
    decoded GOP-parallel showed init zeros where the serial pipeline
    shows frame n-2 -- this predicate guards every GOP-parallel path."""
    for f in gop_frames[:2]:
        fl = f.get('run_flags') if isinstance(f, dict) else None
        if fl is not None:
            if len(fl) and bool(((fl & 0x60) == 0).any()):
                return False
            continue
        # FrameData-style objects (gop.py paths)
        w = np.asarray(f['written'] if isinstance(f, dict) else f.written)
        i = np.asarray(f['intra'] if isinstance(f, dict) else f.intra)
        if not bool((w | i).all()):
            return False
    return True


def gops_all_closed(frames: List[dict]) -> bool:
    """gop_closed over every GOP of a frame list (split at I pictures)."""
    pick = (lambda f: f['pic_type']) if isinstance(frames[0], dict) \
        else (lambda f: f.pic_type)
    return all(gop_closed(g) for g in split_at_iframes(frames, pick))


def merge_packed_frames(frames: List[dict]) -> dict:
    """Per-frame packed dicts (split_packed_frames output) -> one batch
    dict usable by the single-device fused pipeline (the off-mesh
    fallback when a batch's MV reach exceeds the tile halo)."""
    batch = _concat_cell(frames, len(frames))
    batch['n_blocks'] = int(sum(
        (_POPCOUNT8[f['run_cbp']] * f['run_len'].astype(np.int64)).sum()
        for f in frames))
    batch['pic_types'] = np.array([f['pic_type'] for f in frames], np.uint8)
    return batch


def _concat_cell(frames: List[dict], n: int) -> dict:
    """Concatenate one tile's per-frame streams into a cell batch dict
    (the build_fused_buffer contract)."""
    cat = lambda k: (np.concatenate([f[k] for f in frames]) if frames
                     else np.zeros(0))
    return dict(
        n=n,
        run_len=cat('run_len').astype(np.uint16),
        run_flags=cat('run_flags').astype(np.uint8),
        run_cbp=cat('run_cbp').astype(np.uint8),
        run_mv=(np.concatenate([f['run_mv'] for f in frames])
                if frames else np.zeros((0, 2))).astype(np.int16),
        sp_pos=cat('sp_pos').astype(np.uint8),
        sp_v8=cat('sp_v8').astype(np.int8),
        sp_esc=cat('sp_esc').astype(np.int16),
        n_blocks=sum(f.get('n_blocks', 0) for f in frames))


@functools.partial(jax.jit, static_argnames=(
    'n_frames', 'mb_h_local', 'mb_w', 'n_runs', 'n_blk', 'halo_mb',
    'mb_h_total', 'mesh', 'mv_wide', 'mc_method'))
def decode_gops_tiled_packed(bufs: jnp.ndarray, init_cur: Planes,
                             init_fwd: Planes, intra_q: jnp.ndarray,
                             non_intra_q: jnp.ndarray, n_frames: int,
                             mb_h_local: int, mb_w: int, n_runs: int,
                             n_blk: int, halo_mb: int, mb_h_total: int,
                             mesh: Mesh, mv_wide: bool = False,
                             mc_method: str = None):
    """bufs: uint8 [G, T, L] fused cell buffers sharded over
    ('gop', 'tile'); init planes [G, rows, W] (rows sharded over 'tile')
    seed each GOP's scan carry (zeros except a mid-GOP continuation).
    Returns (outs [G, F, rows, W], final_cur, final_fwd [G, rows, W])."""
    n_mb_local = mb_h_local * mb_w

    def local(bufs, ic, ifw, iq, nq):
        iq = _pvary(iq, ('gop', 'tile'))
        nq = _pvary(nq, ('gop', 'tile'))

        def one_gop(buf, cur0, fwd0):
            valid, flags, cbp, mv16, sp_pos, sp_val, _ = unpack_fused(
                buf[0], n_frames, n_mb_local, n_runs, mv_wide)
            la = packed_to_levels(flags, cbp, mv16, sp_pos, sp_val, valid,
                                  n_blk)
            step = functools.partial(
                _levels_step, intra_q=iq, non_intra_q=nq,
                mb_h_local=mb_h_local, mb_w=mb_w, halo_mb=halo_mb,
                mb_h_total=mb_h_total, axis='tile', mc_method=mc_method)
            (cur, fwd), outs = jax.lax.scan(step, (cur0, fwd0), la)
            return outs, cur, fwd

        return jax.vmap(one_gop)(bufs, ic, ifw)

    plane_spec = Planes(P('gop', 'tile'), P('gop', 'tile'), P('gop', 'tile'))
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P('gop', 'tile', None), plane_spec, plane_spec, P(), P()),
        out_specs=(Planes(P('gop', None, 'tile'), P('gop', None, 'tile'),
                          P('gop', None, 'tile')), plane_spec, plane_spec))
    return fn(bufs, init_cur, init_fwd, intra_q, non_intra_q)


def _stack_init(init: Optional[Tuple], g: int, ch_pad: int, cw: int):
    """[G, rows, W] zero planes, with the caller's carry (if any) padded
    into GOP slot 0 -- a mid-GOP continuation decodes against it."""
    def stack(plane_idx, rows, cols):
        arr = np.zeros((g, rows, cols), np.uint8)
        if init is not None:
            src = np.asarray(jax.device_get(init[plane_idx[0]][plane_idx[1]]))
            arr[0, :src.shape[0], :src.shape[1]] = src
        return arr
    mk = lambda which: Planes(
        y=stack((which, 0), ch_pad, cw),
        cr=stack((which, 1), ch_pad >> 1, cw >> 1),
        cb=stack((which, 2), ch_pad >> 1, cw >> 1))
    return mk(0), mk(1)


class MeshPackedDecoder:
    """Reusable driver: caches the sharding objects + static bucket sizes
    so repeated calls (streaming batches) hit one compiled variant."""

    def __init__(self, mesh: Mesh, seq, f_code: int = 2,
                 mc_method: str = None):
        self.mesh = mesh
        self.seq = seq
        self.mc_method = mc_method
        self.n_gop = mesh.shape['gop']
        self.n_tile = mesh.shape['tile']
        self.mb_h = seq.mb_height
        self.mb_w = seq.mb_width
        self.mb_h_pad = -(-self.mb_h // self.n_tile) * self.n_tile
        self.mb_h_local = self.mb_h_pad // self.n_tile
        # floor from the declared f_code; decode() raises this to the
        # batch's ACTUAL MV reach (covers f_code > 2 / full_pel streams)
        self.halo_mb = halo_mb_rows(f_code)
        self.cw = self.mb_w * 16
        self.ch_pad = self.mb_h_pad * 16
        self._buf_sharding = NamedSharding(mesh, P('gop', 'tile', None))
        self._plane_sharding = NamedSharding(mesh, P('gop', 'tile'))
        self._quant = jax.device_put(
            (jnp.asarray(seq.intra_quant_matrix, jnp.int32),
             jnp.asarray(seq.non_intra_quant_matrix, jnp.int32)))

    def halo_for(self, frames: List[dict]) -> int:
        """Halo (MB rows) this batch needs: the declared-f_code floor
        raised to the data's MV reach (bucketed).  Callers must check it
        against mb_h_local (fits_mesh) before decode()."""
        return max(self.halo_mb, halo_mb_for_mvs(batch_max_abs_mv(frames)))

    def fits_mesh(self, frames: List[dict]) -> bool:
        return self.halo_for(frames) <= self.mb_h_local

    def decode(self, frames: List[dict], init: Optional[Tuple] = None):
        """frames: per-frame packed dicts (split_packed_frames output).

        Returns (outs Planes [G, F, rows, W] device arrays, gop_lengths,
        final_carry (cur, fwd) full-height single-GOP planes).  Output
        frame (gi, fi) maps to input frame sum(len(gops[:gi])) + fi."""
        gops = split_at_iframes(frames, lambda f: f['pic_type'])
        for gop in gops:
            if not gop_closed(gop):
                raise ValueError(
                    'GOP not closed: a slice-gap macroblock in its '
                    'leading I / first P frame exposes pre-GOP plane '
                    'content (reference stale-pixel semantics); decode '
                    'these frames off-mesh (callers: check '
                    'gops_all_closed() / fits_mesh() first)')
        g = max(1, -(-len(gops) // self.n_gop)) * self.n_gop
        fmax = _bucket(max(len(x) for x in gops), lo=2)
        n_mb = self.mb_h * self.mb_w

        # host split: per-(gop, tile) cells of the packed wire
        cells = [[_concat_cell(
            [split_frame_tiles(f, n_mb, self.mb_w, self.mb_h_local,
                               self.n_tile)[t] for f in gop],
            n=len(gop)) for t in range(self.n_tile)]
            for gop in gops]
        # shared static buckets => one jit variant across cells
        n_pairs = max(fused_pair_bucket(len(c['sp_pos']), len(c['sp_esc']))
                      for row in cells for c in row)
        n_runs = _bucket(max(len(c['run_len'])
                             for row in cells for c in row), lo=64)
        n_blk = _bucket(max(max((c['n_blocks']
                                 for row in cells for c in row), default=1),
                            1), lo=256)
        empty = _concat_cell([], 0)
        n_mb_local = self.mb_h_local * self.mb_w
        mv_wide = not all(mv_fits_narrow(c['run_mv'])
                          for row in cells for c in row)
        L = fused_buffer_len(fmax, n_mb_local, n_pairs, n_runs, mv_wide)
        bufs = np.zeros((g, self.n_tile, L), np.uint8)
        for gi in range(g):
            for t in range(self.n_tile):
                cell = cells[gi][t] if gi < len(cells) else empty
                bufs[gi, t] = build_fused_buffer_sized(
                    cell, fmax, n_pairs, n_runs, n_mb_local, mv_wide)

        dev_bufs = jax.device_put(bufs, self._buf_sharding)
        ic, ifw = _stack_init(init, g, self.ch_pad, self.cw)
        put = lambda p: Planes(*[jax.device_put(x, self._plane_sharding)
                                 for x in p])
        iq, nq = self._quant
        halo_mb = self.halo_for(frames)
        if halo_mb > self.mb_h_local:
            raise ValueError(
                f'MV reach needs {halo_mb} MB rows of halo > '
                f'{self.mb_h_local} rows per tile; decode these frames '
                f'off-mesh (callers: check fits_mesh() first)')
        outs, fcur, ffwd = decode_gops_tiled_packed(
            dev_bufs, put(ic), put(ifw), iq, nq, n_frames=fmax,
            mb_h_local=self.mb_h_local, mb_w=self.mb_w, n_runs=n_runs,
            n_blk=n_blk, halo_mb=halo_mb, mb_h_total=self.mb_h_pad,
            mesh=self.mesh, mv_wide=mv_wide, mc_method=self.mc_method)
        gl = [len(x) for x in gops]
        last = len(gops) - 1
        ch = self.mb_h * 16
        carry = (Planes(fcur.y[last][:ch], fcur.cr[last][:ch >> 1],
                        fcur.cb[last][:ch >> 1]),
                 Planes(ffwd.y[last][:ch], ffwd.cr[last][:ch >> 1],
                        ffwd.cb[last][:ch >> 1]))
        return outs, gl, carry


def decode_packed_mesh(es: bytes, mesh: Mesh, f_code: int = 2,
                       mc_method: str = None) -> List[Planes]:
    """Standalone driver: parse an elementary stream with the native
    packed parser and decode it bit-exactly over the mesh.  Returns
    per-frame full planes in input order (library/test entry; the Player
    path goes through MPEG1Decoder.decode_available(mesh=...))."""
    from ..host import best_parser
    parser = best_parser()
    parser.write(bytes(es))
    if not hasattr(parser, 'parse_batch'):
        raise RuntimeError('packed mesh decode needs the native parser')
    frames: List[dict] = []
    while True:
        b = parser.parse_batch(32, eof=True)
        if b == 'fallback' or (isinstance(b, dict) and 'sp_pos' not in b):
            raise RuntimeError('stream needs the serial-exact path')
        if b is None:
            break
        frames.extend(split_packed_frames(b))
        if b['n'] < 32:
            break
    if not frames:
        return []
    dec = MeshPackedDecoder(mesh, parser.seq, f_code=f_code,
                            mc_method=mc_method)
    outs, gl, _ = dec.decode(frames)
    rows = parser.seq.mb_height * 16
    result = []
    for gi, n in enumerate(gl):
        for fi in range(n):
            result.append(Planes(outs.y[gi, fi][:rows],
                                 outs.cr[gi, fi][:rows >> 1],
                                 outs.cb[gi, fi][:rows >> 1]))
    return result
