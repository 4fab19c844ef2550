"""Stream-parallel decode on ONE chip: N independent MPEG1 streams
share one device, one compiled program, and one serving surface.

The reference player decodes exactly one stream per instance
(/root/reference/src/player.js:27-55); production TPU serving wants many
camera feeds per chip.  Three dispatch formulations, all bit-exact,
decided by on-chip capture (tools/profile_streams.py; docs/SERVING.md):

  - 'roundrobin' (default): per-stream scans dispatched back-to-back.
    Dispatch is async, so stream i+1's wire uploads while stream i's
    scan executes and the device drains the queue at the full
    single-stream rate -- aggregate throughput equals the serial
    time-multiplexing bound, which the round-4 S-sweep measured as the
    BEST available: at 720p the per-frame step cost of any JOINT
    formulation roughly doubles once the joint working set outgrows the
    single-stream scale (stacked S=1: 759 fps, S=2: 485 aggregate,
    S=4: 448), so "batching streams" buys nothing at this operating
    point -- the single-stream scan already saturates the chip.
  - 'stacked': the S streams STACK ALONG MB ROWS into one joint frame
    per step (mb_h -> S*mb_h) -- every device op keeps the exact 4D
    layout of the single-stream pipeline, just taller.  Motion
    compensation clamps source rows at segment boundaries
    (ops/motion.py n_seg), which IS the per-stream frame-edge clamp, so
    the joint decode is bit-exact vs decoding each stream alone.
    Unequal-length streams ride a per-(frame, stream) valid mask whose
    rows keep/skip the carry rotation independently.  One dispatch per
    fleet batch (lowest per-batch host/dispatch overhead) -- worth
    re-measuring for small-resolution fleets where per-step fixed
    costs dominate.
  - 'vmap': one `jax.vmap`'d scan over [S, ...] stacks.  Measured WORST
    (BENCH_r03: 374 fps aggregate at S=4 vs 603 single-stream -- the
    vmapped 5D einsums force layout relayouts, the same failure mode as
    the rejected chroma pairing in docs/PERF_ANALYSIS.md); retained for
    A/B only.

Mechanics (stacked): every stream parses on the host as usual; each
joint batch interleaves the streams' per-frame packed records
(frame f = stream 0's frame f over stream 1's frame f over ...) into
ONE fused wire buffer over the joint S*mb_h x mb_w grid, and dispatches
ONE program.  A stream with no frame f contributes a padding slab
(flags 0) masked by the valid plane, so nothing forces the feeds to
stay in lockstep at EOF.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.mpeg1 import (MPEG1Decoder, _bucket, build_fused_buffer_sized,
                            decode_scan_fused, fused_pair_bucket,
                            mv_fits_narrow)
from ..ops.frame import Planes
from .packed import _RUN_CAP, split_packed_frames

_POPCOUNT8 = np.array([bin(x).count('1') for x in range(256)], np.int64)


@functools.partial(jax.jit, static_argnames=(
    'mb_h', 'mb_w', 'n_frames', 'n_blk', 'n_runs', 'band_halo', 'mv_wide',
    'block_carry', 'wire_ids', 'mc_method'))
def decode_scan_fused_many(cur: Planes, fwd: Planes, bufs: jnp.ndarray,
                           intra_q: jnp.ndarray, non_intra_q: jnp.ndarray,
                           mb_h: int, mb_w: int, n_frames: int, n_blk: int,
                           n_runs: int, band_halo=None,
                           mv_wide: bool = False,
                           block_carry: bool = False,
                           wire_ids: bool = False,
                           mc_method: str = None):
    """Vmapped decode_scan_fused: cur/fwd planes are [S, H, W] stacks,
    bufs is [S, L] (one fused wire buffer per stream, shared statics).
    Returns (cur, fwd, outs) with a leading stream axis each."""
    def one(c, f, b):
        return decode_scan_fused.__wrapped__(
            c, f, b, intra_q, non_intra_q, mb_h=mb_h, mb_w=mb_w,
            n_frames=n_frames, n_blk=n_blk, n_runs=n_runs,
            band_halo=band_halo, mv_wide=mv_wide, block_carry=block_carry,
            wire_ids=wire_ids, mc_method=mc_method)

    return jax.vmap(one)(cur, fwd, bufs)


def _pad_frame_dict(n_mb: int) -> dict:
    """One stream-frame's worth of padding records (flags 0: not written,
    not coded; the device's valid mask hides the rows anyway)."""
    k = -(-n_mb // _RUN_CAP)
    lens = np.full(k, _RUN_CAP, np.int64)
    lens[-1] = n_mb - (k - 1) * _RUN_CAP
    return dict(run_len=lens.astype(np.uint16),
                run_flags=np.zeros(k, np.uint8),
                run_cbp=np.zeros(k, np.uint8),
                run_mv=np.zeros((k, 2), np.int16),
                sp_pos=np.zeros(0, np.uint8),
                sp_v8=np.zeros(0, np.int8),
                sp_esc=np.zeros(0, np.int16))


def stack_stream_frames(per_stream: List[List[dict]], n_mb: int,
                        n_frames: int):
    """Interleave S streams' per-frame packed dicts
    (split_packed_frames output) into ONE joint batch over the stacked
    S*n_mb grid: joint frame f = every stream's frame f concatenated in
    stream order (stream i owns MB rows [i*mb_h, (i+1)*mb_h)).  Streams
    shorter than n_frames pad with flags-0 slabs.  Returns (batch dict
    for build_fused_buffer_sized, valid bool [n_frames, S])."""
    s = len(per_stream)
    pad = _pad_frame_dict(n_mb)
    parts = []
    valid = np.zeros((n_frames, s), bool)
    for f in range(n_frames):
        for i, frames in enumerate(per_stream):
            if f < len(frames):
                parts.append(frames[f])
                valid[f, i] = True
            else:
                parts.append(pad)
    cat = lambda k: np.concatenate([p[k] for p in parts])
    rl = cat('run_len').astype(np.uint16)
    rc = cat('run_cbp').astype(np.uint8)
    batch = dict(
        n=n_frames,
        run_len=rl,
        run_flags=cat('run_flags').astype(np.uint8),
        run_cbp=rc,
        run_mv=np.concatenate([p['run_mv'] for p in parts]).astype(np.int16),
        sp_pos=cat('sp_pos').astype(np.uint8),
        sp_v8=cat('sp_v8').astype(np.int8),
        sp_esc=cat('sp_esc').astype(np.int16),
        n_blocks=int((_POPCOUNT8[rc] * rl.astype(np.int64)).sum()))
    return batch, valid


def _merge_halo(halos):
    """Join per-stream band halos: any unbounded stream unbounds the
    joint dispatch; otherwise take the elementwise max window.  bh == 0
    is a SENTINEL (horizontal reach beyond the buckets -> full-width
    columns, ops/motion.band_halo_for), so any zero wins over any max."""
    if any(h is None for h in halos):
        return None
    bh = (0 if any(h[1] == 0 for h in halos)
          else max(h[1] for h in halos))
    return (max(h[0] for h in halos), bh)


class MultiStreamDecoder:
    """Decode N same-resolution MPEG1 elementary streams on one device.
    write(i, data) feeds stream i; decode_batch() dispatches the fleet's
    round (see the module docstring for the three dispatch modes) and
    returns the newly decoded frames per stream.

    All streams must share coded size and quant matrices (homogeneous
    serving fleets do); the first sequence header to ARRIVE becomes the
    fleet's geometry contract and later headers are checked against it
    (raise by default; quarantine=True marks the mismatched feed dead
    instead).  A stream whose batch cannot ride the joint packed wire
    (coefficient-dense cap overflow, exactness fallback) is demoted to
    its own serial-capable decoder and keeps decoding bit-exactly
    outside the joint dispatch."""

    def __init__(self, n_streams: int, batch_frames: int = 32,
                 wire_ids='auto', block_carry: bool = False,
                 mc_method: str = None,
                 streaming: bool = False,
                 buffer_size: int = 512 * 1024,
                 quarantine: bool = False,
                 mode: str = 'roundrobin'):
        from ..host import best_parser
        self.n = n_streams
        self.batch_frames = batch_frames
        # dispatch formulation: 'stacked' (streams stacked along MB rows
        # into one joint 4D pipeline), 'roundrobin' (per-stream scans
        # dispatched back-to-back -- async, so stream i+1's wire uploads
        # while stream i scans; the serial time-multiplexing bound), or
        # 'vmap' (legacy [S, ...] vmapped scan, kept for A/B).  The
        # default follows the on-chip S-sweep capture
        # (tools/profile_streams.py, docs/SERVING.md).
        if mode not in ('stacked', 'vmap', 'roundrobin'):
            raise ValueError(f'unknown multi-stream mode {mode!r}')
        self.mode = mode
        # streaming=True applies the reference's EVICT-mode memory bound
        # per stream (videoBufferSize semantics): a long-running serving
        # process must not grow with hours of consumed bitstream
        self.streaming = bool(streaming)
        self.buffer_size = buffer_size
        # production tuning flags, same semantics as MPEG1Decoder's:
        # wire_ids ships coded-block ids (+2 B/block) so the device skips
        # the ordinal computation; 'auto' (default) resolves from the
        # one-shot H2D transport probe -- serving hosts with cheap H2D
        # turn it on, tunneled links stay off (models/mpeg1.py policy).
        # block_carry (None = geometry auto, like MPEG1Decoder) keeps the
        # scan carry in MB-block layout.
        from ..models.mpeg1 import auto_wire_ids, resolve_wire_ids
        wi = resolve_wire_ids(wire_ids)
        self._wire_ids_auto = wi == 'auto'
        self.wire_ids = auto_wire_ids() if wi == 'auto' else wi
        self.block_carry = block_carry
        # MC formulation override ('fused' = half-pel taps folded into
        # bf16 weight matmuls; None = geometry auto -- big frames take
        # the round-5 sweep winners, models/mpeg1.tuned_mc_flags)
        self.mc_method = mc_method
        self.parsers = [best_parser() for _ in range(n_streams)]
        if not hasattr(self.parsers[0], 'parse_batch'):
            raise RuntimeError('multi-stream decode needs the native '
                               'packed parser (build_native)')
        # quarantine=True (the serving posture) isolates a bad feed --
        # quirk stream needing the serial path, resolution/quant mismatch
        # -- instead of failing the whole joint batch; .dead[i] carries
        # the reason and the other feeds keep decoding
        self.quarantine = bool(quarantine)
        self.dead: List[Optional[str]] = [None] * n_streams
        # streams demoted to their own serial-capable decoder (dense cap
        # overflow / exactness fallback); index -> MPEG1Decoder
        self._demoted: dict = {}
        self._carry = None          # (cur, fwd) Planes of [S, H, W]
        self._seq = None
        self._sticky = {}           # shared static sizes across batches
        self._quant = None

    def write(self, i: int, data: bytes):
        if self.dead[i]:
            return                      # dropped feed: do not buffer bytes
        dec = self._demoted.get(i)
        if dec is not None:
            # pts=None: no timestamp collection (no seek surface here)
            dec.write(None, data)       # demoted: its own caps/evict apply
            return
        self.parsers[i].write(bytes(data))

    def _check_seq(self):
        s0 = self._seq
        for i, p in enumerate(self.parsers):
            s = p.seq
            if s is None or self.dead[i]:
                continue
            if s0 is None:
                s0 = s
                continue
            why = None
            if (s.coded_width, s.coded_height) != (s0.coded_width,
                                                   s0.coded_height):
                why = ('multi-stream decode needs one resolution '
                       f'({s.coded_width}x{s.coded_height} vs '
                       f'{s0.coded_width}x{s0.coded_height})')
            elif (not np.array_equal(s.intra_quant_matrix,
                                     s0.intra_quant_matrix)
                  or not np.array_equal(s.non_intra_quant_matrix,
                                        s0.non_intra_quant_matrix)):
                why = 'multi-stream decode needs shared quant matrices'
            if why:
                if not self.quarantine:
                    raise ValueError(why)
                self.dead[i] = why
        self._seq = s0
        return s0

    def _zero_carry(self, seq):
        cw, ch = seq.coded_width, seq.coded_height
        if self.mode == 'roundrobin':
            # independent per-stream carries, created lazily on first
            # dispatch
            return [None] * self.n
        if self.mode == 'stacked':
            # joint planes: stream i owns rows [i*ch, (i+1)*ch)
            z = lambda hh, ww: jnp.zeros((self.n * hh, ww),
                                         dtype=jnp.uint8)
        else:
            z = lambda hh, ww: jnp.zeros((self.n, hh, ww),
                                         dtype=jnp.uint8)
        p = Planes(z(ch, cw), z(ch >> 1, cw >> 1), z(ch >> 1, cw >> 1))
        return p, p

    def _zero_planes(self, seq):
        cw, ch = seq.coded_width, seq.coded_height
        z = lambda hh, ww: jnp.zeros((hh, ww), dtype=jnp.uint8)
        return Planes(z(ch, cw), z(ch >> 1, cw >> 1), z(ch >> 1, cw >> 1))

    def _empty_result(self, seq):
        """Zero-frame Planes for an idle stream's round — one cached
        device allocation per geometry, not three fresh full-resolution
        planes per idle stream per round."""
        key = (seq.coded_width, seq.coded_height)
        cached = getattr(self, '_empty_planes_cache', None)
        if cached is None or cached[0] != key:
            cw, ch = key
            z = lambda hh, ww: jnp.zeros((0, hh, ww), dtype=jnp.uint8)
            cached = (key, Planes(z(ch, cw), z(ch >> 1, cw >> 1),
                                  z(ch >> 1, cw >> 1)))
            self._empty_planes_cache = cached
        return cached[1]

    def _carry_pair(self, i: int):
        """Stream i's (cur, fwd) planes out of the carry, or None if the
        stream never joined a dispatch (any mode)."""
        if self._carry is None:
            return None
        if self.mode == 'roundrobin':
            return self._carry[i]
        cur, fwd = self._carry
        if self.mode == 'stacked':
            ch = self._seq.coded_height
            cut = lambda p: Planes(
                p.y[i * ch:(i + 1) * ch],
                p.cr[i * (ch >> 1):(i + 1) * (ch >> 1)],
                p.cb[i * (ch >> 1):(i + 1) * (ch >> 1)])
            return cut(cur), cut(fwd)
        return (Planes(cur.y[i], cur.cr[i], cur.cb[i]),
                Planes(fwd.y[i], fwd.cr[i], fwd.cb[i]))

    def _demote(self, i: int, pending: Optional[dict]) -> List[Planes]:
        """Hand stream i to its own serial-capable MPEG1Decoder (its
        batch hit a condition the joint packed wire cannot carry:
        coefficient-dense cap overflow or the exactness fallback).  The
        demoted decoder adopts the stream's PARSER (buffered bytes +
        sequence state) and its scan carry, so not a frame is lost and
        the stream keeps decoding bit-exactly -- just no longer inside
        the joint dispatch.  Returns frames decoded from the pending
        dense batch, if any."""
        dec = MPEG1Decoder({'streaming': self.streaming,
                            'wire_ids': self.wire_ids,
                            'block_carry': self.block_carry,
                            'mc_method': self.mc_method,
                            'videoBufferSize': self.buffer_size})
        dec.parser = self.parsers[i]
        pair = self._carry_pair(i)
        if pair is not None:
            dec._cur, dec._fwd = pair
        elif self.parsers[i].seq is not None:
            dec._init_planes()          # demoted before any joint batch
        dec.can_play = True
        self._demoted[i] = dec
        if pending is not None and pending.get('n', 0):
            planes = dec._dispatch_batch(pending,
                                         n_frames=pending['n'])
            n = pending['n']
            return Planes(planes.y[:n], planes.cr[:n], planes.cb[:n])
        return None

    def decode_batch(self, eof: bool = False) -> Optional[List[Planes]]:
        """Parse up to batch_frames per stream, dispatch one joint scan,
        and return a per-stream Planes stack ([F_i, H, W] cropped to each
        stream's real frame count; empty list for a stream with nothing
        new).  None when no stream produced a frame."""
        F = self.batch_frames
        batches = []
        demoted_frames = {}
        newly_demoted = False
        for i, p in enumerate(self.parsers):
            if self.dead[i] or i in self._demoted:
                batches.append(dict(n=0))
                if i in self._demoted:
                    fr = self._demoted[i].decode_available(eof=eof)
                    # whole-batch device slices (3 RPCs per batch on a
                    # later fetch, not 3 per frame)
                    demoted_frames[i] = (fr.stacked_planes()
                                         if fr is not None else None)
                continue
            try:
                b = p.parse_batch(F, eof=eof)
            except Exception as e:              # noqa: BLE001
                # serving posture: a feed whose bitstream breaks its own
                # parser is quarantined with the reason; the fleet's
                # other feeds keep decoding
                if not self.quarantine:
                    raise
                self.dead[i] = f'parse error: {e!r}'
                batches.append(dict(n=0))
                continue
            if b == 'fallback' or (isinstance(b, dict) and b.get('n', 0)
                                   and 'sp_pos' not in b):
                # a per-stream condition the joint wire cannot carry:
                # demote the stream to its own serial-capable decoder
                # (bit-exact continuation) instead of failing the batch
                demoted_frames[i] = self._demote(
                    i, b if isinstance(b, dict) else None)
                newly_demoted = True
                batches.append(dict(n=0))
                continue
            if not isinstance(b, dict):
                b = dict(n=0)
            batches.append(b)
            bits = getattr(p, 'bits', None)
            if bits is not None:
                # consumed bytes never re-read (no seek surface here)
                bits.evict_consumed()
                if self.streaming:
                    unread = bits.byte_length - (bits.index >> 3)
                    if unread > self.buffer_size:
                        # emergency evac: stay current over complete
                        # (reference src/buffer.js:30-62 EVICT mode)
                        bits.index = bits.byte_length << 3
                        bits.evict_consumed()
        seq = self._check_seq()
        # a stream quarantined by the seq check -- this round or earlier
        # -- may have parsed (or demoted-decoded) in another geometry:
        # discard its output and drop its demoted decoder
        batches = [dict(n=0) if self.dead[i] else b
                   for i, b in enumerate(batches)]
        for i in list(self._demoted):
            if self.dead[i]:
                del self._demoted[i]
                demoted_frames.pop(i, None)
        counts = [b.get('n', 0) for b in batches]
        have_demoted = any(v is not None and v.y.shape[0]
                           for v in demoted_frames.values())
        if seq is None or (not any(counts) and not have_demoted
                           and not newly_demoted):
            # a round that just demoted a stream returns an empty result
            # instead of None: the demoted decoder may produce frames
            # next round, so callers must not treat this as drained
            return None
        if not any(counts):
            # only demoted streams produced frames this round
            z = lambda hh, ww: jnp.zeros((0, hh, ww), dtype=jnp.uint8)
            cw, ch = seq.coded_width, seq.coded_height
            result = [Planes(z(ch, cw), z(ch >> 1, cw >> 1),
                             z(ch >> 1, cw >> 1)) for _ in range(self.n)]
            return self._overlay_demoted(result, demoted_frames)
        n_mb = seq.mb_size
        empty = dict(n=0, run_len=np.zeros(0, np.uint16),
                     run_flags=np.zeros(0, np.uint8),
                     run_cbp=np.zeros(0, np.uint8),
                     run_mv=np.zeros((0, 2), np.int16),
                     sp_pos=np.zeros(0, np.uint8),
                     sp_v8=np.zeros(0, np.int8),
                     sp_esc=np.zeros(0, np.int16), n_blocks=0)

        # shared statics across streams (one jit variant), as mesh cells
        # do, and monotone across batches: a smaller tail batch reuses
        # the compiled variant instead of churning a new one (a serving
        # decoder's shapes are bounded by its busiest batch)
        def grow(key, val):
            val = max(self._sticky.get(key, 0), val)
            self._sticky[key] = val
            return val

        if self._carry is None:
            self._carry = self._zero_carry(seq)
        if self._quant is None:
            self._quant = jax.device_put(
                (jnp.asarray(seq.intra_quant_matrix, dtype=jnp.int32),
                 jnp.asarray(seq.non_intra_quant_matrix, dtype=jnp.int32)))
        iq, nq = self._quant

        if self.mode == 'roundrobin':
            real = [b for b in batches if b.get('n', 0)]
            n_pairs = grow('pairs',
                           max(fused_pair_bucket(len(b['sp_pos']),
                                                 len(b['sp_esc']))
                               for b in real))
            n_runs = grow('runs',
                          _bucket(max(max(len(b['run_len'])
                                          for b in real), 1), lo=256))
            n_blk = grow('blk',
                         _bucket(max(max(b['n_blocks'] for b in real), 1),
                                 lo=1024))
            mv_wide = (self._sticky.get('mv_wide', False)
                       or not all(mv_fits_narrow(b['run_mv'])
                                  for b in real))
            self._sticky['mv_wide'] = mv_wide
            halo = _merge_halo([MPEG1Decoder._band_halo(b) for b in real])
            result = []
            for i, b in enumerate(batches):
                c = b.get('n', 0)
                if not c:
                    result.append(self._empty_result(seq))
                    continue
                buf = build_fused_buffer_sized(
                    b, F, n_pairs, n_runs, n_mb, mv_wide,
                    ids_blk=n_blk if self.wire_ids else 0)
                dev = jax.device_put(buf)
                pair = self._carry[i]
                if pair is None:
                    pair = (self._zero_planes(seq),
                            self._zero_planes(seq))
                # async dispatch: stream i+1's wire uploads while stream
                # i's scan executes; the device drains the queue serially
                from ..models.mpeg1 import tuned_mc_flags
                mc_t, bc_t = tuned_mc_flags(n_mb, self.mc_method,
                                            self.block_carry)
                cur, fwd, outs = decode_scan_fused(
                    pair[0], pair[1], dev, iq, nq,
                    mb_h=seq.mb_height, mb_w=seq.mb_width, n_frames=F,
                    n_blk=n_blk, n_runs=n_runs, band_halo=halo,
                    mv_wide=mv_wide, block_carry=bc_t,
                    wire_ids=self.wire_ids, mc_method=mc_t)
                self._carry[i] = (cur, fwd)
                result.append(Planes(outs.y[:c], outs.cr[:c],
                                     outs.cb[:c]))
            return self._overlay_demoted(result, demoted_frames)

        if self.mode == 'stacked':
            # wire_ids block ids are uint16 over the JOINT grid: S
            # stacked streams multiply n_mb, so large fleets/geometries
            # overflow the id field (and collide with the 0xFFFF padding
            # sentinel).  Refuse up front instead of decoding garbage.
            if self.wire_ids and self.n * n_mb * 6 > 0xFFFE:
                if self._wire_ids_auto:
                    # probe-chosen, not user-chosen: silently drop the
                    # optimization instead of refusing the fleet
                    self.wire_ids = False
                else:
                    raise ValueError(
                        f'wire_ids + stacked: joint grid of '
                        f'{self.n}×{n_mb} MBs needs block ids up to '
                        f'{self.n * n_mb * 6 - 1} > 0xFFFE (uint16 wire '
                        f"field) — use mode='roundrobin' or "
                        f'wire_ids=False')
            per_stream = [split_packed_frames(b) if b.get('n', 0) else []
                          for b in batches]
            joint, vseg = stack_stream_frames(per_stream, n_mb, F)
            n_pairs = grow('pairs',
                           fused_pair_bucket(len(joint['sp_pos']),
                                             len(joint['sp_esc'])))
            n_runs = grow('runs',
                          _bucket(max(len(joint['run_len']), 1), lo=256))
            n_blk = grow('blk',
                         _bucket(max(joint['n_blocks'], 1), lo=1024))
            mv_wide = (self._sticky.get('mv_wide', False)
                       or not mv_fits_narrow(joint['run_mv']))
            self._sticky['mv_wide'] = mv_wide
            halo = MPEG1Decoder._band_halo(joint)
            buf = build_fused_buffer_sized(
                joint, F, n_pairs, n_runs, self.n * n_mb, mv_wide,
                ids_blk=n_blk if self.wire_ids else 0)
            dev = jax.device_put(buf)
            from ..models.mpeg1 import tuned_mc_flags
            mc_t, bc_t = tuned_mc_flags(self.n * n_mb, self.mc_method,
                                        self.block_carry, joint=True)
            cur, fwd, outs = decode_scan_fused(
                self._carry[0], self._carry[1], dev, iq, nq,
                mb_h=self.n * seq.mb_height, mb_w=seq.mb_width,
                n_frames=F, n_blk=n_blk, n_runs=n_runs, band_halo=halo,
                mv_wide=mv_wide, block_carry=bc_t,
                wire_ids=self.wire_ids, mc_method=mc_t,
                n_seg=self.n, valid_seg=jnp.asarray(vseg))
            self._carry = (cur, fwd)
            ch, hh = seq.coded_height, seq.coded_height >> 1
            result = [Planes(outs.y[:c, i * ch:(i + 1) * ch],
                             outs.cr[:c, i * hh:(i + 1) * hh],
                             outs.cb[:c, i * hh:(i + 1) * hh])
                      for i, c in enumerate(counts)]
            return self._overlay_demoted(result, demoted_frames)

        batches = [b if b.get('n', 0) else empty for b in batches]
        n_pairs = grow('pairs',
                       max(fused_pair_bucket(len(b['sp_pos']),
                                             len(b['sp_esc']))
                           for b in batches))
        n_runs = grow('runs',
                      _bucket(max(max(len(b['run_len'])
                                      for b in batches), 1), lo=256))
        n_blk = grow('blk',
                     _bucket(max(max(b['n_blocks'] for b in batches), 1),
                             lo=1024))
        # once a batch needed wide MV records, stay wide: correct for
        # narrow batches and avoids a second compiled variant
        mv_wide = (self._sticky.get('mv_wide', False)
                   or not all(mv_fits_narrow(b['run_mv']) for b in batches))
        self._sticky['mv_wide'] = mv_wide
        halo = _merge_halo([MPEG1Decoder._band_halo(b) for b in batches])

        bufs = np.stack([
            build_fused_buffer_sized(b, F, n_pairs, n_runs, n_mb, mv_wide,
                                     ids_blk=n_blk if self.wire_ids else 0)
            for b in batches])
        dev = jax.device_put(bufs)
        from ..models.mpeg1 import tuned_mc_flags
        mc_t, bc_t = tuned_mc_flags(n_mb, self.mc_method, self.block_carry)
        cur, fwd, outs = decode_scan_fused_many(
            self._carry[0], self._carry[1], dev, iq, nq,
            mb_h=seq.mb_height, mb_w=seq.mb_width, n_frames=F,
            n_blk=n_blk, n_runs=n_runs, band_halo=halo, mv_wide=mv_wide,
            block_carry=bc_t, wire_ids=self.wire_ids,
            mc_method=mc_t)
        self._carry = (cur, fwd)
        result = [Planes(outs.y[i, :c], outs.cr[i, :c], outs.cb[i, :c])
                  for i, c in enumerate(counts)]
        return self._overlay_demoted(result, demoted_frames)

    @staticmethod
    def _overlay_demoted(result, demoted_frames):
        """Splice demoted streams' outputs in.  Each value is already ONE
        stacked Planes built from whole-batch device slices
        (FrameSeq.stacked_planes / _demote) -- never per-frame slices,
        which cost 3 RPCs per FRAME on a tunneled transport."""
        for i, st in demoted_frames.items():
            if st is not None and st.y.shape[0]:
                result[i] = st
        return result

    def decode_all(self, eof: bool = True) -> List[List[Planes]]:
        """Drain every stream: returns, per stream, the list of decoded
        frames (full-resolution Planes)."""
        frames: List[List[Planes]] = [[] for _ in range(self.n)]
        while True:
            outs = self.decode_batch(eof=eof)
            if outs is None:        # no stream produced a frame
                break
            for i, st in enumerate(outs):
                for f in range(st.y.shape[0]):
                    frames[i].append(Planes(st.y[f], st.cr[f], st.cb[f]))
        return frames


def decode_streams_offline(streams: Sequence[bytes],
                           batch_frames: int = 32,
                           mode: str = 'roundrobin',
                           **kw) -> List[List[Planes]]:
    """Convenience driver: decode N elementary streams on one device,
    returning per-stream frame lists (test/library entry).  Extra
    keywords (wire_ids, mc_method, ...) forward to MultiStreamDecoder."""
    dec = MultiStreamDecoder(len(streams), batch_frames=batch_frames,
                             mode=mode, **kw)
    for i, es in enumerate(streams):
        dec.write(i, es)
    return dec.decode_all(eof=True)


def decode_streams_mesh(streams: Sequence[bytes], mesh,
                        f_code: int = 2, with_seq: bool = False,
                        mc_method: str = None):
    """Serving fleet: decode N same-resolution streams over a device
    mesh.  Every stream opens with an I-frame and its GOPs are closed
    decode units, so the streams' GOP lists simply concatenate into the
    mesh's `gop` rows (parallel/packed.py) -- stream boundaries coincide
    with I-frame splits and each row scans from a zero carry.  Returns
    per-stream frame lists, bit-exact vs decoding each stream alone;
    batches whose MV reach exceeds the tile halo fall back to the
    single-chip MultiStreamDecoder (same off-mesh policy as the
    Player's single-stream mesh path)."""
    from ..host import best_parser
    from .packed import MeshPackedDecoder, split_packed_frames

    all_frames: List[dict] = []
    bounds = [0]
    seq0 = None
    p_first = False
    for si, es in enumerate(streams):
        parser = best_parser()
        parser.write(bytes(es))
        if not hasattr(parser, 'parse_batch'):
            raise RuntimeError('mesh stream decode needs the native parser')
        while True:
            b = parser.parse_batch(32, eof=True)
            if b == 'fallback' or (isinstance(b, dict)
                                   and 'sp_pos' not in b):
                raise RuntimeError(
                    f'stream {si} needs the serial-exact path')
            if b is None:
                break
            all_frames.extend(split_packed_frames(b))
            if b['n'] < 32:
                break
        if (len(all_frames) > bounds[-1]
                and all_frames[bounds[-1]]['pic_type'] != 1):
            # a mid-GOP join would motion-compensate against the
            # PREVIOUS stream's last frame once concatenated; route the
            # whole job to the single-chip path (per-stream carries)
            p_first = True
        bounds.append(len(all_frames))
        seq = parser.seq
        if seq is None:
            continue                      # stream produced no frames
        if seq0 is None:
            seq0 = seq
        elif (seq.coded_width, seq.coded_height) != (seq0.coded_width,
                                                     seq0.coded_height):
            raise ValueError('mesh stream decode needs one resolution')
        elif (not np.array_equal(seq.intra_quant_matrix,
                                 seq0.intra_quant_matrix)
              or not np.array_equal(seq.non_intra_quant_matrix,
                                    seq0.non_intra_quant_matrix)):
            raise ValueError('mesh stream decode needs shared quant '
                             'matrices')
    if seq0 is None or not all_frames:
        return ([[] for _ in streams], seq0) if with_seq \
            else [[] for _ in streams]

    dec = MeshPackedDecoder(mesh, seq0, f_code=f_code, mc_method=mc_method)
    if p_first or not dec.fits_mesh(all_frames):
        # MV reach beyond the per-tile halo, or a stream joining
        # mid-GOP: single-chip MultiStreamDecoder fallback, exactly like
        # MPEG1Decoder's off-mesh policy.  (This re-parses from bytes --
        # acceptable on a fallback path; ~1,300 fps/core.)
        result = decode_streams_offline(streams)
        return (result, seq0) if with_seq else result
    outs, gl, _ = dec.decode(all_frames)
    rows = seq0.mb_height * 16
    flat = []
    for gi, n in enumerate(gl):
        for fi in range(n):
            flat.append(Planes(outs.y[gi, fi][:rows],
                               outs.cr[gi, fi][:rows >> 1],
                               outs.cb[gi, fi][:rows >> 1]))
    result = [flat[bounds[i]:bounds[i + 1]] for i in range(len(streams))]
    return (result, seq0) if with_seq else result
