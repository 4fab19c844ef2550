"""Multi-host (DCN) runtime: GOP shards parse on their owning host and
decode over a global ('gop', 'tile') mesh.

The reference is a single browser process; its one scaling-adjacent piece
is the websocket-relay fan-out (/root/reference/websocket-relay.js:42-48),
which distributes *bytes*, not work.  Here the same idea becomes a decode
fabric (SURVEY.md section 5, distributed-communication row):

  1. `jax.distributed.initialize` joins N processes into one runtime;
     the global mesh lays 'gop' across hosts (DCN) and 'tile' across each
     host's local devices (ICI).
  2. Every host runs `index_gops` -- a start-code scan (no VLC work) --
     to find the byte range of every closed GOP, then VLC-parses ONLY its
     own contiguous block of GOPs (the host-side chunk distribution of
     SURVEY.md:394-400).
  3. Per-host packed cells assemble into global arrays with
     `jax.make_array_from_single_device_arrays`; the decode itself is the
     SAME shard_map program as single-host (parallel/packed.py) -- XLA
     compiles the collectives over ICI/DCN.

Static shapes (pair/run/block buckets) are agreed across hosts with one
process_allgather so every process compiles the identical program; output
planes come back via addressable shards only (no cross-host gathers on
the readout path).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..models.mpeg1 import _bucket, fused_pair_bucket

_PIC_START = 0x00
_SEQ_START = 0xB3
_GOP_START = 0xB8
_EXT_START = 0xB5
_USER_START = 0xB2


def _scan_start_codes(es: bytes):
    """Yield (byte_offset, code) for every 00 00 01 xx in the stream."""
    pos = 0
    find = es.find
    while True:
        pos = find(b'\x00\x00\x01', pos)
        if pos < 0 or pos + 3 >= len(es):
            return
        yield pos, es[pos + 3]
        pos += 3


def index_gops(es: bytes) -> Tuple[bytes, List[Tuple[int, int, int]]]:
    """Cheap GOP index: start-code scan only (no VLC decode).

    Returns (header, ranges): `header` is the prefix holding the first
    sequence header (+ quant matrices), and ranges is a list of
    (start, end, n_frames) byte ranges, one per closed GOP, where
    n_frames counts only the I/P pictures the decoder emits (B/D skip,
    cf. /root/reference/src/mpeg1.js:182-184).  A GOP starts at the
    GOP/repeat-sequence headers immediately preceding an I picture
    (picture_coding_type read at a fixed bit offset -- no VLC)."""
    seen_seq = False
    pending_hdr: Optional[int] = None
    gop_starts: List[int] = []
    pic_counts: List[int] = []
    first_pic = None
    for pos, code in _scan_start_codes(es):
        if code == _SEQ_START:
            if seen_seq:                 # mid-stream repeat header
                if pending_hdr is None:
                    pending_hdr = pos
            else:                        # the initial header stays in the
                seen_seq = True          # shared prefix
                pending_hdr = None
        elif code == _GOP_START:
            if pending_hdr is None:
                pending_hdr = pos
        elif code == _PIC_START:
            if first_pic is None:
                first_pic = pos
            if pos + 5 < len(es):
                # 10 bits temporal_reference then 3 bits coding type,
                # starting right after the 32-bit start code
                b = (es[pos + 4] << 8) | es[pos + 5]
                pic_type = (b >> 3) & 7
            else:
                pic_type = 0
            if pic_type == 1 or not gop_starts:
                gop_starts.append(pending_hdr
                                  if pending_hdr is not None else pos)
                pic_counts.append(0)
            if pic_type in (1, 2):       # I/P only: what the decoder emits
                pic_counts[-1] += 1
            pending_hdr = None
        elif code not in (_EXT_START, _USER_START):
            pending_hdr = None           # slice/other codes break the run
    if first_pic is None or not seen_seq:
        return es, []
    header = es[:gop_starts[0]]
    ends = gop_starts[1:] + [len(es)]
    return header, [(s, e, n)
                    for (s, e, n) in zip(gop_starts, ends, pic_counts)]


def parse_gop_range(header: bytes, es: bytes, start: int, end: int):
    """VLC-parse one GOP byte range into per-frame packed dicts (the
    shared header prefix re-primes a fresh parser for each range)."""
    from ..host import best_parser
    from .packed import split_packed_frames
    parser = best_parser()
    parser.write(header + es[start:end])
    frames: List[dict] = []
    while True:
        b = parser.parse_batch(32, eof=True)
        if b == 'fallback' or (isinstance(b, dict) and 'sp_pos' not in b):
            raise RuntimeError('GOP range needs the serial-exact path')
        if b is None:
            break
        frames.extend(split_packed_frames(b))
        if b['n'] < 32:
            break
    return parser.seq, frames


def initialize(coordinator_address: str, num_processes: int,
               process_id: int) -> None:
    """Join the jax distributed runtime."""
    import jax
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_global_mesh(n_tile: int = 1):
    """('gop', 'tile') mesh over ALL processes' devices: contiguous 'gop'
    blocks per process (DCN between blocks), 'tile' inside a host (ICI)."""
    import jax
    from jax.sharding import Mesh
    devices = jax.devices()
    assert jax.local_device_count() % n_tile == 0, \
        (jax.local_device_count(), n_tile)
    arr = np.array(devices).reshape(len(devices) // n_tile, n_tile)
    return Mesh(arr, ('gop', 'tile'))


def _agree_maxima(values: np.ndarray) -> np.ndarray:
    """Element-wise max across processes (all hosts must compile the same
    static shapes)."""
    import jax
    if jax.process_count() == 1:
        return values
    from jax.experimental import multihost_utils
    return np.max(multihost_utils.process_allgather(values), axis=0)


def _replicated(x, mesh):
    """A fully-replicated global array (every process contributes its
    local copy; required for multiprocess jit inputs with spec P())."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    x = np.asarray(x)
    return jax.make_array_from_callback(
        x.shape, NamedSharding(mesh, P()), lambda idx: x[idx])


def _gather_local_gops(arr, G: int):
    """Stitch this host's addressable shards of a [G, F, rows, W] output
    into {gi: np [F, rows, W]} -- the row filtering comes from
    addressable_shards itself (no cross-host transfer)."""
    out: Dict[int, np.ndarray] = {}
    shape = arr.shape
    for sh in arr.addressable_shards:
        g_sl, f_sl, r_sl, c_sl = sh.index
        data = np.asarray(sh.data)
        for k, gi in enumerate(range(*g_sl.indices(G))):
            if gi not in out:
                out[gi] = np.zeros(shape[1:], data.dtype)
            out[gi][f_sl, r_sl, c_sl] = data[k]
    return out


def decode_packed_multihost(es: bytes, n_tile: int = 1, f_code: int = 2):
    """Decode an elementary stream across every host in the distributed
    runtime.  Each host indexes the full stream (start-code scan), parses
    only its contiguous block of GOPs, and contributes its shards of the
    global cell-buffer array.  Returns (seq, frame_indices, planes):
    frame_indices are the GLOBAL frame numbers this host decoded and
    planes their full-frame output (host-local numpy)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..ops.frame import Planes
    from ..models.mpeg1 import (build_fused_buffer_sized, fused_buffer_len,
                                mv_fits_narrow)
    from .packed import (_concat_cell, decode_gops_tiled_packed,
                         split_frame_tiles)
    from .tiles import halo_mb_rows

    header, ranges = index_gops(es)
    if not ranges:
        return None, [], []
    mesh = make_global_mesh(n_tile=n_tile)
    n_gop_axis = mesh.shape['gop']
    n_tile_axis = mesh.shape['tile']
    G = max(1, -(-len(ranges) // n_gop_axis)) * n_gop_axis
    n_proc = jax.process_count()
    pid = jax.process_index()
    per_host = G // n_proc          # contiguous gop rows per host
    my_rows = range(pid * per_host, (pid + 1) * per_host)

    # parse ONLY this host's GOPs (plus the header prefix for seq info)
    from .packed import gop_closed
    seq = None
    my_gops: Dict[int, list] = {}
    for gi in my_rows:
        if gi < len(ranges):
            s, e, _ = ranges[gi]
            seq, frames = parse_gop_range(header, es, s, e)
            if not gop_closed(frames):
                raise ValueError(
                    f'GOP {gi} not closed (slice-gap frame exposes '
                    f'pre-GOP plane content): the jax.distributed mesh '
                    f'decode cannot thread pre-GOP state; use '
                    f'parallel.elastic (prefix fallback) or the serial '
                    f'pipeline for this stream')
            my_gops[gi] = frames
    if seq is None:                 # padding-only host: header only
        seq, _ = parse_gop_range(header, es, 0, 0)

    mb_h, mb_w = seq.mb_height, seq.mb_width
    n_mb = mb_h * mb_w
    mb_h_pad = -(-mb_h // n_tile_axis) * n_tile_axis
    mb_h_local = mb_h_pad // n_tile_axis

    cells = {gi: [_concat_cell(
        [split_frame_tiles(f, n_mb, mb_w, mb_h_local, n_tile_axis)[t]
         for f in frames], n=len(frames)) for t in range(n_tile_axis)]
        for gi, frames in my_gops.items()}

    # agree on global static shapes (one allgather; [4] = wide-MV flag)
    local_max = np.zeros(5, np.int64)
    local_max[3] = max((len(f) for f in my_gops.values()), default=1)
    for row in cells.values():
        for c in row:
            local_max[:3] = np.maximum(local_max[:3], [
                fused_pair_bucket(len(c['sp_pos']), len(c['sp_esc'])),
                len(c['run_len']), c['n_blocks']])
            local_max[4] |= not mv_fits_narrow(c['run_mv'])
    gmax = _agree_maxima(local_max)
    n_pairs = fused_pair_bucket(int(gmax[0]), 0)
    n_runs = _bucket(max(int(gmax[1]), 1), lo=64)
    n_blk = _bucket(max(int(gmax[2]), 1), lo=256)
    fmax = _bucket(max(int(gmax[3]), 1), lo=2)
    mv_wide = bool(gmax[4])

    n_mb_local = mb_h_local * mb_w
    L = fused_buffer_len(fmax, n_mb_local, n_pairs, n_runs, mv_wide)
    empty = _concat_cell([], 0)

    # assemble the global [G, T, L] cell-buffer array from local shards
    buf_sharding = NamedSharding(mesh, P('gop', 'tile', None))
    idx_map = buf_sharding.devices_indices_map((G, n_tile_axis, L))
    shards = []
    for device, slices in idx_map.items():
        if device.process_index != pid:
            continue
        g_sl, t_sl, _ = slices
        gs = range(*g_sl.indices(G))
        ts = range(*t_sl.indices(n_tile_axis))
        block = np.zeros((len(gs), len(ts), L), np.uint8)
        for a, gi in enumerate(gs):
            row = cells.get(gi)
            for b, t in enumerate(ts):
                cell = row[t] if row is not None else empty
                block[a, b] = build_fused_buffer_sized(
                    cell, fmax, n_pairs, n_runs, n_mb_local, mv_wide)
        shards.append(jax.device_put(block, device))
    gbuf = jax.make_array_from_single_device_arrays(
        (G, n_tile_axis, L), buf_sharding, shards)

    # zero init planes (multihost GOP blocks always start at an I picture)
    ch_pad, cw = mb_h_pad * 16, mb_w * 16
    plane_sh = NamedSharding(mesh, P('gop', 'tile'))

    def zeros_global(rows, cols):
        return jax.make_array_from_callback(
            (G, rows, cols), plane_sh,
            lambda i: np.zeros((len(range(*i[0].indices(G))),
                                len(range(*i[1].indices(rows))),
                                cols), np.uint8))

    mkp = lambda: Planes(zeros_global(ch_pad, cw),
                         zeros_global(ch_pad >> 1, cw >> 1),
                         zeros_global(ch_pad >> 1, cw >> 1))
    iq = _replicated(np.asarray(seq.intra_quant_matrix, np.int32), mesh)
    nq = _replicated(np.asarray(seq.non_intra_quant_matrix, np.int32), mesh)
    outs, _, _ = decode_gops_tiled_packed(
        gbuf, mkp(), mkp(), iq, nq, n_frames=fmax, mb_h_local=mb_h_local,
        mb_w=mb_w, n_runs=n_runs, n_blk=n_blk,
        halo_mb=halo_mb_rows(f_code), mb_h_total=mb_h_pad, mesh=mesh,
        mv_wide=mv_wide)

    # readout: this host's shards only (no cross-host gathers)
    rows = mb_h * 16
    y_loc = _gather_local_gops(outs.y, G)
    cr_loc = _gather_local_gops(outs.cr, G)
    cb_loc = _gather_local_gops(outs.cb, G)
    frame_base = np.concatenate(
        [[0], np.cumsum([r[2] for r in ranges])]).astype(int)
    my_frames, my_planes = [], []
    for gi in sorted(my_gops):
        for fi in range(len(my_gops[gi])):
            my_frames.append(int(frame_base[gi] + fi))
            my_planes.append(Planes(y_loc[gi][fi][:rows],
                                    cr_loc[gi][fi][:rows >> 1],
                                    cb_loc[gi][fi][:rows >> 1]))
    return seq, my_frames, my_planes
