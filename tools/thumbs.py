"""Thumbnail extraction: every (Nth) I-frame of a video, decoded in ONE
batched device scan and written as PNG/PPM files.

A capability the reference cannot offer: its decoder walks the stream
serially, so thumbnailing an hour of video costs an hour of decode.
Here I-pictures are self-contained (every MB intra-coded), so the
selected frames stack into one fused-wire batch and decode together at
the device-scan rate -- no inter-frame carry, no GOP scan, one upload.

Usage:
  python tools/thumbs.py clip.ts -o thumb_%03d.png [--every N] [--limit K]

Cites: I-picture semantics /root/reference/src/mpeg1.js:182-220 (intra
pictures reset prediction; only I/P decoded); the reference has no
thumbnail/trick-play surface at all.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jax_comp')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def extract_iframe_planes(es: bytes, every: int = 1, limit: int = 0):
    """Decode every `every`-th I-frame of an elementary stream in one
    batched scan.  Returns (seq, [Planes]) in stream order."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from jsmpeg_tpu.host import best_parser
    from jsmpeg_tpu.models.mpeg1 import (MPEG1Decoder, build_fused_buffer,
                                         decode_scan_fused)
    from jsmpeg_tpu.ops.frame import Planes
    from jsmpeg_tpu.parallel.packed import _concat_cell, \
        split_packed_frames

    parser = best_parser()
    parser.write(es)
    if not hasattr(parser, 'parse_batch'):
        raise RuntimeError('thumbnail extraction needs the native parser')
    iframes = []
    n_i = 0
    while True:
        b = parser.parse_batch(32, eof=True)
        if b == 'fallback' or not isinstance(b, dict):
            break
        if 'sp_pos' not in b:
            raise RuntimeError('stream needs the serial-exact path')
        for f in split_packed_frames(b):
            if f['pic_type'] == 1:          # I picture
                if n_i % every == 0:
                    iframes.append(f)
                n_i += 1
        if b['n'] < 32:
            break
        if limit and len(iframes) >= limit:
            break
    if limit:
        iframes = iframes[:limit]
    seq = parser.seq
    if not iframes or seq is None:
        return seq, []

    # I-pictures are self-contained: zero carries, one scan over the
    # stacked selection (each output overwrites every MB, so frame i's
    # result is independent of frames < i)
    batch = _concat_cell(iframes, len(iframes))
    buf, n_blk, n_runs, mv_wide, n_pairs, n_esc = build_fused_buffer(
        batch, len(iframes), seq.mb_size)
    dev = jax.device_put(buf)
    cw, ch = seq.coded_width, seq.coded_height
    z = lambda hh, ww: jnp.zeros((hh, ww), dtype=jnp.uint8)
    mk = lambda: Planes(z(ch, cw), z(ch >> 1, cw >> 1), z(ch >> 1, cw >> 1))
    iq = jnp.asarray(seq.intra_quant_matrix, dtype=jnp.int32)
    nq = jnp.asarray(seq.non_intra_quant_matrix, dtype=jnp.int32)
    _, _, outs = decode_scan_fused(
        mk(), mk(), dev, iq, nq, mb_h=seq.mb_height, mb_w=seq.mb_width,
        n_frames=len(iframes), n_blk=n_blk, n_runs=n_runs,
        band_halo=MPEG1Decoder._band_halo(batch), mv_wide=mv_wide,
        n_pairs=n_pairs, n_esc=n_esc)
    return seq, [Planes(outs.y[i], outs.cr[i], outs.cb[i])
                 for i in range(len(iframes))]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description='batched I-frame thumbnail extraction')
    ap.add_argument('source', help='.ts or .es path')
    ap.add_argument('-o', '--out', default='thumb_%03d.png',
                    help='output pattern (%%d; .png or .ppm)')
    ap.add_argument('--every', type=int, default=1,
                    help='take every Nth I-frame (default every one)')
    ap.add_argument('--limit', type=int, default=0,
                    help='stop after K thumbnails')
    args = ap.parse_args(argv)

    if args.every < 1:
        ap.error('--every must be >= 1')

    import numpy as np

    from jsmpeg_tpu.demux import demux_to_es
    from jsmpeg_tpu.ops.color import ycbcr_to_rgb_int
    from jsmpeg_tpu.sinks import write_image
    from jsmpeg_tpu.utils import fetch

    with open(args.source, 'rb') as f:
        data = f.read()
    stream = demux_to_es(data)

    t0 = time.monotonic()
    seq, planes = extract_iframe_planes(stream, args.every, args.limit)
    if not planes:
        print('no I-frames found')
        return 1
    w, h = seq.width, seq.height
    for i, p in enumerate(planes):
        rgb = fetch(ycbcr_to_rgb_int(p.y, p.cr, p.cb, w, h))
        write_image(args.out % i, np.asarray(rgb).reshape(h, w, 3))
    dt = time.monotonic() - t0
    print(f'{len(planes)} thumbnails ({w}x{h}) in {dt:.2f}s '
          f'({len(planes) / dt:.1f} thumbs/s, one batched scan)')
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
