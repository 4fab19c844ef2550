"""Joint live serving: decode N live MPEG-TS feeds on one chip.

Every feed (tcp://, ws://, http:// streaming, or a static .ts path)
demuxes on the host and its pictures join ONE vmapped device scan
(parallel/streams.py): per-stream valid masks let feeds run at unequal
rates -- a stalled camera never blocks the batch -- and per-stream scan
carries keep every feed bit-exact.  The reference's closest analog is N
separate browser tabs; here N feeds share one chip's MXU.

Usage:
  python tools/serve.py tcp://h:p ws://h:p cam2.ts -o out%d.y4m \
      [--batch 8] [--interval 0.05] [--seconds 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jax_comp')


class _ESFeed:
    """Demuxer video sink -> MultiStreamDecoder.write(i, ...)."""

    def __init__(self, dec, i):
        self.dec = dec
        self.i = i

    def write(self, pts, payload):
        if isinstance(payload, (bytes, bytearray, memoryview)):
            self.dec.write(self.i, payload)
        else:
            for p in payload:
                self.dec.write(self.i, p)


def serve(urls, out_pattern=None, batch=8, interval=0.05, seconds=None,
          stats_out=None, wav_pattern=None, wire_ids='auto',
          block_carry=False, mc_method=None, mode='roundrobin'):
    import numpy as np

    from jsmpeg_tpu.config import PlayerConfig
    from jsmpeg_tpu.demux import TSDemuxer
    from jsmpeg_tpu.models.mp2 import MP2Decoder
    from jsmpeg_tpu.parallel.streams import MultiStreamDecoder
    from jsmpeg_tpu.player import make_source
    from jsmpeg_tpu.sinks import WavWriter, Y4MWriter

    n = len(urls)
    dec = MultiStreamDecoder(n, batch_frames=batch, wire_ids=wire_ids,
                             block_carry=block_carry, mc_method=mc_method,
                             streaming=True, quarantine=True, mode=mode)
    # serving reads whole static files up front (no progressive Range
    # throttle to resume()) and treats http:// as an endless chunked
    # live body, matching the advertised feed kinds
    cfg = PlayerConfig(progressive=False, streaming=True)
    sources, demuxers, audio = [], [], []
    for i, url in enumerate(urls):
        src = make_source(url, cfg)
        dem = TSDemuxer()
        dem.connect(0xE0, _ESFeed(dec, i))
        if wav_pattern is not None:
            # audio rides the host C++ MP2 path (>200x realtime/core):
            # no reason to batch it on the device
            ad = MP2Decoder({'streaming': True})
            ad.connect(WavWriter(wav_pattern % i))
            dem.connect(0xC0, ad)
            audio.append(ad)
        src.connect(dem)
        sources.append(src)
        demuxers.append(dem)
    for s in sources:
        s.start()

    writers = [None] * n
    counts = [0] * n
    t0 = time.monotonic()
    deadline = t0 + seconds if seconds else None

    def render(outs):
        from jsmpeg_tpu.utils import fetch
        for i, st in enumerate(outs):
            k = st.y.shape[0]
            if not k:
                continue
            counts[i] += k
            if out_pattern is None:
                continue
            if writers[i] is None:
                seq = dec._seq
                writers[i] = Y4MWriter(
                    out_pattern % i,
                    getattr(seq, 'frame_rate', 30.0) or 30.0)
                writers[i].resize(seq.width, seq.height)
            # ONE readback per plane per stream (fetch bitcasts around the
            # tunnel's slow u8 D2H path), then slice frames on the host
            ys = np.asarray(fetch(st.y))
            crs = np.asarray(fetch(st.cr))
            cbs = np.asarray(fetch(st.cb))
            for f in range(k):
                writers[i].render(ys[f], crs[f], cbs[f])

    reported_dead = set()

    def report_dead():
        for i, why in enumerate(dec.dead):
            if why and i not in reported_dead:
                reported_dead.add(i)
                print(f'[serve] stream {i} ({urls[i]}) dropped: {why}',
                      file=sys.stderr, flush=True)
                sources[i].destroy()    # stop downloading a dead feed

    try:
        while deadline is None or time.monotonic() < deadline:
            for s in sources:
                if hasattr(s, 'drain'):
                    s.drain()
            for ad in audio:
                ad.decode_available()
            outs = dec.decode_batch(eof=False)
            report_dead()
            if all(dec.dead):
                print('[serve] every stream is dead; exiting',
                      file=sys.stderr, flush=True)
                break
            if outs is None:
                if all(getattr(s, 'completed', False) for s in sources):
                    break
                time.sleep(interval)
            else:
                render(outs)
        # drain whatever the parsers still hold
        for s in sources:
            if hasattr(s, 'drain'):
                s.drain()
        while True:
            outs = dec.decode_batch(eof=True)
            if outs is None:
                break
            render(outs)
        for ad in audio:
            ad.decode_available()
    finally:
        for s in sources:
            s.destroy()
        for w in writers:
            if w is not None:
                w.close()
        for ad in audio:
            if ad.destination is not None:
                ad.destination.close()
    elapsed = time.monotonic() - t0
    stats = {
        'streams': n,
        'video_frames': counts,
        'seconds': round(elapsed, 3),
        'aggregate_fps': round(sum(counts) / elapsed, 2) if elapsed else 0,
        'dead': {i: why for i, why in enumerate(dec.dead) if why},
    }
    print(json.dumps(stats), file=stats_out or sys.stdout, flush=True)
    return stats


def main(argv=None):
    ap = argparse.ArgumentParser(
        description='joint live decode of N MPEG-TS feeds on one chip')
    ap.add_argument('urls', nargs='+',
                    help='tcp://h:p, ws://h:p, http(s)://, or .ts paths')
    ap.add_argument('-o', dest='out', default=None,
                    help='per-stream y4m pattern with %%d')
    ap.add_argument('--wav', default=None,
                    help='per-stream wav pattern with %%d (host MP2 path)')
    ap.add_argument('--batch', type=int, default=8,
                    help='max frames per stream per joint dispatch')
    ap.add_argument('--interval', type=float, default=0.05,
                    help='idle poll interval (s)')
    ap.add_argument('--seconds', type=float, default=None,
                    help='stop after N seconds')
    ap.add_argument('--wire-ids', action='store_true',
                    help='ship coded-block ids (+2 B/block; hosts with '
                         'cheap H2D, i.e. most serving hosts)')
    ap.add_argument('--block-carry', action='store_true',
                    help='MB-block-layout scan carry (A/B on your chip)')
    ap.add_argument('--mode', default='roundrobin',
                    choices=['roundrobin', 'stacked', 'vmap'],
                    help='dispatch formulation (bit-exact all three; '
                         'the default follows the on-chip S-sweep, '
                         'docs/SERVING.md)')
    ap.add_argument('--mc', default=None,
                    choices=['onehot', 'fused', 'fused_pair', 'gather'],
                    help='motion-compensation formulation (bit-exact '
                         'either way; A/B on your chip)')
    args = ap.parse_args(argv)
    serve(args.urls, args.out, args.batch, args.interval, args.seconds,
          wav_pattern=args.wav,
          wire_ids=True if args.wire_ids else 'auto',
          block_carry=args.block_carry, mc_method=args.mc,
          mode=args.mode)
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
