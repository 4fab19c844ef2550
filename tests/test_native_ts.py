"""The C++ TS demuxer must deliver byte-identical PES packets (and
matching counters) to the pure-Python twin -- on clean streams, chunked
writes, corrupted packets, and garbage-prefixed input."""

import numpy as np
import pytest

from jsmpeg_tpu.demux import TSDemuxer
from jsmpeg_tpu.host.native import native_available
from jsmpeg_tpu.testing.gen import encode_test_stream
from jsmpeg_tpu.testing.mp2_enc import encode_stream as mp2_stream
from jsmpeg_tpu.testing.ts_mux import TSMuxer, mux_av, mux_video

pytestmark = pytest.mark.skipif(not native_available(),
                                reason='native library required')


class Collector:
    def __init__(self):
        self.items = []

    def write(self, pts, buffers):
        self.items.append((round(pts, 9), b''.join(bytes(b)
                                                   for b in buffers)))


def _run(ts: bytes, chunks=None, streams=(0xE0, 0xC0)):
    outs = []
    for native in (False, True):
        dem = TSDemuxer({'native': native})
        cols = {}
        for sid in streams:
            cols[sid] = Collector()
            dem.connect(sid, cols[sid])
        for c in (chunks or [ts]):
            dem.write(c)
        dem.flush()
        outs.append((cols, dem.packets_parsed, dem.resyncs,
                     round(dem.current_time, 9)))
    (py, pp, pr, pt), (nat, np_, nr, nt) = outs
    assert pp == np_ and pr == nr and pt == nt, (pp, np_, pr, nr, pt, nt)
    for sid in streams:
        assert py[sid].items == nat[sid].items, f'stream {sid} differs'
    return py


def _make_av_ts():
    es, chunks = encode_test_stream(64, 48, n_frames=6, seed=5, gop=3,
                                    frame_rate=25.0)
    aes, aframes = mp2_stream(4, seed=6)
    v = chunks[:-1]
    v[-1] = v[-1] + chunks[-1]
    return mux_av(v, 25.0, aframes, 1152, 44100)


def test_clean_av_stream():
    ts = _make_av_ts()
    py = _run(ts)
    assert py[0xE0].items and py[0xC0].items


@pytest.mark.parametrize('chunk_size', [1, 7, 188, 189, 1000])
def test_chunked_writes(chunk_size):
    ts = _make_av_ts()
    chunks = [ts[i:i + chunk_size] for i in range(0, len(ts), chunk_size)]
    py = _run(ts, chunks=chunks)
    assert py[0xE0].items


def test_garbage_prefix_resync():
    ts = _make_av_ts()
    rng = np.random.default_rng(0)
    garbage = rng.integers(0, 256, 401).astype(np.uint8).tobytes()
    garbage = garbage.replace(b'\x47', b'\x48')
    _run(garbage + ts)


def test_corrupted_packets():
    ts = bytearray(_make_av_ts())
    rng = np.random.default_rng(1)
    # flip bytes inside some packets and destroy a few sync bytes
    for _ in range(40):
        ts[int(rng.integers(0, len(ts)))] = int(rng.integers(0, 256))
    for k in (5, 11, 12):
        if k * 188 < len(ts):
            ts[k * 188] = 0x00
    _run(bytes(ts))


def test_unconnected_streams_ignored():
    ts = _make_av_ts()
    py = _run(ts, streams=(0xE0,))
    assert py[0xE0].items
