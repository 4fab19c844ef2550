"""TS demuxer tests: mux roundtrip, chunked writes, PTS, corruption resync."""

import numpy as np
import pytest

from jsmpeg_tpu.demux import TSDemuxer
from jsmpeg_tpu.testing.ts_mux import mux_av, mux_video
from jsmpeg_tpu import tables as T


class Collector:
    def __init__(self):
        self.units = []

    def write(self, pts, buffers):
        self.units.append((pts, b''.join(bytes(b) for b in buffers)))

    @property
    def data(self):
        return b''.join(u[1] for u in self.units)


def _es_frames(n, size=900, seed=0):
    rng = np.random.default_rng(seed)
    # ES chunks must not contain 00 00 01 at the very start to confuse PES?
    # arbitrary bytes are fine for the demuxer: it never inspects ES content.
    return [rng.integers(0, 256, size + 37 * i, dtype=np.uint8).tobytes()
            for i in range(n)]


def test_video_roundtrip_whole():
    frames = _es_frames(5)
    ts = mux_video(frames, 25.0)
    d = TSDemuxer()
    c = Collector()
    d.connect(T.TS_STREAM_VIDEO_1, c)
    d.write(ts)
    d.flush()
    assert c.data == b''.join(frames)
    # padded-packet heuristic should have split exactly at frame boundaries
    assert [u[1] for u in c.units] == frames
    # PTS of frame i = i/25
    for i, (pts, _) in enumerate(c.units):
        assert abs(pts - i / 25.0) < 1e-4


def test_video_roundtrip_chunked_writes():
    frames = _es_frames(4, seed=1)
    ts = mux_video(frames, 30.0)
    d = TSDemuxer()
    c = Collector()
    d.connect(T.TS_STREAM_VIDEO_1, c)
    rng = np.random.default_rng(2)
    pos = 0
    while pos < len(ts):
        n = int(rng.integers(1, 700))
        d.write(ts[pos:pos + n])
        pos += n
    d.flush()
    assert [u[1] for u in c.units] == frames


def test_av_roundtrip():
    vframes = _es_frames(4, seed=3)
    aframes = _es_frames(6, size=400, seed=4)
    ts = mux_av(vframes, 25.0, aframes, 1152, 44100)
    d = TSDemuxer()
    cv, ca = Collector(), Collector()
    d.connect(T.TS_STREAM_VIDEO_1, cv)
    d.connect(T.TS_STREAM_AUDIO_1, ca)
    d.write(ts)
    d.flush()
    assert [u[1] for u in cv.units] == vframes
    assert [u[1] for u in ca.units] == aframes       # bounded-length PES
    for i, (pts, _) in enumerate(ca.units):
        assert abs(pts - i * 1152 / 44100) < 1e-4


def test_resync_after_garbage():
    frames = _es_frames(6, seed=5)
    ts = mux_video(frames, 25.0)
    # corrupt: drop 100 bytes mid-stream (unaligns packets)
    cut = 188 * 10 + 57
    corrupted = ts[:cut] + ts[cut + 100:]
    d = TSDemuxer()
    c = Collector()
    d.connect(T.TS_STREAM_VIDEO_1, c)
    d.write(corrupted)
    d.flush()
    assert d.resyncs >= 1
    # later frames survive intact
    assert frames[-1] in c.data


def test_unknown_pid_ignored():
    frames = _es_frames(2, seed=6)
    ts = mux_video(frames, 25.0, pid=0x42)
    d = TSDemuxer()
    c = Collector()
    d.connect(T.TS_STREAM_VIDEO_1, c)
    d.write(ts)
    d.flush()
    # stream id is learned from the PES start code regardless of PID
    assert c.data == b''.join(frames)
