"""Garbage-in robustness: malformed/truncated/corrupted streams must never
crash any layer (the reference's defensive-decoding posture,
SURVEY.md section 4 item 3) -- they may produce no or partial output."""

import numpy as np
import pytest

from jsmpeg_tpu.demux import TSDemuxer
from jsmpeg_tpu.models.mp2 import MP2Decoder
from jsmpeg_tpu.models.mpeg1 import MPEG1Decoder
from jsmpeg_tpu.testing.gen import encode_test_stream
from jsmpeg_tpu.testing.mp2_enc import encode_stream
from jsmpeg_tpu.testing.ts_mux import mux_av


def _ts_fixture():
    es, chunks = encode_test_stream(96, 64, n_frames=6, seed=31, gop=3)
    aes, af = encode_stream(6, seed=32)
    v = chunks[:-1]
    v[-1] += chunks[-1]
    return mux_av(v, 25.0, af, 1152, 44100)


def _drain(ts_bytes):
    dem = TSDemuxer()
    vid = MPEG1Decoder({'streaming': True})
    aud = MP2Decoder({'streaming': True})
    dem.connect(0xE0, vid)
    dem.connect(0xC0, aud)
    dem.write(ts_bytes)
    n = 0
    for _ in range(40):
        if vid.decode(eof=True) is None:
            break
        n += 1
    for _ in range(40):
        if aud.decode() is None:
            break
    return n


def test_pure_garbage():
    rng = np.random.default_rng(0)
    _drain(rng.integers(0, 256, 40000, dtype=np.uint8).tobytes())


def test_truncations():
    ts = _ts_fixture()
    for frac in (0.07, 0.33, 0.61, 0.94):
        _drain(ts[:int(len(ts) * frac)])


def test_bit_corruption():
    ts = bytearray(_ts_fixture())
    rng = np.random.default_rng(7)
    for _ in range(12):
        corrupted = bytearray(ts)
        for _ in range(30):
            corrupted[int(rng.integers(0, len(ts)))] ^= \
                int(rng.integers(1, 256))
        _drain(bytes(corrupted))


def test_random_chunk_boundaries():
    ts = _ts_fixture()
    rng = np.random.default_rng(9)
    dem = TSDemuxer()
    vid = MPEG1Decoder({'streaming': True})
    dem.connect(0xE0, vid)
    i = 0
    while i < len(ts):
        n = int(rng.integers(1, 700))
        dem.write(ts[i:i + n])
        i += n
        vid.decode()


def test_garbage_then_valid_stream_recovers():
    """TS resync: after leading garbage, a clean stream still decodes."""
    rng = np.random.default_rng(3)
    junk = rng.integers(0, 256, 3777, dtype=np.uint8).tobytes()
    assert _drain(junk + _ts_fixture()) >= 5


def test_zero_picture_rate_header_survives():
    """A corrupted sequence header can carry the forbidden picture-rate
    code 0 (PICTURE_RATE[0] == 0.0): decoding must keep a finite clock
    instead of dividing by zero (found by tools/fuzz_soak.py seed
    1787025327).  The JS reference yields Infinity timestamps here; we
    keep the previous/default rate -- documented deviation."""
    from jsmpeg_tpu.testing.bitwriter import BitWriter
    es, _ = encode_test_stream(48, 48, n_frames=2, seed=50, gop=2)
    # the fixture encoder emits the sequence header first: locate it and
    # zero the 4-bit picture-rate field (byte 7 low nibble of the
    # 12+12+4 layout following the 32-bit start code)
    i = es.index(b'\x00\x00\x01\xb3')
    b = bytearray(es)
    b[i + 7] &= 0xF0                       # picture_rate code -> 0
    dec = MPEG1Decoder({'streaming': True})
    dec.write(0.0, bytes(b))
    n = 0
    for _ in range(8):
        if dec.decode(eof=True) is None:
            break
        n += 1
    assert dec.frame_rate == 30.0          # finite fallback kept
    assert np.isfinite(dec.decoded_time)
