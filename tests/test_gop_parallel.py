"""GOP-parallel decode over a virtual 8-device CPU mesh must equal the
serial scan decode exactly."""

import jax
import numpy as np
import pytest

from jsmpeg_tpu.host.mpeg1_parse import MPEG1Parser
from jsmpeg_tpu.models.mpeg1 import MPEG1Decoder
from jsmpeg_tpu.parallel.gop import decode_gop_parallel, split_gops
from jsmpeg_tpu.parallel.mesh import make_mesh
from jsmpeg_tpu.testing.gen import encode_test_stream


def _parse_all(es):
    p = MPEG1Parser()
    p.write(es)
    frames = []
    while True:
        fd = p.parse_frame(eof=True)
        if fd is None:
            break
        frames.append(fd)
    return p.seq, frames


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 devices')
def test_gop_parallel_matches_serial():
    es, _ = encode_test_stream(64, 48, n_frames=16, seed=31, gop=2)
    seq, frames = _parse_all(es)
    assert len(split_gops(frames)) == 8

    mesh = make_mesh(n_gop=8, n_tile=1)
    par = decode_gop_parallel(frames, seq.mb_height, seq.mb_width, mesh)

    dec = MPEG1Decoder()
    dec.write(0.0, es)
    ser = dec.decode_available(eof=True)

    assert len(par) == len(ser) == 16
    for i, (a, b) in enumerate(zip(par, ser)):
        assert np.array_equal(np.asarray(a.y), np.asarray(b.y)), f'frame {i}'
        assert np.array_equal(np.asarray(a.cr), np.asarray(b.cr))
        assert np.array_equal(np.asarray(a.cb), np.asarray(b.cb))


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 devices')
def test_gop_parallel_uneven_gops():
    # gop=3 over 10 frames -> 4 GOPs of sizes 3,3,3,1; padding exercised
    es, _ = encode_test_stream(48, 32, n_frames=10, seed=32, gop=3)
    seq, frames = _parse_all(es)
    mesh = make_mesh(n_gop=4, n_tile=2)
    par = decode_gop_parallel(frames, seq.mb_height, seq.mb_width, mesh)

    dec = MPEG1Decoder()
    dec.write(0.0, es)
    ser = dec.decode_available(eof=True)
    for a, b in zip(par, ser):
        assert np.array_equal(np.asarray(a.y), np.asarray(b.y))
