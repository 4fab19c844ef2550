"""Packed-wire mesh decode (parallel/packed.py) vs the serial single-chip
pipeline: bit-exact on every mesh shape, including tile halo exchange."""

import numpy as np
import pytest

jax = pytest.importorskip('jax')

from jsmpeg_tpu.host.native import native_available
from jsmpeg_tpu.models.mpeg1 import MPEG1Decoder
from jsmpeg_tpu.parallel.mesh import make_mesh
from jsmpeg_tpu.parallel.packed import decode_packed_mesh
from jsmpeg_tpu.testing.gen import encode_realistic_stream

pytestmark = pytest.mark.skipif(not native_available(),
                                reason='native parser required')


def _serial_planes(es):
    dec = MPEG1Decoder()
    dec.write(0.0, es)
    outs = dec.decode_available(eof=True)
    return [(np.asarray(p.y), np.asarray(p.cr), np.asarray(p.cb))
            for p in outs]


@pytest.fixture(scope='module')
def stream():
    # 96x128: mb grid 6x8 -- n_tile=4 keeps 2 MB rows/tile (= halo for
    # f_code=2); 10 frames over gop=4 gives 3 GOPs of unequal length
    es, _ = encode_realistic_stream(96, 128, n_frames=10, seed=11, gop=4)
    return es, _serial_planes(es)


@pytest.mark.parametrize('shape', [(8, 1), (4, 2), (2, 4), (1, 2)])
def test_mesh_bit_exact(stream, shape):
    es, ref = stream
    n_gop, n_tile = shape
    mesh = make_mesh(n_gop=n_gop, n_tile=n_tile)
    outs = decode_packed_mesh(es, mesh)
    assert len(outs) == len(ref)
    for i, p in enumerate(outs):
        got = (np.asarray(p.y), np.asarray(p.cr), np.asarray(p.cb))
        for a, b in zip(got, ref[i]):
            np.testing.assert_array_equal(a, b, err_msg=f'frame {i}')


def test_player_offline_mesh(stream):
    """Player.decode_offline with cfg.mesh: same rendered frames as the
    single-device offline path, including the decodeFirstFrame preview
    (which leaves the parser mid-GOP, exercising the carry init)."""
    from jsmpeg_tpu.player import Player
    from jsmpeg_tpu.sinks import VideoCollector
    from jsmpeg_tpu.testing.ts_mux import TSMuxer

    es, ref = stream
    mux = TSMuxer()
    mux.add_access_unit(0x100, 0xE0, es, 0.0, bounded=True)
    ts = mux.getvalue()

    vc = VideoCollector()
    p = Player(ts, {'audio': False, 'mesh': '4x2'}, renderer=vc)
    n_video, _ = p.decode_offline()
    # preview decodes frame 0 once before the batch: one extra render
    assert n_video == len(ref)
    got = vc.frames[-len(ref):]
    for i, (y, cr, cb) in enumerate(got):
        for a, b in zip((np.asarray(y), np.asarray(cr), np.asarray(cb)),
                        ref[i]):
            np.testing.assert_array_equal(a, b, err_msg=f'frame {i}')


def test_cli_offline_mesh(stream, tmp_path):
    from jsmpeg_tpu.__main__ import main
    from jsmpeg_tpu.testing.ts_mux import TSMuxer
    es, ref = stream
    mux = TSMuxer()
    mux.add_access_unit(0x100, 0xE0, es, 0.0, bounded=True)
    ts_path = tmp_path / 'clip.ts'
    ts_path.write_bytes(mux.getvalue())
    out = tmp_path / 'out.y4m'
    rc = main([str(ts_path), '--offline', '--mesh', '2x2', '--no-audio',
               '-o', str(out)])
    assert rc == 0
    assert out.stat().st_size > 0


def test_resolve_mesh_forms():
    from jsmpeg_tpu.parallel.mesh import resolve_mesh
    assert resolve_mesh(None) is None
    assert dict(resolve_mesh('4x2').shape) == {'gop': 4, 'tile': 2}
    assert dict(resolve_mesh(8).shape) == {'gop': 8, 'tile': 1}
    assert dict(resolve_mesh((2, 2)).shape) == {'gop': 2, 'tile': 2}
    assert dict(resolve_mesh('auto').shape) == {'gop': 8, 'tile': 1}
    m = resolve_mesh('4x2')
    assert resolve_mesh(m) is m


def test_mesh_decoder_api_carry(stream):
    """Splitting the frame list across two decode() calls mid-GOP must
    thread the reference planes through the returned carry."""
    from jsmpeg_tpu.host import best_parser
    from jsmpeg_tpu.parallel.packed import (MeshPackedDecoder,
                                            split_packed_frames)
    es, ref = stream
    parser = best_parser()
    parser.write(es)
    frames = []
    while True:
        b = parser.parse_batch(32, eof=True)
        if b is None:
            break
        frames.extend(split_packed_frames(b))
        if b['n'] < 32:
            break
    mesh = make_mesh(n_gop=2, n_tile=2)
    dec = MeshPackedDecoder(mesh, parser.seq)
    cut = 6   # mid-GOP (gop=4: frame 6 is P inside the second GOP)
    outs1, gl1, carry = dec.decode(frames[:cut])
    outs2, gl2, _ = dec.decode(frames[cut:], init=carry)
    rows = parser.seq.mb_height * 16
    got = []
    for outs, gl in ((outs1, gl1), (outs2, gl2)):
        for gi, n in enumerate(gl):
            for fi in range(n):
                got.append((np.asarray(outs.y[gi, fi][:rows]),
                            np.asarray(outs.cr[gi, fi][:rows >> 1]),
                            np.asarray(outs.cb[gi, fi][:rows >> 1])))
    assert len(got) == len(ref)
    for i, (g, r) in enumerate(zip(got, ref)):
        for a, b in zip(g, r):
            np.testing.assert_array_equal(a, b, err_msg=f'frame {i}')
