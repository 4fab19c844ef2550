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


def _dense_mixed_stream():
    """32 sparse I/P frames (one packed batch) followed by an all-dense
    intra GOP that overflows the packed caps (every block carries 64
    coefficients) -> the parser's r==-3 dense retry."""
    from jsmpeg_tpu.testing.bitwriter import BitWriter
    from jsmpeg_tpu.testing.gen import encode_test_stream
    from jsmpeg_tpu.testing.mpeg1_enc import MB, MPEG1Encoder
    es, _ = encode_test_stream(48, 48, n_frames=32, seed=41, gop=8)
    es = es[:-4]                             # drop sequence_end
    enc = MPEG1Encoder(48, 48, qscale=1)
    enc._temporal_ref = 32
    rng = np.random.default_rng(5)
    parts = [es]
    for _ in range(4):
        enc.w = BitWriter()
        mbs = []
        for _ in range(enc.mb_w * enc.mb_h):
            levels = []
            for b in range(6):
                lv = rng.integers(1, 4, 64) * rng.choice((-1, 1), 64)
                lv[0] = int(rng.integers(1, 200))
                levels.append(lv)
            mbs.append(MB('intra', levels=levels))
        enc.encode_picture(1, mbs)           # T.PIC_I
        parts.append(enc.getvalue())
    parts.append(b'\x00\x00\x01\xb7')
    return b''.join(parts)


def test_mesh_dense_fallback_mid_stream():
    """A coefficient-dense batch (packed-cap overflow) mid-stream runs on
    the default device while packed GOPs ride the mesh; the carry threads
    through both, bit-exact vs serial."""
    from jsmpeg_tpu.host import best_parser
    es = _dense_mixed_stream()
    # the stream really produces both batch kinds
    p = best_parser()
    p.write(es)
    kinds = []
    while True:
        b = p.parse_batch(32, eof=True)
        if not isinstance(b, dict):
            break
        kinds.append('packed' if 'sp_pos' in b else 'dense')
        if b['n'] < 32:
            break
    assert 'dense' in kinds and 'packed' in kinds, kinds

    ref = _serial_planes(es)
    mesh = make_mesh(n_gop=4, n_tile=1)
    dec = MPEG1Decoder()
    dec.write(0.0, es)
    outs = dec.decode_available(eof=True, mesh=mesh)
    assert len(outs) == len(ref)
    for i, pl in enumerate(outs):
        got = (np.asarray(pl.y), np.asarray(pl.cr), np.asarray(pl.cb))
        for a, b in zip(got, ref[i]):
            np.testing.assert_array_equal(a, b, err_msg=f'frame {i}')


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


def _slice_gap_stream():
    """Fixture found by the round-5 fuzz soak (seed 799): frame 4 (the
    first P of GOP 2) leaves MB (0,5) uncovered by any slice, so its
    pixels come from the stale current plane = frame 2 -- PRE-GOP
    content.  GOP-parallel decode from zero-init cells cannot reproduce
    that."""
    from jsmpeg_tpu.testing.gen import encode_test_stream
    es, _ = encode_test_stream(96, 64, n_frames=8, seed=922899424, gop=3,
                               f_code=3, full_pel=False)
    return es


def test_gop_closed_predicate():
    from jsmpeg_tpu.host import best_parser
    from jsmpeg_tpu.parallel.gop import split_at_iframes
    from jsmpeg_tpu.parallel.packed import (gop_closed, gops_all_closed,
                                            split_packed_frames)
    p = best_parser()
    p.write(_slice_gap_stream())
    frames = []
    while True:
        b = p.parse_batch(32, eof=True)
        if b is None:
            break
        frames.extend(split_packed_frames(b))
        if b['n'] < 32:
            break
    gops = split_at_iframes(frames, lambda f: f['pic_type'])
    closed = [gop_closed(g) for g in gops]
    assert closed == [True, False, True]       # GOP 2 has the slice gap
    assert not gops_all_closed(frames)


def test_mesh_refuses_open_gop():
    es = _slice_gap_stream()
    with pytest.raises(ValueError, match='GOP not closed'):
        decode_packed_mesh(es, make_mesh(n_gop=1, n_tile=1))


def test_player_mesh_falls_back_bit_exact_on_open_gop():
    """The product mesh path must fall back off-mesh for open GOPs and
    stay bit-exact vs the serial pipeline (the round-5 soak failure)."""
    es = _slice_gap_stream()
    ref_dec = MPEG1Decoder()
    ref_dec.write(0.0, es)
    ref = ref_dec.decode_available(eof=True)
    dm = MPEG1Decoder()
    dm.write(0.0, es)
    outs = dm.decode_available(eof=True, mesh=make_mesh(n_gop=2, n_tile=1))
    assert len(outs) == len(ref) == 8
    for i in range(8):
        p, r = outs[i], ref[i]
        np.testing.assert_array_equal(np.asarray(p.y), np.asarray(r.y),
                                      err_msg=f'frame {i}')
        np.testing.assert_array_equal(np.asarray(p.cr), np.asarray(r.cr))
        np.testing.assert_array_equal(np.asarray(p.cb), np.asarray(r.cb))


def test_elastic_prefix_fallback_on_open_gop():
    """The elastic GOP-shard decode must detect an open GOP range and
    fall back to a prefix decode, staying bit-exact."""
    from jsmpeg_tpu.parallel.elastic import decode_gops_elastic
    es = _slice_gap_stream()
    ref_dec = MPEG1Decoder()
    ref_dec.write(0.0, es)
    ref = ref_dec.decode_available(eof=True)
    counts, frames = decode_gops_elastic(
        es, n_workers=2, worker_env={'JAX_PLATFORMS': 'cpu'})
    assert sum(counts) == len(ref) == 8
    for i, ((y, cr, cb), r) in enumerate(zip(frames, ref)):
        np.testing.assert_array_equal(y, np.asarray(r.y),
                                      err_msg=f'frame {i}')
        np.testing.assert_array_equal(cr, np.asarray(r.cr))
        np.testing.assert_array_equal(cb, np.asarray(r.cb))
