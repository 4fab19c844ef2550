"""Mesh decode of streams whose MV reach exceeds the default f_code=2
halo: the halo must grow to the data's actual reach (f_code up to 4,
full_pel doubling), and when it cannot fit the per-tile rows the mesh
Player path must fall back off-mesh -- bit-exact either way."""

import numpy as np
import pytest

jax = pytest.importorskip('jax')

from jsmpeg_tpu.host.native import native_available
from jsmpeg_tpu.models.mpeg1 import MPEG1Decoder
from jsmpeg_tpu.parallel.mesh import make_mesh
from jsmpeg_tpu.parallel.packed import MeshPackedDecoder, decode_packed_mesh
from jsmpeg_tpu.testing.gen import encode_test_stream

pytestmark = pytest.mark.skipif(not native_available(),
                                reason='native parser required')


def _serial(es):
    dec = MPEG1Decoder()
    dec.write(0.0, es)
    outs = dec.decode_available(eof=True)
    return [(np.asarray(p.y), np.asarray(p.cr), np.asarray(p.cb))
            for p in outs]


def _mesh_via_decoder(es, mesh):
    dec = MPEG1Decoder()
    dec.write(0.0, es)
    outs = dec.decode_available(eof=True, mesh=mesh)
    return [(np.asarray(p.y), np.asarray(p.cr), np.asarray(p.cb))
            for p in outs]


@pytest.mark.parametrize('f_code,full_pel', [(3, False), (4, False),
                                             (3, True)])
def test_high_fcode_mesh_grows_halo(f_code, full_pel):
    """128px tall (8 MB rows), 2 tiles of 4 rows: reach up to ~60px needs
    a 4-row halo -- fits, so the mesh path must decode bit-exact with the
    grown halo."""
    es, _ = encode_test_stream(96, 128, n_frames=6, seed=21, gop=3,
                               f_code=f_code, full_pel=full_pel)
    ref = _serial(es)
    mesh = make_mesh(n_gop=4, n_tile=2)
    got = _mesh_via_decoder(es, mesh)
    assert len(got) == len(ref)
    for i, (g, r) in enumerate(zip(got, ref)):
        for a, b in zip(g, r):
            np.testing.assert_array_equal(a, b, err_msg=f'frame {i}')


def test_reach_beyond_tile_rows_falls_back():
    """4 tiles of 2 MB rows cannot hold a 4-row halo: the Player mesh
    path must fall back off-mesh and stay bit-exact; the raw library
    driver must refuse loudly instead of corrupting."""
    es, _ = encode_test_stream(96, 128, n_frames=6, seed=22, gop=3,
                               f_code=4)
    ref = _serial(es)
    mesh = make_mesh(n_gop=2, n_tile=4)

    # library driver: explicit error, not silent corruption
    dec = MPEG1Decoder()
    dec.write(0.0, es)
    batch = dec.parser.parse_batch(32, eof=True)
    from jsmpeg_tpu.parallel.packed import split_packed_frames
    frames = split_packed_frames(batch)
    md = MeshPackedDecoder(mesh, dec.parser.seq)
    assert not md.fits_mesh(frames)
    with pytest.raises(ValueError, match='rows per tile'):
        md.decode(frames)

    # player path: transparent off-mesh fallback, bit-exact
    got = _mesh_via_decoder(es, mesh)
    assert len(got) == len(ref)
    for i, (g, r) in enumerate(zip(got, ref)):
        for a, b in zip(g, r):
            np.testing.assert_array_equal(a, b, err_msg=f'frame {i}')


def test_decode_packed_mesh_grows_halo():
    es, _ = encode_test_stream(64, 128, n_frames=4, seed=23, gop=2,
                               f_code=3)
    ref = _serial(es)
    got = decode_packed_mesh(es, make_mesh(n_gop=2, n_tile=2))
    for i, p in enumerate(got):
        np.testing.assert_array_equal(np.asarray(p.y), ref[i][0],
                                      err_msg=f'frame {i}')


def test_fcode5_wide_mv_wire():
    """f_code=5 allows |mv| up to 255 half-pels -- beyond int8, so the
    fused wire must pick its mv_wide record variant (host-side check)
    and decode bit-exactly vs the serial oracle, single-chip and on a
    mesh whose tiles can hold the 8-MB-row halo."""
    from jsmpeg_tpu.models.mpeg1 import mv_fits_narrow
    es, _ = encode_test_stream(96, 256, n_frames=4, seed=23, gop=2,
                               f_code=5)
    ref = _serial(es)

    # the stream really carries wide vectors
    dec = MPEG1Decoder()
    dec.write(0.0, es)
    batch = dec.parser.parse_batch(32, eof=True)
    assert isinstance(batch, dict) and 'sp_pos' in batch
    assert not mv_fits_narrow(batch['run_mv'])

    dec2 = MPEG1Decoder()
    dec2.write(0.0, es)
    got = [(np.asarray(p.y), np.asarray(p.cr), np.asarray(p.cb))
           for p in dec2.decode_available(eof=True)]
    assert len(got) == len(ref)
    for i, (g, r) in enumerate(zip(got, ref)):
        for a, b in zip(g, r):
            np.testing.assert_array_equal(a, b, err_msg=f'frame {i}')

    # mesh leg: 2 tiles x 8 MB rows hold the grown halo
    mesh = make_mesh(n_gop=4, n_tile=2)
    gotm = _mesh_via_decoder(es, mesh)
    assert len(gotm) == len(ref)
    for i, (g, r) in enumerate(zip(gotm, ref)):
        for a, b in zip(g, r):
            np.testing.assert_array_equal(a, b, err_msg=f'mesh frame {i}')
