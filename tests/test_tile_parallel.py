"""Tile-parallel (halo-exchange) decode over a CPU mesh must match the
serial scan decode bit-exactly."""

import jax
import numpy as np
import pytest

from jsmpeg_tpu.host.mpeg1_parse import MPEG1Parser
from jsmpeg_tpu.models.mpeg1 import MPEG1Decoder
from jsmpeg_tpu.parallel.mesh import make_mesh
from jsmpeg_tpu.parallel.tiles import decode_tiled, halo_mb_rows
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


def _serial(es):
    dec = MPEG1Decoder({'native': False})
    dec.write(0.0, es)
    return dec.decode_available(eof=True)


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 devices')
def test_tiles_match_serial():
    # 64x128: 8 MB rows over 4 tiles (2 rows/tile >= halo for f_code=2)
    es, _ = encode_test_stream(64, 128, n_frames=8, seed=41, gop=4,
                               f_code=2)
    seq, frames = _parse_all(es)
    mesh = make_mesh(n_gop=2, n_tile=4)
    par = decode_tiled(frames, seq.mb_height, seq.mb_width, mesh, f_code=2)
    ser = _serial(es)
    assert len(par) == len(ser) == 8
    for i, (a, b) in enumerate(zip(par, ser)):
        assert np.array_equal(np.asarray(a.y), np.asarray(b.y)), f'frame {i}'
        assert np.array_equal(np.asarray(a.cr), np.asarray(b.cr)), f'{i} cr'
        assert np.array_equal(np.asarray(a.cb), np.asarray(b.cb)), f'{i} cb'


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 devices')
def test_tiles_non_divisible_rows():
    # 7 MB rows (112px less 10 -> 102) padded to 8 over 2 tiles; gop axis 4
    es, _ = encode_test_stream(80, 102, n_frames=8, seed=43, gop=2,
                               f_code=1)
    seq, frames = _parse_all(es)
    assert seq.mb_height == 7
    mesh = make_mesh(n_gop=4, n_tile=2)
    par = decode_tiled(frames, seq.mb_height, seq.mb_width, mesh, f_code=1)
    ser = _serial(es)
    for i, (a, b) in enumerate(zip(par, ser)):
        assert np.array_equal(np.asarray(a.y), np.asarray(b.y)), f'frame {i}'


def test_halo_sizing():
    assert halo_mb_rows(1) == 1
    assert halo_mb_rows(2) == 2
    assert halo_mb_rows(3) == 3
    assert halo_mb_rows(4) == 5


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 devices')
def test_tiles_levels_wire_match_serial():
    """The levels-wire sharded decode (device-side dequant under
    shard_map) matches the serial scan bit-exactly."""
    from jsmpeg_tpu.parallel.tiles import decode_tiled_levels
    es, _ = encode_test_stream(64, 128, n_frames=8, seed=45, gop=4,
                               f_code=2)
    mesh = make_mesh(n_gop=2, n_tile=4)
    par = decode_tiled_levels(es, mesh, f_code=2)
    ser = _serial(es)
    assert len(par) == len(ser) == 8
    for i, (a, b) in enumerate(zip(par, ser)):
        assert np.array_equal(np.asarray(a.y), np.asarray(b.y)), f'frame {i}'
        assert np.array_equal(np.asarray(a.cr), np.asarray(b.cr)), f'{i} cr'
        assert np.array_equal(np.asarray(a.cb), np.asarray(b.cb)), f'{i} cb'


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 devices')
def test_tiles_levels_wire_custom_matrices():
    from jsmpeg_tpu.parallel.tiles import decode_tiled_levels
    es, _ = encode_test_stream(64, 96, n_frames=6, seed=47, gop=3,
                               f_code=1, custom_matrices=True)
    mesh = make_mesh(n_gop=4, n_tile=2)
    par = decode_tiled_levels(es, mesh, f_code=1)
    ser = _serial(es)
    for i, (a, b) in enumerate(zip(par, ser)):
        assert np.array_equal(np.asarray(a.y), np.asarray(b.y)), f'frame {i}'
