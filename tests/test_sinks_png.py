"""The stdlib PNG encoder (SURVEY build-plan 7.5 'PNG/y4m dump' sinks)
must produce spec-valid files whose pixels round-trip exactly, and the
frame/poster sinks must select it by extension."""

import struct
import zlib

import numpy as np
import pytest

jax = pytest.importorskip('jax')

from jsmpeg_tpu.sinks import PPMWriter, write_image


def read_png(path):
    """Minimal spec-following reader: chunk walk, CRC check, inflate,
    filter-0 strip.  Independent of the encoder's internals."""
    data = open(path, 'rb').read()
    assert data[:8] == b'\x89PNG\r\n\x1a\n'
    pos, idat, meta = 8, b'', None
    while pos < len(data):
        ln = struct.unpack('>I', data[pos:pos + 4])[0]
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        crc = struct.unpack('>I', data[pos + 8 + ln:pos + 12 + ln])[0]
        assert crc == zlib.crc32(tag + body) & 0xffffffff, tag
        if tag == b'IHDR':
            meta = struct.unpack('>IIBBBBB', body)
        elif tag == b'IDAT':
            idat += body
        pos += 12 + ln
    w, h, depth, color, comp, filt, inter = meta
    assert (depth, color, comp, filt, inter) == (8, 2, 0, 0, 0)
    raw = np.frombuffer(zlib.decompress(idat), np.uint8)
    raw = raw.reshape(h, 1 + w * 3)
    assert (raw[:, 0] == 0).all()          # filter 0 on every scanline
    return raw[:, 1:].reshape(h, w, 3)


def test_png_round_trips_exactly(tmp_path):
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, (33, 47, 3)).astype(np.uint8)
    p = tmp_path / 'x.png'
    write_image(str(p), rgb)
    np.testing.assert_array_equal(read_png(str(p)), rgb)


def test_ppm_path_unchanged(tmp_path):
    rgb = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    p = tmp_path / 'x.ppm'
    write_image(str(p), rgb)
    assert p.read_bytes() == b'P6\n3 2\n255\n' + rgb.tobytes()


def test_frame_writer_selects_png_by_extension(tmp_path):
    w = PPMWriter(str(tmp_path / 'f_%02d.png'))
    w.resize(32, 16)
    y = np.full((16, 32), 128, np.uint8)
    c = np.full((8, 16), 128, np.uint8)
    w.render(jax.numpy.asarray(y), jax.numpy.asarray(c),
             jax.numpy.asarray(c))
    got = read_png(str(tmp_path / 'f_00.png'))
    assert got.shape == (16, 32, 3)
    # grey Y with neutral chroma -> uniform grey RGB
    assert (got == got[0, 0]).all()


def test_poster_png_matches_ppm_pixels(tmp_path):
    from jsmpeg_tpu.player import _PosterTee
    from jsmpeg_tpu.sinks import VideoCollector
    rng = np.random.default_rng(4)
    y = rng.integers(0, 256, (16, 32)).astype(np.uint8)
    cr = rng.integers(0, 256, (8, 16)).astype(np.uint8)
    cb = rng.integers(0, 256, (8, 16)).astype(np.uint8)

    def shoot(path):
        inner = VideoCollector()
        inner.resize(32, 16)
        tee = _PosterTee(inner, path)
        tee.render(jax.numpy.asarray(y), jax.numpy.asarray(cr),
                   jax.numpy.asarray(cb))

    shoot(str(tmp_path / 'p.png'))
    shoot(str(tmp_path / 'p.ppm'))
    png = read_png(str(tmp_path / 'p.png'))
    ppm = np.frombuffer(
        (tmp_path / 'p.ppm').read_bytes().split(b'255\n', 1)[1],
        np.uint8).reshape(16, 32, 3)
    np.testing.assert_array_equal(png, ppm)
