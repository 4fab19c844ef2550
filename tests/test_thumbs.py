"""Batched I-frame thumbnail extraction must reproduce exactly the
frames a full serial decode produces at those positions."""

import sys

import numpy as np
import pytest

jax = pytest.importorskip('jax')

from jsmpeg_tpu.host.native import native_available
from jsmpeg_tpu.models.mpeg1 import MPEG1Decoder
from jsmpeg_tpu.testing.gen import encode_test_stream

pytestmark = pytest.mark.skipif(not native_available(),
                                reason='native parser required')


def _full_decode(es):
    dec = MPEG1Decoder()
    dec.write(0.0, es)
    return dec.decode_available(eof=True)


def test_thumbs_match_full_decode():
    from tools.thumbs import extract_iframe_planes
    es, _ = encode_test_stream(96, 64, n_frames=9, seed=41, gop=3)
    full = _full_decode(es)
    seq, thumbs = extract_iframe_planes(es)
    assert len(thumbs) == 3                 # gop=3 -> I at 0, 3, 6
    for i, t in enumerate(thumbs):
        ref = full[3 * i]
        for a, b in zip((t.y, t.cr, t.cb), (ref.y, ref.cr, ref.cb)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=f'thumb {i}')


def test_thumbs_every_and_limit():
    from tools.thumbs import extract_iframe_planes
    es, _ = encode_test_stream(96, 64, n_frames=12, seed=42, gop=2)
    full = _full_decode(es)
    _, thumbs = extract_iframe_planes(es, every=2, limit=2)
    assert len(thumbs) == 2                 # I at 0,2,4,... -> take 0, 4
    for t, ref in zip(thumbs, (full[0], full[4])):
        np.testing.assert_array_equal(np.asarray(t.y), np.asarray(ref.y))


def test_thumbs_cli_writes_png(tmp_path):
    import os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_sinks_png import read_png
    from tools.thumbs import main
    from jsmpeg_tpu.testing.ts_mux import mux_video
    es, chunks = encode_test_stream(96, 64, n_frames=6, seed=43, gop=3)
    v = chunks[:-1]
    v[-1] = v[-1] + chunks[-1]
    ts = tmp_path / 'c.ts'
    ts.write_bytes(mux_video(v, 30.0))
    out = str(tmp_path / 't_%02d.png')
    assert main([str(ts), '-o', out]) == 0
    img = read_png(str(tmp_path / 't_01.png'))
    assert img.shape == (64, 96, 3)
