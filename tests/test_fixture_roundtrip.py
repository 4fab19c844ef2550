"""Encoder <-> oracle sanity: the synthetic streams are legal and decode to
roughly the source content (the oracle is later the golden side of the
differential tests, so it must at least be self-consistent with the
fixture encoder)."""

import numpy as np
import pytest

from jsmpeg_tpu.testing.gen import encode_test_stream, make_ycbcr_frame
from tests.oracle.ref_mpeg1 import OracleMPEG1


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def test_intra_stream_decodes_to_source():
    w, h = 96, 64
    es, chunks = encode_test_stream(w, h, n_frames=1, seed=3, qscale=2)
    dec = OracleMPEG1(es)
    frames = dec.decode_all()
    assert len(frames) == 1
    y, cr, cb = frames[0]
    sy, scb, scr = make_ycbcr_frame(w, h, 0, seed=3)
    assert psnr(y[:h, :w], sy) > 30.0
    assert psnr(cb[:h // 2, :w // 2], scb) > 30.0
    assert psnr(cr[:h // 2, :w // 2], scr) > 30.0


def test_ip_stream_decodes():
    w, h = 80, 48
    es, chunks = encode_test_stream(w, h, n_frames=6, seed=7, gop=3)
    dec = OracleMPEG1(es)
    frames = dec.decode_all()
    assert len(frames) == 6
    for y, cr, cb in frames:
        assert y.shape == (48, 80)
        assert cr.shape == (24, 40)


def test_custom_matrices_stream_decodes():
    es, _ = encode_test_stream(48, 32, n_frames=4, seed=11, gop=2,
                               custom_matrices=True, qscale=5, f_code=1)
    frames = OracleMPEG1(es).decode_all()
    assert len(frames) == 4
