"""MP2 differential tests: exact path must match the oracle bit-for-bit;
the TPU matmul path must match within float tolerance."""

import numpy as np
import pytest

from jsmpeg_tpu.models.mp2 import MP2Decoder
from jsmpeg_tpu import tables as T
from jsmpeg_tpu.testing.mp2_enc import encode_stream
from tests.oracle.ref_mp2 import OracleMP2


def _golden(es):
    return OracleMP2(es).decode_all()


def _run(es, mode):
    dec = MP2Decoder(mode=mode)
    dec.write(0.0, es)
    outs = []
    while True:
        f = dec.decode()
        if f is None:
            break
        outs.append(f)
    return outs


@pytest.mark.parametrize('mode_name,mode', [
    ('stereo', T.MP2_MODE_STEREO),
    ('mono', T.MP2_MODE_MONO),
    ('joint', T.MP2_MODE_JOINT_STEREO),
])
def test_exact_path_bit_exact(mode_name, mode):
    es, _ = encode_stream(4, seed=42, mode=mode)
    golden = _golden(es)
    got = _run(es, 'exact')
    assert len(got) == len(golden) == 4
    for i, ((gl, gr), (ol, orr)) in enumerate(zip(golden, got)):
        assert np.array_equal(gl, ol), f'frame {i} left mismatch'
        assert np.array_equal(gr, orr), f'frame {i} right mismatch'


def test_exact_path_low_bitrate():
    es, _ = encode_stream(3, seed=9, bitrate_index=2, density=0.3)
    golden = _golden(es)
    got = _run(es, 'exact')
    assert len(got) == len(golden) == 3
    for (gl, gr), (ol, orr) in zip(golden, got):
        assert np.array_equal(gl, ol)
        assert np.array_equal(gr, orr)


def test_exact_path_48khz():
    es, _ = encode_stream(3, seed=10, sample_rate_index=1)
    golden = _golden(es)
    got = _run(es, 'exact')
    for (gl, gr), (ol, orr) in zip(golden, got):
        assert np.array_equal(gl, ol)
        assert np.array_equal(gr, orr)


def test_tpu_path_close():
    # sf_range keeps the int32 U accumulator in the linear (non-wrapping)
    # region, like real audio; the float TPU path cannot reproduce the
    # reference's deliberate int32 wraparound on saturated content.
    es, _ = encode_stream(4, seed=21, sf_range=(24, 63))
    golden = _golden(es)
    got = _run(es, 'tpu')
    assert len(got) == 4
    for (gl, gr), (ol, orr) in zip(golden, got):
        np.testing.assert_allclose(ol, gl, atol=3e-5)
        np.testing.assert_allclose(orr, gr, atol=3e-5)


def test_tpu_batch_matches_stepwise():
    es, frames = encode_stream(5, seed=33)
    a = MP2Decoder(mode='tpu')
    a.write(0.0, es)
    batch = a.decode_available()
    b = _run(es, 'tpu')
    assert batch.shape[0] == len(b) == 5
    for i, (bl, br) in enumerate(b):
        np.testing.assert_allclose(batch[i, 0], bl, atol=1e-7)
        np.testing.assert_allclose(batch[i, 1], br, atol=1e-7)
