"""Block-space scan carry (`block_carry`) is bit-exact vs the default.

The variant carries the reference planes through the lax.scan in MB-block
layout ([mb_h, mb_w, blk, blk]) and converts at the batch boundaries
(models/mpeg1.py decode_scan_packed); outputs and final carry must be
byte-identical to the plane-layout scan.
"""

import numpy as np
import pytest

from jsmpeg_tpu.models.mpeg1 import MPEG1Decoder
from jsmpeg_tpu.testing.gen import encode_realistic_stream


def _decode_all(es, **opts):
    dec = MPEG1Decoder(opts)
    dec.write(0.0, es)
    outs = dec.decode_available(eof=True)
    frames = [(np.asarray(p.y), np.asarray(p.cr), np.asarray(p.cb))
              for p in outs]
    carry = [np.asarray(x) for x in (*dec._cur, *dec._fwd)]
    return frames, carry


@pytest.mark.parametrize('frames,gop', [(8, 4), (33, 8)])
def test_block_carry_bit_exact(frames, gop):
    es, _ = encode_realistic_stream(192, 112, n_frames=frames, seed=11,
                                    gop=gop)
    base_f, base_c = _decode_all(es)
    bc_f, bc_c = _decode_all(es, block_carry=True)
    assert len(base_f) == len(bc_f) == frames
    for a, b in zip(base_f, bc_f):
        for pa, pb in zip(a, b):
            np.testing.assert_array_equal(pa, pb)
    for ca, cb in zip(base_c, bc_c):
        np.testing.assert_array_equal(ca, cb)


def test_block_carry_streaming_single_frame():
    """The per-frame streaming dispatch (n_frames=1) hits the same flag."""
    es, _ = encode_realistic_stream(160, 96, n_frames=5, seed=3, gop=3)
    a = MPEG1Decoder({'streaming': True})
    b = MPEG1Decoder({'streaming': True, 'block_carry': True})
    a.write(0.0, es)
    b.write(0.0, es)
    while True:
        fa = a.decode(eof=True)
        fb = b.decode(eof=True)
        assert (fa is None) == (fb is None)
        if fa is None:
            break
        np.testing.assert_array_equal(np.asarray(fa.y), np.asarray(fb.y))
        np.testing.assert_array_equal(np.asarray(fa.cr), np.asarray(fb.cr))
        np.testing.assert_array_equal(np.asarray(fa.cb), np.asarray(fb.cb))


@pytest.mark.parametrize('frames,gop', [(8, 4), (17, 8)])
def test_fused_mc_bit_exact(frames, gop):
    """mc_method='fused' (half-pel taps folded into bf16 weight matmuls,
    ops/motion.py:_mc_fused_band) must be byte-identical through the full
    packed pipeline, alone and combined with block_carry."""
    es, _ = encode_realistic_stream(192, 112, n_frames=frames, seed=13,
                                    gop=gop)
    base_f, base_c = _decode_all(es)
    for opts in ({'mc_method': 'fused'},
                 {'mc_method': 'fused', 'block_carry': True},
                 {'mc_method': 'fused_pair'}):
        got_f, got_c = _decode_all(es, **opts)
        assert len(base_f) == len(got_f) == frames
        for a, b in zip(base_f, got_f):
            for pa, pb in zip(a, b):
                np.testing.assert_array_equal(pa, pb, err_msg=str(opts))
        for ca, cb in zip(base_c, got_c):
            np.testing.assert_array_equal(ca, cb, err_msg=str(opts))
