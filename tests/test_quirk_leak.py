"""Exactness fallbacks of the batch (raw-levels) pipeline.

Note: the reference's DC-only fast path can only trigger with the single
coefficient at scan position 0 (n==1 implies ZIG_ZAG[0]), so its partial
scratch clear never actually leaks -- the detection in the parsers is an
invariant check.  What CAN break the raw-levels contract is an
escape-coded zero level: the reference dequantizes it to +1 (oddify of 0),
which device dequant cannot reproduce from a zero level.  The batch path
must detect it and fall back to the exact serial path.
"""

import numpy as np
import pytest

from jsmpeg_tpu import tables as T
from jsmpeg_tpu.models.mpeg1 import MPEG1Decoder
from jsmpeg_tpu.testing.gen import _intra_levels, _pad_plane, make_ycbcr_frame
from jsmpeg_tpu.testing.mpeg1_enc import MB, MPEG1Encoder
from tests.oracle.ref_mpeg1 import OracleMPEG1


class EscapeZeroEncoder(MPEG1Encoder):
    """Emits an escape-coded ZERO level (double-byte form) at zig-zag
    position `zero_pos` of the first coded non-intra block."""

    def __init__(self, *a, zero_pos=2, **kw):
        super().__init__(*a, **kw)
        self.zero_pos = zero_pos
        self._armed = False

    def _encode_nonintra_block(self, levels):
        if self._armed:
            self._armed = False
            w = self.w
            w.write_bits(T.DCT_COEFF_ESCAPE)
            w.write(self.zero_pos, 6)      # run (first coeff: run==position)
            w.write(0, 8)                  # escape marker byte
            w.write(0, 8)                  # level == 0
            # then a normal trailing coefficient and EOB
            lv = np.asarray(levels, dtype=np.int64)
            self._encode_ac(lv, start=self.zero_pos + 1, first_coeff=False)
            w.write_bits('10')
            return
        super()._encode_nonintra_block(levels)


def _escape_zero_stream(w=48, h=32):
    enc = EscapeZeroEncoder(w, h, qscale=8, f_code=1, zero_pos=2)
    mb_w, mb_h = enc.mb_w, enc.mb_h
    cw, ch = mb_w * 16, mb_h * 16
    y, cb, cr = make_ycbcr_frame(w, h, 0, seed=0)
    y = _pad_plane(y, ch, cw)
    cb = _pad_plane(cb, ch >> 1, cw >> 1)
    cr = _pad_plane(cr, ch >> 1, cw >> 1)

    enc.sequence_header()
    mbs = [MB('intra', levels=_intra_levels(y, cb, cr, r, c, 8, enc.intra_q))
           for r in range(mb_h) for c in range(mb_w)]
    enc.encode_picture(T.PIC_I, mbs)

    trailing = np.zeros(64, dtype=np.int64)
    trailing[10] = 7
    zeros = np.zeros(64, dtype=np.int64)
    mbs = []
    for i in range(mb_h * mb_w):
        if i == 0:
            enc._armed = True
            mbs.append(MB('mc_coded', mv=(0, 0),
                          levels=[trailing] + [zeros.copy()] * 5))
        else:
            mbs.append(MB('mc', mv=(0, 0)))
    enc.encode_picture(T.PIC_P, mbs)
    enc.sequence_end()
    return enc.getvalue()


def _check_bit_exact(es, options=None):
    golden = OracleMPEG1(es).decode_all()
    dec = MPEG1Decoder(options)
    dec.write(0.0, es)
    outs = dec.decode_available(eof=True)
    assert len(outs) == len(golden)
    for i, ((gy, gcr, gcb), p) in enumerate(zip(golden, outs)):
        assert np.array_equal(gy, np.asarray(p.y)), f'frame {i} y'
        assert np.array_equal(gcr, np.asarray(p.cr)), f'frame {i} cr'
        assert np.array_equal(gcb, np.asarray(p.cb)), f'frame {i} cb'
    return dec


def test_escape_zero_oracle_dequantizes_to_plus_one():
    # sanity: the oracle really produces a nonzero coefficient from a zero
    # level (oddify), so this stream distinguishes the two dequant paths
    es = _escape_zero_stream()
    golden = OracleMPEG1(es).decode_all()
    f0, f1 = golden[0], golden[1]
    assert not np.array_equal(f0[0][:16, :16], f1[0][:16, :16])


def test_escape_zero_batch_falls_back_bit_exact():
    _check_bit_exact(_escape_zero_stream())


def test_escape_zero_python_parser_bit_exact():
    _check_bit_exact(_escape_zero_stream(), {'native': False})
