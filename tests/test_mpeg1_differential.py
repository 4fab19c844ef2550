"""Differential tests: the TPU decode pipeline must match the independent
oracle decoder bit-exactly on every plane of every frame."""

import numpy as np
import pytest

from jsmpeg_tpu.models.mpeg1 import MPEG1Decoder
from jsmpeg_tpu.testing.gen import encode_test_stream
from tests.oracle.ref_mpeg1 import OracleMPEG1


def _compare(es: bytes, use_scan: bool = True):
    golden = OracleMPEG1(es).decode_all()
    dec = MPEG1Decoder()
    dec.write(0.0, es)
    if use_scan:
        outs = dec.decode_available(eof=True) or []
    else:
        outs = []
        while True:
            p = dec.decode(eof=True)
            if p is None:
                break
            outs.append(p)
    assert len(outs) == len(golden), (len(outs), len(golden))
    for i, ((gy, gcr, gcb), p) in enumerate(zip(golden, outs)):
        py, pcr, pcb = np.asarray(p.y), np.asarray(p.cr), np.asarray(p.cb)
        for name, g, o in (('y', gy, py), ('cr', gcr, pcr), ('cb', gcb, pcb)):
            if not np.array_equal(g, o):
                diff = np.argwhere(g.astype(int) != o.astype(int))
                raise AssertionError(
                    f'frame {i} plane {name}: {len(diff)} mismatches, '
                    f'first at {diff[0]}: golden={g[tuple(diff[0])]} '
                    f'got={o[tuple(diff[0])]}')
    return len(outs)


def test_intra_only_bit_exact():
    es, _ = encode_test_stream(96, 64, n_frames=3, seed=1, gop=1)
    assert _compare(es) == 3


def test_ip_gop_bit_exact():
    es, _ = encode_test_stream(96, 64, n_frames=8, seed=2, gop=4)
    assert _compare(es) == 8


def test_ip_fcode1_bit_exact():
    es, _ = encode_test_stream(80, 48, n_frames=6, seed=3, gop=3, f_code=1)
    assert _compare(es) == 6


def test_ip_fcode3_bit_exact():
    es, _ = encode_test_stream(128, 96, n_frames=6, seed=4, gop=6, f_code=3)
    assert _compare(es) == 6


def test_custom_matrices_bit_exact():
    es, _ = encode_test_stream(64, 48, n_frames=5, seed=5, gop=2,
                               custom_matrices=True, qscale=4)
    assert _compare(es) == 5


def test_non_mb_aligned_dims():
    # 100x70 -> coded 112x80 with padding macroblock columns/rows
    es, _ = encode_test_stream(100, 70, n_frames=4, seed=6, gop=2)
    assert _compare(es) == 4


def test_single_frame_path_matches():
    es, _ = encode_test_stream(64, 48, n_frames=5, seed=7, gop=5)
    assert _compare(es, use_scan=False) == 5


def test_full_pel_bit_exact():
    # full_pel_forward=1: MVs transmit in full-pel units, decoder doubles
    # (reference src/mpeg1.js:187-196,414-418)
    es, _ = encode_test_stream(96, 64, n_frames=8, seed=21, gop=4,
                               full_pel=True)
    assert _compare(es) == 8


def test_full_pel_serial_path():
    es, _ = encode_test_stream(80, 48, n_frames=6, seed=22, gop=3,
                               full_pel=True, f_code=3)
    assert _compare(es, use_scan=False) == 6


def test_b_d_stubs_skipped():
    # interleaved B/D pictures: decoder skips them and keeps byte
    # position (reference src/mpeg1.js:182-184)
    es, _ = encode_test_stream(96, 64, n_frames=9, seed=23, gop=3,
                               b_stubs=True)
    assert _compare(es) == 9


def test_b_d_stubs_serial_path():
    es, _ = encode_test_stream(64, 48, n_frames=7, seed=24, gop=7,
                               b_stubs=True)
    assert _compare(es, use_scan=False) == 7


def test_macroblock_stuffing():
    # VLC 34 consumed and ignored before address increments
    # (reference src/mpeg1.js:311-317)
    es, _ = encode_test_stream(96, 64, n_frames=6, seed=25, gop=3,
                               stuffing=True)
    assert _compare(es) == 6


def test_midstream_headers_and_user_data():
    # repeated sequence/GOP headers + user_data between pictures
    es, _ = encode_test_stream(96, 64, n_frames=9, seed=26, gop=3,
                               midstream_headers=True)
    assert _compare(es) == 9


def test_all_edge_paths_combined():
    es, _ = encode_test_stream(112, 80, n_frames=12, seed=27, gop=4,
                               full_pel=True, b_stubs=True, stuffing=True,
                               midstream_headers=True)
    assert _compare(es) == 12


def test_edge_paths_mesh_decode():
    # the packed mesh path sees the same quirky stream bit-exactly
    from jsmpeg_tpu.host.native import native_available
    if not native_available():
        pytest.skip('native parser required')
    from jsmpeg_tpu.parallel.mesh import make_mesh
    from jsmpeg_tpu.parallel.packed import decode_packed_mesh
    es, _ = encode_test_stream(96, 64, n_frames=9, seed=28, gop=3,
                               full_pel=True, b_stubs=True, stuffing=True)
    golden = OracleMPEG1(es).decode_all()
    outs = decode_packed_mesh(es, make_mesh(n_gop=4, n_tile=2))
    assert len(outs) == len(golden)
    for i, ((gy, gcr, gcb), p) in enumerate(zip(golden, outs)):
        np.testing.assert_array_equal(gy, np.asarray(p.y), err_msg=f'f{i}')
        np.testing.assert_array_equal(gcr, np.asarray(p.cr), err_msg=f'f{i}')
        np.testing.assert_array_equal(gcb, np.asarray(p.cb), err_msg=f'f{i}')


def test_edge_paths_python_parser():
    # the pure-Python parser handles the same branches (the native parser
    # is the default; force the fallback)
    es, _ = encode_test_stream(80, 48, n_frames=8, seed=29, gop=4,
                               full_pel=True, b_stubs=True, stuffing=True,
                               midstream_headers=True)
    golden = OracleMPEG1(es).decode_all()
    dec = MPEG1Decoder({'native': False})
    dec.write(0.0, es)
    outs = dec.decode_available(eof=True) or []
    assert len(outs) == len(golden)
    for i, ((gy, gcr, gcb), p) in enumerate(zip(golden, outs)):
        np.testing.assert_array_equal(gy, np.asarray(p.y), err_msg=f'f{i}')
        np.testing.assert_array_equal(gcr, np.asarray(p.cr), err_msg=f'f{i}')
        np.testing.assert_array_equal(gcb, np.asarray(p.cb), err_msg=f'f{i}')


def test_1080p_bit_exact():
    # the reference claims 1080p playback works on desktop
    # (/root/reference/README.md:117); prove decode parity at that size
    es, _ = encode_test_stream(1920, 1080, n_frames=2, seed=51, gop=2)
    assert _compare(es) == 2


def test_high_qscale_saturation():
    # large qscale drives dequant clamp paths (+/-2047/2048)
    es, _ = encode_test_stream(48, 32, n_frames=4, seed=8, gop=2, qscale=31)
    assert _compare(es) == 4


def test_dense_batch_split_bit_exact(monkeypatch):
    """Coefficient-dense batches split into frame groups (small scatter
    variants); the split path must thread the plane carry bit-exactly."""
    from jsmpeg_tpu.models import mpeg1 as m
    monkeypatch.setattr(m, 'SCATTER_SEG', 2048)
    es, _ = encode_test_stream(96, 64, n_frames=8, seed=21, gop=4)
    assert _compare(es) == 8


def test_single_frame_dense_fallback_bit_exact(monkeypatch):
    """decode() with a packed->dense overflow fallback (F=1 arrays) must
    decode, not crash on a leading-axis mismatch (regression)."""
    pytest.importorskip('jsmpeg_tpu.host.native')
    from jsmpeg_tpu.host.native import NativeMPEG1Parser
    monkeypatch.setattr(NativeMPEG1Parser, 'SPARSE_CAP_PER_BLOCK', 1)
    es, _ = encode_test_stream(96, 64, n_frames=3, seed=2, gop=3)
    assert _compare(es, use_scan=False) == 3


def test_tiny_frame_streams():
    """1-macroblock-wide/tall streams encode and decode (regression: the
    generators' motion bounds went negative)."""
    from jsmpeg_tpu.testing.gen import encode_realistic_stream
    for enc in (encode_test_stream, encode_realistic_stream):
        es, _ = enc(16, 16, n_frames=3, seed=5, gop=2)
        assert _compare(es) == 3
