"""The mc_method tuning flag must actually reach every decode path it is
documented to affect (fused wire, sparse/levels wire, serial fallback,
tiled mesh) and stay bit-exact -- and the guarded multi-plane MC entry
must degrade exactly like the single-plane entry when no band is usable."""

import numpy as np
import pytest

jax = pytest.importorskip('jax')
import jax.numpy as jnp  # noqa: E402

from jsmpeg_tpu.host.native import native_available
from jsmpeg_tpu.models.mpeg1 import MPEG1Decoder
from jsmpeg_tpu.testing.gen import encode_test_stream

needs_native = pytest.mark.skipif(not native_available(),
                                  reason='native parser required')


def _frames(es, **options):
    dec = MPEG1Decoder(options)
    dec.write(0.0, es)
    outs = dec.decode_available(eof=True)
    return [(np.asarray(p.y), np.asarray(p.cr), np.asarray(p.cb))
            for p in outs]


@needs_native
def test_mesh_path_honors_mc_fused():
    """decode_packed_mesh(mc_method='fused') must route the tiled fused
    kernel (threaded through MeshPackedDecoder -> decode_gops_tiled_packed
    -> _levels_step) and stay bit-exact vs the default mesh decode."""
    from jsmpeg_tpu.parallel.mesh import make_mesh
    from jsmpeg_tpu.parallel.packed import decode_packed_mesh
    es, _ = encode_test_stream(96, 128, n_frames=6, seed=31, gop=3)
    mesh = make_mesh(n_gop=4, n_tile=2)
    ref = decode_packed_mesh(es, mesh)
    got = decode_packed_mesh(es, mesh, mc_method='fused')
    assert len(got) == len(ref) > 0
    for i, (g, r) in enumerate(zip(got, ref)):
        for a, b in zip(g, r):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=f'frame {i}')


@needs_native
def test_decoder_mc_fused_bit_exact_end_to_end():
    es, _ = encode_test_stream(96, 64, n_frames=8, seed=32, gop=4)
    ref = _frames(es)
    got = _frames(es, mc_method='fused')
    assert len(got) == len(ref) > 0
    for g, r in zip(got, ref):
        for a, b in zip(g, r):
            np.testing.assert_array_equal(a, b)


def test_scan_levels_and_sparse_honor_mc_method():
    """The sparse/levels wire scans take mc_method and stay bit-exact
    ('fused' degrades to the identical one-hot when no band is given)."""
    from jsmpeg_tpu.models.mpeg1 import (decode_scan_levels,
                                         decode_scan_sparse)
    from jsmpeg_tpu.ops.frame import LevelsArrays, Planes
    rng = np.random.default_rng(7)
    mb_h, mb_w, F = 3, 4, 2
    n_mb = mb_h * mb_w
    la = LevelsArrays(
        levels=rng.integers(-40, 40, (F, n_mb, 6, 64)).astype(np.int16),
        qscale=np.full((F, n_mb), 8, np.uint8),
        coded=np.ones((F, n_mb, 6), bool),
        intra=np.ones((F, n_mb), bool),
        written=np.ones((F, n_mb), bool),
        mv_h=np.zeros((F, n_mb), np.int32),
        mv_v=np.zeros((F, n_mb), np.int32),
        valid=np.ones(F, bool))
    iq = jnp.full(64, 16, jnp.int32)
    nq = jnp.full(64, 16, jnp.int32)
    z = lambda h, w: jnp.zeros((h, w), jnp.uint8)
    mk = lambda: Planes(z(mb_h * 16, mb_w * 16), z(mb_h * 8, mb_w * 8),
                        z(mb_h * 8, mb_w * 8))
    outs = {}
    for mc in (None, 'fused', 'fused_pair'):
        _, _, o = decode_scan_levels(mk(), mk(), la, iq, nq, mb_h=mb_h,
                                     mb_w=mb_w, band_halo=16,
                                     mc_method=mc)
        outs[mc] = [np.asarray(x) for x in o]
    for mc in ('fused', 'fused_pair'):
        for a, b in zip(outs[None], outs[mc]):
            np.testing.assert_array_equal(a, b, err_msg=str(mc))
    # sparse wire: empty scatter over the same dense levels
    flat = np.asarray(la.levels, np.int16).reshape(-1)
    nz = np.nonzero(flat)[0].astype(np.int32)
    rest = la._replace(levels=np.zeros(0, np.int16))
    _, _, o = decode_scan_sparse(mk(), mk(), jnp.asarray(nz),
                                 jnp.asarray(flat[nz]), rest, iq, nq,
                                 mb_h=mb_h, mb_w=mb_w, band_halo=16,
                                 mc_method='fused')
    for a, b in zip(outs[None], o):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_motion_compensate_multi_guard_matches_single():
    """With no usable band (or band covering the whole plane) the multi
    entry must fall back per-plane, bit-identical to motion_compensate;
    with a usable band the shared-weight kernel must match too."""
    from jsmpeg_tpu.ops.motion import (motion_compensate,
                                       motion_compensate_multi)
    rng = np.random.default_rng(9)
    mb_h, mb_w, block = 3, 5, 8
    H, W = mb_h * block, mb_w * block
    refs = tuple(jnp.asarray(
        rng.integers(0, 256, (H, W)).astype(np.uint8)) for _ in range(2))
    mv_h = jnp.asarray(rng.integers(-15, 16, mb_h * mb_w).astype(np.int32))
    mv_v = jnp.asarray(rng.integers(-15, 16, mb_h * mb_w).astype(np.int32))
    for band in (None, (8, 8), (64, 8), (0, 0)):
        multi = motion_compensate_multi(refs, mv_h, mv_v, mb_h, mb_w,
                                        block, method='fused',
                                        band_halo=band)
        for r, m in zip(refs, multi):
            single = motion_compensate(r, mv_h, mv_v, mb_h, mb_w, block,
                                       method='fused', band_halo=band)
            np.testing.assert_array_equal(np.asarray(single),
                                          np.asarray(m),
                                          err_msg=f'band={band}')


def test_inline_upload_env_and_auto_default(monkeypatch):
    """inline_upload: env '0'/'false' forces feeder, '1' forces inline,
    ''/'auto'/unset leave the auto policy (None -> inline iff F == 1,
    the round-4-winning latency arm)."""
    for val, want in (('0', False), ('false', False), ('', None),
                      ('auto', None), ('1', True), ('inline', True)):
        monkeypatch.setenv('JSMPEG_TPU_INLINE_H2D', val)
        assert MPEG1Decoder().inline_upload is want, val
    monkeypatch.delenv('JSMPEG_TPU_INLINE_H2D')
    assert MPEG1Decoder().inline_upload is None          # auto
    assert MPEG1Decoder({'inline_upload': True}).inline_upload is True
    assert MPEG1Decoder({'inline_upload': False}).inline_upload is False


@needs_native
def test_prewarm_compiles_and_keeps_decode_exact():
    """prewarm() must compile F=1 variants without touching decoder
    state: a streaming decode after prewarm stays bit-exact, and
    resolution can come from the header or explicit arguments."""
    es, _ = encode_test_stream(96, 64, n_frames=4, seed=33, gop=4)
    ref = _frames(es)

    dec = MPEG1Decoder({'streaming': True})
    assert dec.prewarm() == 0               # no header yet, no args
    # at this small resolution the I and P bucket guesses collapse to
    # one variant; at 720p they stay distinct
    assert len(MPEG1Decoder._prewarm_statics(4, 6)) == 1
    assert len(MPEG1Decoder._prewarm_statics(45, 80)) == 2
    assert dec.prewarm(width=96, height=64) == 1
    dec.write(0.0, es)
    assert dec.prewarm() == 1               # header-derived path
    # the prediction must spell the SAME static tuple the real F=1
    # dispatch derives, or the prewarmed compile is never reused
    from jsmpeg_tpu.host import best_parser
    from jsmpeg_tpu.models.mpeg1 import build_fused_buffer
    p = best_parser()
    p.write(es)
    b = p.parse_batch(1, eof=True)
    _, n_blk, n_runs, mv_wide, n_pairs, n_esc = build_fused_buffer(
        b, 1, 6 * 4)
    assert (n_blk, n_pairs, n_runs) in MPEG1Decoder._prewarm_statics(4, 6)
    assert n_esc is None and mv_wide is False
    outs = []
    while True:
        o = dec.decode()
        if o is None:
            break
        outs.append((np.asarray(o.y), np.asarray(o.cr), np.asarray(o.cb)))
    assert len(outs) == len(ref) > 0
    for g, r in zip(outs, ref):
        for a, b in zip(g, r):
            np.testing.assert_array_equal(a, b)


@needs_native
def test_prewarm_on_connect_fires_once(monkeypatch):
    import time
    es, _ = encode_test_stream(96, 64, n_frames=2, seed=34, gop=2)
    calls = []
    monkeypatch.setattr(MPEG1Decoder, 'prewarm',
                        lambda self, *a, **k: calls.append(1))
    dec = MPEG1Decoder({'streaming': True, 'prewarm': True})
    dec.write(0.0, es[:len(es) // 2])
    deadline = time.monotonic() + 10
    while not calls and time.monotonic() < deadline:
        time.sleep(0.01)           # prewarm runs on its own thread
    assert len(calls) == 1
    dec.write(0.1, es[len(es) // 2:])
    time.sleep(0.1)
    assert len(calls) == 1         # fires once, not per write
    # default stays off
    dec2 = MPEG1Decoder({'streaming': True})
    assert dec2.prewarm_on_connect is False


def test_player_threads_tuning_flags(monkeypatch):
    """Player options (incl. camelCase) must reach the decoder; UNSET
    flags must not shadow the JSMPEG_TPU_* env defaults."""
    from jsmpeg_tpu.player import Player
    p = Player(b'', {'mcMethod': 'fused', 'blockCarry': True,
                     'inlineUpload': False, 'prewarm': True,
                     'wireIds': True})
    v = p.video
    assert (v.mc_method, v.block_carry, v.inline_upload,
            v.prewarm_on_connect, v.wire_ids) == (
        'fused', True, False, True, True)
    monkeypatch.setenv('JSMPEG_TPU_MC', 'fused_pair')
    assert Player(b'', {}).video.mc_method == 'fused_pair'
    monkeypatch.setenv('JSMPEG_TPU_BLOCK_CARRY', '1')
    assert Player(b'', {}).video.block_carry is True
    assert Player(b'', {'blockCarry': False}).video.block_carry is False


def test_wire_ids_auto_policy():
    """wire_ids defaults to 'auto': the one-shot H2D probe turns it on
    for fast links and off for slow ones; explicit values and env
    ('0'/'1'/'auto') win over the probe (round-4 verdict item 9)."""
    import jsmpeg_tpu.models.mpeg1 as m

    saved = dict(m._upload_probe)
    try:
        # fast link class (a serving host with local PCIe H2D)
        m._upload_probe.clear()
        m._upload_probe['mb_s'] = 1000.0
        assert m.auto_wire_ids() is True
        dec = MPEG1Decoder()
        assert dec._wire_ids == 'auto'      # lazy until first read
        assert dec.wire_ids is True

        # slow link class (the tunneled transport, BENCH upload_mb_s ~3-30)
        m._upload_probe['mb_s'] = 30.0
        assert m.auto_wire_ids() is False
        assert MPEG1Decoder().wire_ids is False

        # explicit option and env beat the probe
        assert MPEG1Decoder({'wire_ids': True}).wire_ids is True
        m._upload_probe['mb_s'] = 1000.0
        assert MPEG1Decoder({'wire_ids': False}).wire_ids is False
        import os
        os.environ['JSMPEG_TPU_WIRE_IDS'] = '0'
        try:
            assert MPEG1Decoder().wire_ids is False
        finally:
            del os.environ['JSMPEG_TPU_WIRE_IDS']

        # settable after construction (serving fleets flip per-link)
        dec2 = MPEG1Decoder()
        dec2.wire_ids = 'auto'
        assert dec2.wire_ids is True        # probe says fast
    finally:
        m._upload_probe.clear()
        m._upload_probe.update(saved)


@needs_native
def test_wire_ids_auto_drops_on_oversized_grid():
    """Probe-chosen True quietly drops to False when the joint stacked
    grid's block ids exceed the uint16 wire field (explicit True still
    refuses -- covered by test_multistream)."""
    import jsmpeg_tpu.models.mpeg1 as m
    from jsmpeg_tpu.parallel.streams import MultiStreamDecoder

    saved = dict(m._upload_probe)
    try:
        m._upload_probe.clear()
        m._upload_probe['mb_s'] = 1000.0
        s = 16
        dec = MultiStreamDecoder(s, mode='stacked')
        assert dec.wire_ids is True and dec._wire_ids_auto
        # feed streams whose joint grid overflows: 16 x 96x64 = 16*24 MBs
        # -> fine; use a bigger geometry to overflow 0xFFFE/6 = 10922 MBs
        es, _ = encode_test_stream(1280, 720, n_frames=1, seed=1, gop=1)
        # 16 x 3600 MBs = 57600 > 10922: the stacked guard must demote
        for i in range(s):
            dec.write(i, es)
        outs = dec.decode_all(eof=True)
        assert dec.wire_ids is False        # demoted, not raised
        assert all(len(o) == 1 for o in outs)
    finally:
        m._upload_probe.clear()
        m._upload_probe.update(saved)
