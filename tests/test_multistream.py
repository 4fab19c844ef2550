"""Stream-parallel decode (parallel/streams.py): N independent streams
through the fleet round -- round-robin default, stacked-rows joint
dispatch, legacy vmap A/B -- must be bit-exact vs decoding each stream
alone with the serial fused pipeline, including unequal lengths,
multi-batch carries, and demotion/quarantine handoffs."""

import numpy as np
import pytest

from jsmpeg_tpu.models.mpeg1 import MPEG1Decoder
from jsmpeg_tpu.parallel.streams import (MultiStreamDecoder,
                                         decode_streams_offline)
from jsmpeg_tpu.testing.gen import encode_realistic_stream


def _serial(es):
    d = MPEG1Decoder()
    d.write(0.0, es)
    return [(np.asarray(p.y), np.asarray(p.cr), np.asarray(p.cb))
            for p in d.decode_available(eof=True)]


def _check(streams, got):
    for i, es in enumerate(streams):
        ref = _serial(es)
        assert len(got[i]) == len(ref), f'stream {i} frame count'
        for k, (p, r) in enumerate(zip(got[i], ref)):
            np.testing.assert_array_equal(np.asarray(p.y), r[0],
                                          err_msg=f's{i} f{k} y')
            np.testing.assert_array_equal(np.asarray(p.cr), r[1],
                                          err_msg=f's{i} f{k} cr')
            np.testing.assert_array_equal(np.asarray(p.cb), r[2],
                                          err_msg=f's{i} f{k} cb')


def test_three_streams_bit_exact():
    """Three different streams (one short: unequal lengths within the
    fleet round) decode bit-exactly through the default mode."""
    streams = [
        encode_realistic_stream(192, 112, n_frames=10, seed=s, gop=5)[0]
        for s in (1, 2, 3)]
    # make stream 2 shorter than the batch
    streams[2] = encode_realistic_stream(192, 112, n_frames=4, seed=9,
                                         gop=4)[0]
    got = decode_streams_offline(streams, batch_frames=16)
    _check(streams, got)


def test_three_streams_bit_exact_stacked():
    """Same fleet through the stacked-rows joint dispatch (unequal
    valid masks within ONE joint batch)."""
    streams = [
        encode_realistic_stream(192, 112, n_frames=10, seed=s, gop=5)[0]
        for s in (1, 2, 3)]
    streams[2] = encode_realistic_stream(192, 112, n_frames=4, seed=9,
                                         gop=4)[0]
    got = decode_streams_offline(streams, batch_frames=16, mode='stacked')
    _check(streams, got)


def test_multi_batch_carry():
    """Streams longer than one joint batch: carries thread through."""
    streams = [
        encode_realistic_stream(160, 96, n_frames=13, seed=s, gop=4)[0]
        for s in (5, 6)]
    got = decode_streams_offline(streams, batch_frames=5)
    _check(streams, got)


def test_incremental_write_and_eof_tail():
    """Feeding via write() per stream, one stream ending early: late
    batches still decode the longer stream while the finished one rides
    its valid mask."""
    a = encode_realistic_stream(160, 96, n_frames=12, seed=11, gop=6)[0]
    b = encode_realistic_stream(160, 96, n_frames=3, seed=12, gop=3)[0]
    dec = MultiStreamDecoder(2, batch_frames=4)
    dec.write(0, a)
    dec.write(1, b)
    frames = dec.decode_all(eof=True)
    _check([a, b], frames)


@pytest.mark.parametrize('mode', ['vmap', 'roundrobin'])
def test_alternate_modes_bit_exact(mode):
    """The legacy vmapped formulation (kept for A/B) and the round-robin
    per-stream dispatch mode both decode bit-exactly, including an
    unequal-length stream and multi-batch carries."""
    streams = [
        encode_realistic_stream(160, 96, n_frames=9, seed=s, gop=4)[0]
        for s in (71, 72)]
    streams.append(
        encode_realistic_stream(160, 96, n_frames=3, seed=73, gop=3)[0])
    dec = MultiStreamDecoder(3, batch_frames=4, mode=mode)
    for i, es in enumerate(streams):
        dec.write(i, es)
    got = dec.decode_all(eof=True)
    _check(streams, got)


def test_stacked_segment_clamp_is_load_bearing():
    """The stacked formulation's per-segment MV row clamp
    (ops/motion._seg_row_bounds) must engage: an f_code=5 stream's MVs
    reach past its own frame edge, where serial decode clamps at the
    frame edge -- the stacked decode must clamp at the SEGMENT edge
    (same rows), never read the neighboring stream.  Decoding the same
    wide stream beside two different neighbors must give identical
    frames."""
    from jsmpeg_tpu.testing.gen import encode_test_stream
    wide = encode_test_stream(96, 64, n_frames=5, seed=81, gop=5,
                              f_code=5)[0]
    a = encode_realistic_stream(96, 64, n_frames=5, seed=82, gop=5)[0]
    b = encode_test_stream(96, 64, n_frames=5, seed=83, gop=5,
                           qscale=8)[0]
    got_a = decode_streams_offline([wide, a], batch_frames=8,
                                   mode='stacked')
    got_b = decode_streams_offline([b, wide], batch_frames=8,
                                   mode='stacked')
    _check([wide], [got_a[0]])
    _check([wide], [got_b[1]])
    for p, q in zip(got_a[0], got_b[1]):
        np.testing.assert_array_equal(np.asarray(p.y), np.asarray(q.y))


def test_mixed_resolution_rejected():
    a = encode_realistic_stream(160, 96, n_frames=2, seed=1, gop=2)[0]
    b = encode_realistic_stream(192, 112, n_frames=2, seed=1, gop=2)[0]
    dec = MultiStreamDecoder(2, batch_frames=4)
    dec.write(0, a)
    dec.write(1, b)
    with pytest.raises(ValueError, match='one resolution'):
        dec.decode_batch(eof=True)


def test_merge_halo_zero_sentinel():
    """bh == 0 means 'horizontal reach beyond the buckets: full-width
    columns' (ops/motion.band_halo_for) -- merging must preserve the
    sentinel, not take the numeric max."""
    from jsmpeg_tpu.parallel.streams import _merge_halo
    assert _merge_halo([(32, 0), (32, 16)]) == (32, 0)
    assert _merge_halo([(16, 16), (64, 32)]) == (64, 32)
    assert _merge_halo([None, (32, 16)]) is None
    assert _merge_halo([(32, 16)]) == (32, 16)


def test_wide_mv_stream_joint_with_narrow():
    """One f_code=5 stream (|mv| up to 255 half-pel: beyond int8 records
    AND beyond the horizontal band buckets) jointly with a narrow
    stream: the merged dispatch must keep full-width MC and wide
    records, staying bit-exact vs serial decode of each."""
    from jsmpeg_tpu.testing.gen import encode_test_stream
    wide = encode_test_stream(192, 112, n_frames=6, seed=31, gop=3,
                              f_code=5)[0]
    narrow = encode_realistic_stream(192, 112, n_frames=6, seed=32,
                                     gop=3)[0]
    for mode in ('stacked', 'vmap'):
        got = decode_streams_offline([wide, narrow], batch_frames=8,
                                     mode=mode)
        _check([wide, narrow], got)


def test_streams_over_mesh_bit_exact():
    """Serving-fleet path: three streams' GOPs concatenated into the
    gop rows of a 4x2 virtual mesh decode bit-exactly vs serial."""
    import jax
    from jsmpeg_tpu.parallel.mesh import make_mesh
    from jsmpeg_tpu.parallel.streams import decode_streams_mesh
    if len(jax.devices()) < 8:
        pytest.skip('needs the virtual 8-device mesh')
    streams = [
        encode_realistic_stream(192, 112, n_frames=n, seed=s, gop=4)[0]
        for s, n in ((41, 8), (42, 5), (43, 9))]
    got = decode_streams_mesh(streams, make_mesh(n_gop=4, n_tile=2))
    _check(streams, got)


def test_mixed_quant_matrices_rejected():
    from jsmpeg_tpu.testing.gen import encode_test_stream
    a = encode_test_stream(64, 48, n_frames=2, seed=1, gop=2)[0]
    b = encode_test_stream(64, 48, n_frames=2, seed=2, gop=2,
                           custom_matrices=True)[0]
    dec = MultiStreamDecoder(2, batch_frames=4)
    dec.write(0, a)
    dec.write(1, b)
    with pytest.raises(ValueError, match='quant'):
        dec.decode_batch(eof=True)


@pytest.mark.parametrize('flags', [dict(wire_ids=True),
                                   dict(block_carry=True),
                                   dict(wire_ids=True, block_carry=True),
                                   dict(mc_method='fused'),
                                   dict(mc_method='fused_pair'),
                                   dict(mc_method='fused',
                                        block_carry=True)])
def test_tuning_flags_bit_exact(flags):
    """The production tuning flags (wire_ids, block_carry, mc_method)
    change only wire/layout/formulation, never output."""
    streams = [
        encode_realistic_stream(160, 96, n_frames=7, seed=s, gop=4)[0]
        for s in (21, 22)]
    dec = MultiStreamDecoder(2, batch_frames=4, **flags)
    for i, es in enumerate(streams):
        dec.write(i, es)
    got = dec.decode_all(eof=True)
    _check(streams, got)


def test_mesh_wide_mv_falls_back_off_mesh():
    """MV reach beyond the tile halo: decode_streams_mesh falls back to
    the vmapped joint decode instead of raising (the Player's off-mesh
    policy), staying bit-exact."""
    import jax
    from jsmpeg_tpu.parallel.mesh import make_mesh
    from jsmpeg_tpu.parallel.streams import decode_streams_mesh
    from jsmpeg_tpu.testing.gen import encode_test_stream
    if len(jax.devices()) < 8:
        pytest.skip('needs the virtual 8-device mesh')
    wide = encode_test_stream(96, 64, n_frames=4, seed=35, gop=2,
                              f_code=5)[0]
    other = encode_realistic_stream(96, 64, n_frames=4, seed=36, gop=2)[0]
    got = decode_streams_mesh([wide, other], make_mesh(n_gop=2, n_tile=4))
    _check([wide, other], got)


def test_mesh_mid_gop_join_falls_back():
    """A stream whose first picture is P would motion-compensate against
    the previous stream's frames once concatenated -- the job routes to
    the vmapped path (per-stream carries), matching serial decode."""
    import jax
    from jsmpeg_tpu.parallel.mesh import make_mesh
    from jsmpeg_tpu.parallel.streams import decode_streams_mesh
    if len(jax.devices()) < 8:
        pytest.skip('needs the virtual 8-device mesh')
    es = encode_realistic_stream(96, 64, n_frames=6, seed=37, gop=3)[0]
    # cut the second stream to start at its first P picture: drop
    # everything through the first picture start code after the I
    import re
    starts = [m.start() for m in re.finditer(b'\x00\x00\x01\x00', es)]
    assert len(starts) >= 2
    headless = es[:starts[0]] + es[starts[1]:]   # headers + P-first
    ok = encode_realistic_stream(96, 64, n_frames=3, seed=38, gop=3)[0]
    got = decode_streams_mesh([ok, headless], make_mesh(n_gop=2, n_tile=1))
    _check([ok, headless], got)


def test_parser_buffers_evict_consumed():
    """Long-running serving must not grow with consumed bitstream: after
    each joint batch the parsers' byte buffers shrink back to the unread
    tail."""
    es = encode_realistic_stream(160, 96, n_frames=24, seed=51, gop=4)[0]
    dec = MultiStreamDecoder(2, batch_frames=4, streaming=True)
    high_water = 0
    for chunk_at in range(0, len(es), 4096):
        for i in range(2):
            dec.write(i, es[chunk_at:chunk_at + 4096])
        dec.decode_batch()
        for p in dec.parsers:
            high_water = max(high_water,
                             p.bits.byte_length - (p.bits.index >> 3) + 1)
            # the retained buffer is bounded by the unread tail (+ the
            # chunk just written), not by total bytes ever written
            assert p.bits.byte_length <= high_water + 4096, \
                'buffer grew with consumed bytes'
    dec.decode_batch(eof=True)


def test_quarantine_isolates_bad_feed():
    """Serving posture: a mismatched feed is quarantined with a reason
    and the good feed keeps decoding bit-exactly."""
    good = encode_realistic_stream(160, 96, n_frames=6, seed=55, gop=3)[0]
    bad = encode_realistic_stream(192, 112, n_frames=4, seed=56, gop=2)[0]
    dec = MultiStreamDecoder(2, batch_frames=4, quarantine=True)
    dec.write(0, good)
    dec.write(1, bad)
    frames = dec.decode_all(eof=True)
    assert dec.dead[0] is None
    assert dec.dead[1] and 'resolution' in dec.dead[1]
    assert len(frames[1]) == 0
    _check([good], [frames[0]])


@pytest.mark.parametrize('mode', ['roundrobin', 'stacked'])
def test_demotion_keeps_quirk_stream_decoding(mode):
    """A stream hitting the exactness fallback (escape-coded zero) is
    demoted to its own serial-capable decoder mid-session (the scan
    carry hands off per mode: joint-plane slice for stacked, per-stream
    pair for roundrobin): both streams deliver ALL frames bit-exactly
    and neither is marked dead."""
    import sys
    sys.path.insert(0, 'tests')
    from test_quirk_leak import _escape_zero_stream
    from tests.oracle.ref_mpeg1 import OracleMPEG1

    quirk = _escape_zero_stream(48, 32)
    # a same-geometry clean stream (the quirk stream is 48x32 qscale=8)
    from jsmpeg_tpu.testing.gen import encode_test_stream
    clean = encode_test_stream(48, 32, n_frames=4, seed=61, gop=2,
                               qscale=8)[0]
    dec = MultiStreamDecoder(2, batch_frames=4, quarantine=True,
                             mode=mode)
    dec.write(0, clean)
    dec.write(1, quirk)
    frames = dec.decode_all(eof=True)
    assert dec.dead == [None, None]
    assert 1 in dec._demoted
    ref_clean = OracleMPEG1(clean).decode_all()
    ref_quirk = OracleMPEG1(quirk).decode_all()
    assert len(frames[0]) == len(ref_clean)
    assert len(frames[1]) == len(ref_quirk) == 2
    for got, ref in ((frames[0], ref_clean), (frames[1], ref_quirk)):
        for p, r in zip(got, ref):
            np.testing.assert_array_equal(np.asarray(p.y), r[0])
            np.testing.assert_array_equal(np.asarray(p.cr), r[1])
            np.testing.assert_array_equal(np.asarray(p.cb), r[2])


def test_single_quirk_stream_not_lost():
    """A demotion in a round where NO other stream has frames must not
    terminate decode_all early (the demoted stream's frames arrive on
    the next round)."""
    import sys
    sys.path.insert(0, 'tests')
    from test_quirk_leak import _escape_zero_stream
    from tests.oracle.ref_mpeg1 import OracleMPEG1

    quirk = _escape_zero_stream(48, 32)
    got = decode_streams_offline([quirk], batch_frames=4)
    ref = OracleMPEG1(quirk).decode_all()
    assert len(got[0]) == len(ref) == 2
    for p, r in zip(got[0], ref):
        np.testing.assert_array_equal(np.asarray(p.y), r[0])


def test_demoted_path_no_per_frame_slices(monkeypatch):
    """The demoted-stream consumption must ride whole-batch device
    slices (FrameSeq.stacked_planes / stacked _demote output), never
    per-frame FrameSeq indexing -- on a tunneled transport a per-frame
    slice costs 3 RPCs per FRAME (round-3 verdict weak #6)."""
    import sys
    sys.path.insert(0, 'tests')
    from test_quirk_leak import _escape_zero_stream
    from tests.oracle.ref_mpeg1 import OracleMPEG1

    from jsmpeg_tpu.models.mpeg1 import FrameSeq

    def boom(self, i):
        raise AssertionError('per-frame slice on the demoted path')

    monkeypatch.setattr(FrameSeq, '__getitem__', boom)
    quirk = _escape_zero_stream(48, 32)
    dec = MultiStreamDecoder(1, batch_frames=4, quarantine=True)
    dec.write(0, quirk)
    stacked = []
    while True:
        outs = dec.decode_batch(eof=True)
        if outs is None:
            break
        st = outs[0]
        for f in range(st.y.shape[0]):
            stacked.append(np.asarray(st.y[f]))
    ref = OracleMPEG1(quirk).decode_all()
    assert len(stacked) == len(ref) == 2
    for got, r in zip(stacked, ref):
        np.testing.assert_array_equal(got, r[0])


def test_demoted_then_dead_purged():
    """A feed that demotes first and later proves geometry-mismatched is
    purged: no wrong-geometry frames leak into the fleet output."""
    import sys
    sys.path.insert(0, 'tests')
    from test_quirk_leak import _escape_zero_stream

    fleet = encode_realistic_stream(160, 96, n_frames=4, seed=65, gop=2)[0]
    rogue = _escape_zero_stream(48, 32)      # demotes AND mismatches
    dec = MultiStreamDecoder(2, batch_frames=4, quarantine=True)
    dec.write(0, rogue)       # rogue header arrives first...
    dec.decode_batch()        # ...and demotes immediately
    dec.write(1, fleet)
    frames = dec.decode_all(eof=True)
    # whichever geometry won the contract, no stream may emit frames of
    # the OTHER geometry
    shapes = {tuple(np.asarray(p.y).shape)
              for fs in frames for p in fs}
    assert len(shapes) <= 1, shapes


def test_stacked_wire_ids_bit_exact():
    """stacked + wire_ids: the joint grid fits the uint16 id field at
    this geometry, so the combination must stay bit-exact (the ids are
    relative to the JOINT n_mb)."""
    streams = [
        encode_realistic_stream(192, 112, n_frames=6, seed=s, gop=3)[0]
        for s in (21, 22)]
    got = decode_streams_offline(streams, batch_frames=8, mode='stacked',
                                 wire_ids=True)
    _check(streams, got)


def test_stacked_wire_ids_overflow_refused():
    """stacked + wire_ids with a joint grid whose block ids exceed the
    uint16 wire field (n * n_mb * 6 > 0xFFFE) must raise up front, not
    silently wrap ids into the 0xFFFF padding sentinel (advisor r4)."""
    n = 131                                  # 131 * 84 MB * 6 > 0xFFFE
    dec = MultiStreamDecoder(n, batch_frames=4, wire_ids=True,
                             mode='stacked')
    es = encode_realistic_stream(192, 112, n_frames=4, seed=31, gop=2)[0]
    dec.write(0, es)
    with pytest.raises(ValueError, match='wire_ids'):
        dec.decode_all(eof=True)
