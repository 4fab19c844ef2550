"""Wire-v2 round-trip: host emission (build_fused_buffer) vs device
unpack (unpack_fused), including the wide-MV record variant that no
encoded fixture reaches (|mv| > 127 half-pel units needs f_code >= 4)."""

import numpy as np
import pytest

jax = pytest.importorskip('jax')

from jsmpeg_tpu.models.mpeg1 import (build_fused_buffer,
                                     build_fused_buffer_sized,
                                     fused_buffer_len, mv_fits_narrow,
                                     unpack_fused)


def _mk_batch(rng, n, n_mb, wide):
    """Synthetic packed batch: random per-MB (flags, cbp, mv) streams
    RLE'd the way the parser emits them, plus a small pair stream."""
    lo, hi = (-600, 600) if wide else (-128, 128)
    fl = rng.integers(0, 256, n * n_mb).astype(np.uint8)
    cb = rng.integers(0, 64, n * n_mb).astype(np.uint8)
    mv = rng.integers(lo, hi, (n * n_mb, 2)).astype(np.int16)
    # force some runs > 1 so the RLE is non-trivial
    for k in range(0, n * n_mb - 3, 7):
        fl[k + 1:k + 3] = fl[k]
        cb[k + 1:k + 3] = cb[k]
        mv[k + 1:k + 3] = mv[k]
    change = np.ones(n * n_mb, bool)
    change[1:] = ((fl[1:] != fl[:-1]) | (cb[1:] != cb[:-1])
                  | (mv[1:] != mv[:-1]).any(axis=1))
    starts = np.flatnonzero(change)
    lens = np.diff(np.append(starts, n * n_mb))
    # pair stream: 2 pairs, one escaping to the int16 side channel
    sp_pos = np.array([0x80 | 3, 0x80 | 5], np.uint8)
    sp_v8 = np.array([7, -128], np.int8)
    sp_esc = np.array([1234], np.int16)
    return dict(n=n,
                run_len=lens.astype(np.uint16),
                run_flags=fl[starts], run_cbp=cb[starts],
                run_mv=mv[starts],
                sp_pos=sp_pos, sp_v8=sp_v8, sp_esc=sp_esc,
                n_blocks=2), fl, cb, mv


@pytest.mark.parametrize('wide', [False, True])
def test_roundtrip(wide):
    rng = np.random.default_rng(5 + wide)
    n, n_mb, F = 3, 25, 4
    batch, fl, cb, mv = _mk_batch(rng, n, n_mb, wide)
    assert mv_fits_narrow(batch['run_mv']) == (not wide)
    buf, n_blk, n_runs, mv_wide, n_pairs, n_esc = build_fused_buffer(
        batch, F, n_mb)
    assert mv_wide == wide
    assert len(buf) == fused_buffer_len(F, n_mb, n_pairs, n_runs, mv_wide,
                                        n_esc=n_esc)
    valid, gfl, gcb, gmv, sp_pos, sp_val, _ = jax.jit(
        unpack_fused, static_argnames=('n_frames', 'n_mb', 'n_runs',
                                       'mv_wide', 'n_pairs', 'n_esc'))(
        buf, F, n_mb, n_runs, mv_wide, n_pairs=n_pairs, n_esc=n_esc)
    np.testing.assert_array_equal(np.asarray(valid),
                                  np.arange(F) < n)
    np.testing.assert_array_equal(
        np.asarray(gfl).reshape(-1)[:n * n_mb], fl)
    np.testing.assert_array_equal(
        np.asarray(gcb).reshape(-1)[:n * n_mb], cb)
    np.testing.assert_array_equal(
        np.asarray(gmv).reshape(-1, 2)[:n * n_mb], mv)
    # escape side-stream resolved
    sp_val = np.asarray(sp_val)
    assert sp_val[0] == 7 and sp_val[1] == 1234


def test_wide_mesh_cells_share_variant():
    """Mesh cells agree on one (n_pairs, n_runs, mv_wide) triple: a
    narrow cell encoded with mv_wide=True still round-trips."""
    rng = np.random.default_rng(9)
    n, n_mb, F = 2, 10, 2
    batch, fl, cb, mv = _mk_batch(rng, n, n_mb, wide=False)
    n_runs = 64
    buf = build_fused_buffer_sized(batch, F, 4096, n_runs, n_mb,
                                   mv_wide=True)
    _, gfl, gcb, gmv, _, _, _ = jax.jit(
        unpack_fused, static_argnames=('n_frames', 'n_mb', 'n_runs',
                                       'mv_wide'))(
        buf, F, n_mb, n_runs, True)
    np.testing.assert_array_equal(
        np.asarray(gfl).reshape(-1)[:n * n_mb], fl)
    np.testing.assert_array_equal(
        np.asarray(gmv).reshape(-1, 2)[:n * n_mb], mv)


def test_wire_v2_smaller():
    """The bitmap + 4 B records beat the old 8 B/run + u16 lengths."""
    rng = np.random.default_rng(3)
    batch, *_ = _mk_batch(rng, 3, 100, wide=False)
    buf, n_blk, n_runs, mv_wide, _, _ = build_fused_buffer(batch, 4, 100)
    old = 4 + 8 * n_runs + 2 * 4096 + 2 * (4096 // 8)
    assert len(buf) < old


def test_wire_ids_blk_dense():
    """wire_ids round trip: the device-computed dense block ids from the
    shipped [fpb][blk_rel] streams must equal the ordinal-derived ids,
    including an EMPTY frame in the middle (the boundary-encoding trap:
    empty frames stack their start on the next frame's first block)."""
    rng = np.random.default_rng(21)
    n, n_mb, F = 4, 25, 4
    batch, fl, cb, mv = _mk_batch(rng, n, n_mb, wide=False)
    # force frame 1 to be fully uncoded (cbp=0 across its MBs)
    lens = batch['run_len'].astype(np.int64)
    starts = np.cumsum(lens) - lens
    mb_of_run = starts // 1  # run start MB index
    f1 = (mb_of_run >= n_mb) & (mb_of_run < 2 * n_mb)
    batch['run_cbp'] = batch['run_cbp'].copy()
    batch['run_cbp'][f1] = 0
    # runs do not straddle frame boundaries in parser output; our RLE
    # may straddle, so re-split runs at frame edges to keep the
    # invariant before zeroing (simplest: rebuild from per-MB streams)
    cb_mb = np.repeat(batch['run_cbp'], lens)
    fl_mb = np.repeat(batch['run_flags'], lens)
    mv_mb = np.repeat(batch['run_mv'], lens, axis=0)
    cb_mb[n_mb:2 * n_mb] = 0
    change = np.ones(n * n_mb, bool)
    change[1:] = ((fl_mb[1:] != fl_mb[:-1]) | (cb_mb[1:] != cb_mb[:-1])
                  | (mv_mb[1:] != mv_mb[:-1]).any(axis=1))
    st = np.flatnonzero(change)
    batch['run_len'] = np.diff(np.append(st, n * n_mb)).astype(np.uint16)
    batch['run_flags'] = fl_mb[st]
    batch['run_cbp'] = cb_mb[st]
    batch['run_mv'] = mv_mb[st]
    n_coded = int(np.unpackbits(cb_mb & 0x3F).sum())
    batch['n_blocks'] = n_coded
    buf, n_blk, n_runs, mv_wide, n_pairs, n_esc = build_fused_buffer(
        batch, F, n_mb, wire_ids=True)
    out = jax.jit(unpack_fused,
                  static_argnames=('n_frames', 'n_mb', 'n_runs',
                                   'mv_wide', 'ids_blk', 'n_pairs',
                                   'n_esc'))(
        buf, F, n_mb, n_runs, mv_wide, n_blk, n_pairs=n_pairs,
        n_esc=n_esc)
    blk_dense = np.asarray(out[6])
    # expected: ordinal ids over the coded mask, row-major
    coded = ((cb_mb[:, None] >> np.arange(6)) & 1).astype(bool)
    exp = np.flatnonzero(np.concatenate(
        [coded.reshape(-1), np.zeros((F - n) * n_mb * 6, bool)]))
    assert len(exp) == n_coded
    np.testing.assert_array_equal(blk_dense[:n_coded], exp)
    assert (blk_dense[n_coded:] >= F * n_mb * 6).all()


def test_wire_ids_decode_bit_exact():
    """Full decode with {'wire_ids': True} matches the default wire."""
    from jsmpeg_tpu.models.mpeg1 import MPEG1Decoder
    from jsmpeg_tpu.testing.gen import encode_realistic_stream
    es, _ = encode_realistic_stream(96, 128, n_frames=8, seed=17, gop=4)

    def planes(opts):
        d = MPEG1Decoder(opts)
        d.write(0.0, es)
        return [(np.asarray(p.y), np.asarray(p.cr), np.asarray(p.cb))
                for p in d.decode_available(eof=True)]

    ref = planes({})
    got = planes({'wire_ids': True})
    assert len(ref) == len(got) == 8
    for i, (a, b) in enumerate(zip(ref, got)):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y, err_msg=f'frame {i}')


def test_release_mode_multi_batch_order():
    """retain=False across multiple device batches: the deferred-render
    pipeline (render one batch behind dispatch) must deliver every frame
    to the sink in stream order, identical to the retained path."""
    from jsmpeg_tpu.models.mpeg1 import MPEG1Decoder
    from jsmpeg_tpu.sinks import VideoCollector
    from jsmpeg_tpu.testing.gen import encode_realistic_stream
    es, _ = encode_realistic_stream(96, 128, n_frames=40, seed=29, gop=8)

    d1 = MPEG1Decoder()
    d1.write(0.0, es)
    ref = [(np.asarray(p.y), np.asarray(p.cr), np.asarray(p.cb))
           for p in d1.decode_available(eof=True)]

    d2 = MPEG1Decoder()
    sink = VideoCollector()
    d2.connect(sink)
    d2.write(0.0, es)
    outs = d2.decode_available(eof=True, retain=False)
    assert len(outs) == len(ref) == 40
    assert len(sink.frames) == 40
    for i, (got, r) in enumerate(zip(sink.frames, ref)):
        for a, b in zip(got, r):
            np.testing.assert_array_equal(np.asarray(a), b,
                                          err_msg=f'frame {i}')


def test_fine_buckets():
    """Eighth-octave buckets: m*2^k with m in 8..15, >= n, <= 1.125n
    above the floor; sticky reuse bounds jit variants across adjacent
    batches."""
    from jsmpeg_tpu.models.mpeg1 import (_bucket_fine, _pair_bucket_fine,
                                         _sticky_bucket, SCATTER_SEG)
    for n in (1, 100, 4096, 4097, 5000, 65535, 339956, 393216):
        b = _bucket_fine(n)
        assert b >= n
        if n > 4096:
            assert b <= n + (n + 7) // 8    # <=12.5% padding
            k = b.bit_length() - 4
            assert b % (1 << k) == 0 and 8 <= (b >> k) <= 15
    # pair buckets cap at one scatter segment, then whole multiples
    assert _pair_bucket_fine(SCATTER_SEG - 5) <= SCATTER_SEG
    assert _pair_bucket_fine(SCATTER_SEG + 1) == 2 * SCATTER_SEG
    # sticky: a size wandering one boundary down keeps the old bucket
    st = {}
    b1 = _sticky_bucket(st, 'pairs', _bucket_fine(340000))
    b2 = _sticky_bucket(st, 'pairs', _bucket_fine(330000))
    assert b2 == b1
    # a big shrink switches down; growth always switches up
    b3 = _sticky_bucket(st, 'pairs', _bucket_fine(100000))
    assert b3 == _bucket_fine(100000)
    b4 = _sticky_bucket(st, 'pairs', _bucket_fine(400000))
    assert b4 >= 400000


def test_escape_stream_sized_independently():
    """A batch with many escapes round-trips through an escape bucket
    larger than the legacy n_pairs//8 reserve would allow."""
    rng = np.random.default_rng(17)
    n, n_mb, F = 2, 10, 2
    batch, fl, cb, mv = _mk_batch(rng, n, n_mb, wide=False)
    # every pair escapes: n_esc == n_pairs >> n_pairs//8
    k = 64
    batch['sp_pos'] = (0x80 | (np.arange(k) % 60)).astype(np.uint8)
    batch['sp_v8'] = np.full(k, -128, np.int8)
    batch['sp_esc'] = (np.arange(k) + 300).astype(np.int16)
    batch['n_blocks'] = k
    buf, n_blk, n_runs, mv_wide, n_pairs, n_esc = build_fused_buffer(
        batch, F, n_mb)
    assert n_esc >= k
    *_, sp_val, _ = jax.jit(
        unpack_fused, static_argnames=('n_frames', 'n_mb', 'n_runs',
                                       'mv_wide', 'n_pairs', 'n_esc'))(
        buf, F, n_mb, n_runs, mv_wide, n_pairs=n_pairs, n_esc=n_esc)
    np.testing.assert_array_equal(np.asarray(sp_val)[:k],
                                  np.arange(k) + 300)

def test_sticky_buckets_bound_jit_variants():
    """Across many consecutive batches of one stream, the sticky bucket
    dict must keep the (n_pairs, n_esc, n_runs) static triple to at most
    two distinct values per axis (each new value is a full XLA
    recompile on the real device)."""
    from jsmpeg_tpu.models.mpeg1 import MPEG1Decoder, build_fused_buffer
    from jsmpeg_tpu.testing.gen import encode_realistic_stream
    es, _ = encode_realistic_stream(192, 112, n_frames=64, seed=7, gop=8)
    dec = MPEG1Decoder()
    dec.write(0.0, es)
    sticky = {}
    seen = set()
    while True:
        b = dec.parser.parse_batch(8, eof=True)
        if not isinstance(b, dict) or b['n'] == 0:
            break
        _, _, n_runs, _, n_pairs, n_esc = build_fused_buffer(
            b, 8, dec.parser.seq.mb_size, sticky=sticky)
        seen.add((n_pairs, n_esc, n_runs))
        if b['n'] < 8:
            break
    assert 1 <= len(seen) <= 2, seen


def test_fine_bucket_e2e_bit_exact():
    """A batch crossing the 32k-slot fine-bucket threshold (the
    eighth-octave n_pairs static actually engages) decodes bit-exactly
    vs the oracle -- the small differential streams never reach it."""
    from jsmpeg_tpu.models.mpeg1 import (MPEG1Decoder, _bucket,
                                         build_fused_buffer, FINE_MIN)
    from jsmpeg_tpu.testing.gen import encode_test_stream
    from tests.oracle.ref_mpeg1 import OracleMPEG1
    es, _ = encode_test_stream(320, 240, n_frames=6, seed=13, gop=3,
                               qscale=8)
    probe = MPEG1Decoder()
    probe.write(0.0, es)
    b = probe.parser.parse_batch(6, eof=True)
    assert len(b['sp_pos']) > FINE_MIN          # fine path engages
    *_, n_pairs, n_esc = build_fused_buffer(b, 6, probe.parser.seq.mb_size)
    assert n_pairs != _bucket(len(b['sp_pos'])) or n_esc is not None

    dec = MPEG1Decoder()
    dec.write(0.0, es)
    outs = dec.decode_available(eof=True)
    golden = OracleMPEG1(es).decode_all()
    assert len(outs) == len(golden) == 6
    for i, (p, g) in enumerate(zip(outs, golden)):
        np.testing.assert_array_equal(np.asarray(p.y), g[0],
                                      err_msg=f'frame {i} y')
        np.testing.assert_array_equal(np.asarray(p.cr), g[1],
                                      err_msg=f'frame {i} cr')
        np.testing.assert_array_equal(np.asarray(p.cb), g[2],
                                      err_msg=f'frame {i} cb')


def test_p2l_direct_scatter_bit_exact(monkeypatch):
    """The large-grid packed_to_levels formulation (per-pair direct flat
    scatter, round-5: 1080p 190 -> 298 fps) must decode bit-exactly.
    CPU test geometries sit below P2L_DIRECT_MIN_BLOCKS, so force the
    branch by lowering the threshold (trace-time constant: clear jit
    caches around the patch)."""
    import jax

    import jsmpeg_tpu.models.mpeg1 as m
    from jsmpeg_tpu.models.mpeg1 import MPEG1Decoder
    from jsmpeg_tpu.testing.gen import encode_test_stream
    from tests.oracle.ref_mpeg1 import OracleMPEG1

    es, _ = encode_test_stream(96, 64, n_frames=6, seed=21, gop=3)
    golden = OracleMPEG1(es).decode_all()

    monkeypatch.setattr(m, 'P2L_DIRECT_MIN_BLOCKS', 1)
    jax.clear_caches()
    try:
        dec = MPEG1Decoder()
        dec.write(0.0, es)
        outs = dec.decode_available(eof=True)
        assert len(outs) == len(golden) == 6
        for i, (p, g) in enumerate(zip(outs, golden)):
            np.testing.assert_array_equal(np.asarray(p.y), g[0],
                                          err_msg=f'frame {i} y')
            np.testing.assert_array_equal(np.asarray(p.cr), g[1],
                                          err_msg=f'frame {i} cr')
            np.testing.assert_array_equal(np.asarray(p.cb), g[2],
                                          err_msg=f'frame {i} cb')
    finally:
        jax.clear_caches()      # drop traces that baked the low threshold
