"""The one-hot-matmul motion-compensation formulation (MXU path on
accelerators) must equal the 4-tap gather formulation bit-for-bit,
including frame-edge clamps, all half-pel parities, and out-of-range
motion vectors -- for both the whole-frame and the halo'd-slab (tiled)
variants."""

import numpy as np
import pytest

jax = pytest.importorskip('jax')
import jax.numpy as jnp  # noqa: E402

from jsmpeg_tpu.ops.motion import _mc_gather, _mc_onehot  # noqa: E402
from jsmpeg_tpu.parallel.tiles import (_mc_tiled_gather,  # noqa: E402
                                       _mc_tiled_onehot)


@pytest.mark.parametrize('seed', range(4))
def test_frame_mc_onehot_equals_gather(seed):
    rng = np.random.default_rng(seed)
    mb_h = int(rng.integers(2, 6))
    mb_w = int(rng.integers(2, 7))
    block = int(rng.choice([8, 16]))
    H, W = mb_h * block, mb_w * block
    ref = rng.integers(0, 256, (H, W)).astype(np.uint8)
    # out-of-range MVs included: every clamp path
    mv_h = rng.integers(-2 * W, 2 * W, mb_h * mb_w).astype(np.int32)
    mv_v = rng.integers(-2 * H, 2 * H, mb_h * mb_w).astype(np.int32)
    a = np.asarray(_mc_gather(jnp.asarray(ref), jnp.asarray(mv_h),
                              jnp.asarray(mv_v), mb_h, mb_w, block))
    b = np.asarray(_mc_onehot(jnp.asarray(ref), jnp.asarray(mv_h),
                              jnp.asarray(mv_v), mb_h, mb_w, block))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize('seed', range(6))
def test_frame_mc_band_equals_gather(seed):
    """The band-limited one-hot (the device fast path) equals the gather
    formulation whenever the band covers the data's MV reach -- which the
    pipeline guarantees by deriving the halo from the batch's actual MVs
    (band_halo_for)."""
    from jsmpeg_tpu.ops.motion import _mc_onehot_band, band_halo_for
    rng = np.random.default_rng(200 + seed)
    mb_h = int(rng.integers(3, 7))
    mb_w = int(rng.integers(2, 7))
    block = int(rng.choice([8, 16]))
    H, W = mb_h * block, mb_w * block
    ref = rng.integers(0, 256, (H, W)).astype(np.uint8)
    reach_v = int(rng.choice([7, 29, 61]))    # -> halo buckets 8/16/32...
    reach_h = int(rng.choice([7, 29, 61]))
    mv_h = rng.integers(-reach_h, reach_h + 1, mb_h * mb_w).astype(np.int32)
    mv_v = rng.integers(-reach_v, reach_v + 1, mb_h * mb_w).astype(np.int32)
    halo_v = band_halo_for(int(np.abs(mv_v).max()), block=block)
    halo_h = band_halo_for(int(np.abs(mv_h).max()), block=block)
    assert halo_v and halo_h
    a = np.asarray(_mc_gather(jnp.asarray(ref), jnp.asarray(mv_h),
                              jnp.asarray(mv_v), mb_h, mb_w, block))
    b = np.asarray(_mc_onehot_band(jnp.asarray(ref), jnp.asarray(mv_h),
                                   jnp.asarray(mv_v), mb_h, mb_w, block,
                                   halo_v, halo_h))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize('seed', range(3))
def test_frame_mc_band_fullw_equals_gather(seed):
    """band_h=0 keeps the full-width column one-hot (used when only the
    vertical reach is bounded)."""
    from jsmpeg_tpu.ops.motion import _mc_onehot_band, band_halo_for
    rng = np.random.default_rng(300 + seed)
    mb_h = int(rng.integers(3, 7))
    mb_w = int(rng.integers(2, 7))
    block = int(rng.choice([8, 16]))
    H, W = mb_h * block, mb_w * block
    ref = rng.integers(0, 256, (H, W)).astype(np.uint8)
    mv_h = rng.integers(-2 * W, 2 * W, mb_h * mb_w).astype(np.int32)
    mv_v = rng.integers(-29, 30, mb_h * mb_w).astype(np.int32)
    halo_v = band_halo_for(int(np.abs(mv_v).max()), block=block)
    a = np.asarray(_mc_gather(jnp.asarray(ref), jnp.asarray(mv_h),
                              jnp.asarray(mv_v), mb_h, mb_w, block))
    b = np.asarray(_mc_onehot_band(jnp.asarray(ref), jnp.asarray(mv_h),
                                   jnp.asarray(mv_v), mb_h, mb_w, block,
                                   halo_v, 0))
    np.testing.assert_array_equal(a, b)


def test_grouped_band_wide_frame():
    """mb_w > G exercises real multi-group windows (the small random
    frames above all fit one group)."""
    from jsmpeg_tpu.ops.motion import _mc_onehot_band
    rng = np.random.default_rng(9)
    mb_h, mb_w, block = 3, 21, 16     # 21 MBs -> 3 groups of 8 (padded)
    H, W = mb_h * block, mb_w * block
    ref = rng.integers(0, 256, (H, W)).astype(np.uint8)
    mv_h = rng.integers(-63, 64, mb_h * mb_w).astype(np.int32)
    mv_v = rng.integers(-31, 32, mb_h * mb_w).astype(np.int32)
    a = np.asarray(_mc_gather(jnp.asarray(ref), jnp.asarray(mv_h),
                              jnp.asarray(mv_v), mb_h, mb_w, block))
    b = np.asarray(_mc_onehot_band(jnp.asarray(ref), jnp.asarray(mv_h),
                                   jnp.asarray(mv_v), mb_h, mb_w, block,
                                   32, 32))
    np.testing.assert_array_equal(a, b)


def test_band_halo_chroma_bound():
    """decode_frame_planes derives the chroma halo from the luma one;
    the worst negative-MV floor-division case must stay in band."""
    from jsmpeg_tpu.ops.motion import (_mc_onehot_band, band_halo_for,
                                       chroma_mv)
    rng = np.random.default_rng(7)
    mb_h, mb_w, block = 4, 4, 8
    H, W = mb_h * block, mb_w * block
    ref = rng.integers(0, 256, (H, W)).astype(np.uint8)
    for mv_extreme in (-62, 62, -61, 61, -30, 29):
        halo_y = band_halo_for(abs(mv_extreme))
        halo_c = halo_y // 2 + 8
        mv = np.full(mb_h * mb_w, mv_extreme, np.int32)
        cm = np.asarray(chroma_mv(jnp.asarray(mv)))
        a = np.asarray(_mc_gather(jnp.asarray(ref), jnp.asarray(cm),
                                  jnp.asarray(cm), mb_h, mb_w, block))
        b = np.asarray(_mc_onehot_band(jnp.asarray(ref), jnp.asarray(cm),
                                       jnp.asarray(cm), mb_h, mb_w, block,
                                       halo_c, halo_c))
        np.testing.assert_array_equal(a, b, err_msg=str(mv_extreme))


@pytest.mark.parametrize('seed', range(4))
def test_tiled_mc_onehot_equals_gather(seed):
    rng = np.random.default_rng(100 + seed)
    mb_h_local = int(rng.integers(2, 5))
    mb_w = int(rng.integers(2, 6))
    block = int(rng.choice([8, 16]))
    halo_mb = 2
    halo = halo_mb * block
    n_tiles = 3
    total_rows = mb_h_local * block * n_tiles
    tile = int(rng.integers(0, n_tiles))
    row0 = jnp.int32(tile * mb_h_local * block)
    W = mb_w * block
    ext = rng.integers(0, 256,
                       (halo + mb_h_local * block + halo, W)).astype(np.uint8)
    # both axes bounded by the f_code reach the halo was sized for (the
    # banded tiled MC requires it, like the halo exchange itself)
    reach = halo // 2
    mv_h = rng.integers(-2 * reach, 2 * reach + 1,
                        mb_h_local * mb_w).astype(np.int32)
    mv_v = rng.integers(-2 * reach, 2 * reach + 1,
                        mb_h_local * mb_w).astype(np.int32)
    args = (jnp.asarray(ext), jnp.asarray(mv_h), jnp.asarray(mv_v),
            mb_h_local, mb_w, block, halo, row0, total_rows)
    a = np.asarray(_mc_tiled_gather(*args))
    b = np.asarray(_mc_tiled_onehot(*args))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize('seed', range(6))
def test_frame_mc_fused_band_equals_gather(seed):
    """The fused half-pel formulation (taps folded into bf16 weight
    matrices, ops/motion.py:_mc_fused_band) must equal the gather
    formulation bit-for-bit under the same band guarantee."""
    from jsmpeg_tpu.ops.motion import _mc_fused_band, band_halo_for
    rng = np.random.default_rng(400 + seed)
    mb_h = int(rng.integers(3, 7))
    mb_w = int(rng.integers(2, 7))
    block = int(rng.choice([8, 16]))
    H, W = mb_h * block, mb_w * block
    ref = rng.integers(0, 256, (H, W)).astype(np.uint8)
    reach_v = int(rng.choice([7, 29, 61]))
    reach_h = int(rng.choice([7, 29, 61]))
    mv_h = rng.integers(-reach_h, reach_h + 1, mb_h * mb_w).astype(np.int32)
    mv_v = rng.integers(-reach_v, reach_v + 1, mb_h * mb_w).astype(np.int32)
    halo_v = band_halo_for(int(np.abs(mv_v).max()), block=block)
    halo_h = band_halo_for(int(np.abs(mv_h).max()), block=block)
    assert halo_v and halo_h
    a = np.asarray(_mc_gather(jnp.asarray(ref), jnp.asarray(mv_h),
                              jnp.asarray(mv_v), mb_h, mb_w, block))
    for band_h in (halo_h, 0):       # grouped and full-width-column forms
        b = np.asarray(_mc_fused_band(jnp.asarray(ref), jnp.asarray(mv_h),
                                      jnp.asarray(mv_v), mb_h, mb_w, block,
                                      halo_v, band_h))
        np.testing.assert_array_equal(a, b, err_msg=f'band_h={band_h}')


def test_fused_grouped_wide_frame_and_block_layout():
    """Multi-group geometry (mb_w > G) plus the block-layout output and
    the multi-plane (chroma pair) form of the fused variant."""
    from jsmpeg_tpu.ops.motion import (_mc_fused_band,
                                       _mc_fused_grouped_multi)
    rng = np.random.default_rng(11)
    mb_h, mb_w, block = 3, 21, 16     # 21 MBs -> 3 groups of 8 (padded)
    H, W = mb_h * block, mb_w * block
    ref = rng.integers(0, 256, (H, W)).astype(np.uint8)
    ref2 = rng.integers(0, 256, (H, W)).astype(np.uint8)
    mv_h = rng.integers(-63, 64, mb_h * mb_w).astype(np.int32)
    mv_v = rng.integers(-31, 32, mb_h * mb_w).astype(np.int32)
    a = np.asarray(_mc_gather(jnp.asarray(ref), jnp.asarray(mv_h),
                              jnp.asarray(mv_v), mb_h, mb_w, block))
    b = np.asarray(_mc_fused_band(jnp.asarray(ref), jnp.asarray(mv_h),
                                  jnp.asarray(mv_v), mb_h, mb_w, block,
                                  32, 32))
    np.testing.assert_array_equal(a, b)
    # block layout == plane layout re-tiled
    blk = np.asarray(_mc_fused_band(jnp.asarray(ref), jnp.asarray(mv_h),
                                    jnp.asarray(mv_v), mb_h, mb_w, block,
                                    32, 32, layout='block'))
    np.testing.assert_array_equal(
        a, blk.transpose(0, 2, 1, 3).reshape(H, W))
    # chroma-pair form: both planes ride the shared weight matrices
    pair = _mc_fused_grouped_multi(
        (jnp.asarray(ref), jnp.asarray(ref2)), jnp.asarray(mv_h),
        jnp.asarray(mv_v), mb_h, mb_w, block, 32, 32)
    np.testing.assert_array_equal(a, np.asarray(pair[0]))
    a2 = np.asarray(_mc_gather(jnp.asarray(ref2), jnp.asarray(mv_h),
                               jnp.asarray(mv_v), mb_h, mb_w, block))
    np.testing.assert_array_equal(a2, np.asarray(pair[1]))


def test_fused_edge_clamp_corners():
    """Extreme MVs drive both half-pel taps into the same clamped edge
    index: the two weight-1 hits must add to weight 2 (the a==b case)."""
    from jsmpeg_tpu.ops.motion import _mc_fused_band
    rng = np.random.default_rng(12)
    mb_h, mb_w, block = 4, 4, 16
    H, W = mb_h * block, mb_w * block
    ref = rng.integers(0, 256, (H, W)).astype(np.uint8)
    for mv in (-2 * W - 1, -2 * W, 2 * W - 1, 2 * W, 127, -127):
        mv_h = np.full(mb_h * mb_w, mv, np.int32)
        mv_v = np.full(mb_h * mb_w, -mv, np.int32)
        a = np.asarray(_mc_gather(jnp.asarray(ref), jnp.asarray(mv_h),
                                  jnp.asarray(mv_v), mb_h, mb_w, block))
        b = np.asarray(_mc_fused_band(
            jnp.asarray(ref), jnp.asarray(mv_h), jnp.asarray(mv_v),
            mb_h, mb_w, block, 8 * block, 8 * block))
        np.testing.assert_array_equal(a, b, err_msg=str(mv))


@pytest.mark.parametrize('seed', range(4))
def test_tiled_mc_fused_equals_gather(seed):
    """The fused-weight tiled MC (parallel/tiles.py:_mc_tiled_fused) must
    equal the tiled gather bit-for-bit over the halo'd slab, including
    the global-row frame-edge clamp composed into band indices."""
    from jsmpeg_tpu.parallel.tiles import _mc_tiled_fused
    rng = np.random.default_rng(500 + seed)
    mb_h_local = int(rng.integers(2, 5))
    mb_w = int(rng.integers(2, 6))
    block = int(rng.choice([8, 16]))
    halo_mb = 2
    halo = halo_mb * block
    n_tiles = 3
    total_rows = mb_h_local * block * n_tiles
    tile = int(rng.integers(0, n_tiles))
    row0 = jnp.int32(tile * mb_h_local * block)
    W = mb_w * block
    ext = rng.integers(0, 256,
                       (halo + mb_h_local * block + halo, W)).astype(np.uint8)
    reach = halo // 2
    mv_h = rng.integers(-2 * reach, 2 * reach + 1,
                        mb_h_local * mb_w).astype(np.int32)
    mv_v = rng.integers(-2 * reach, 2 * reach + 1,
                        mb_h_local * mb_w).astype(np.int32)
    args = (jnp.asarray(ext), jnp.asarray(mv_h), jnp.asarray(mv_v),
            mb_h_local, mb_w, block, halo, row0, total_rows)
    a = np.asarray(_mc_tiled_gather(*args))
    b = np.asarray(_mc_tiled_fused(*args))
    np.testing.assert_array_equal(a, b)
    blk = np.asarray(_mc_tiled_fused(*args, layout='block'))
    np.testing.assert_array_equal(
        a, blk.transpose(0, 2, 1, 3).reshape(mb_h_local * block, W))


@pytest.mark.parametrize('method', ['gather', 'onehot', 'fused'])
@pytest.mark.parametrize('halo', [None, 16, (32, 32)])
def test_segment_clamp_equals_independent(method, halo):
    """n_seg > 1 (the stream-stacked serving formulation) must equal
    motion-compensating each segment ALONE -- the per-segment row clamp
    (ops/motion._seg_row_bounds) is each stream's own frame-edge clamp.
    MVs deliberately reach far outside the frame (the corrupt-stream
    case), so without the clamp every method would read the neighboring
    segment's pixels."""
    from jsmpeg_tpu.ops.motion import motion_compensate
    rng = np.random.default_rng(7)
    mb_h_seg, mb_w, block = 4, 6, 16
    H, W = mb_h_seg * block, mb_w * block
    segs = [rng.integers(0, 256, (H, W)).astype(np.uint8)
            for _ in range(2)]
    joint = jnp.asarray(np.concatenate(segs))
    n_mb = mb_h_seg * mb_w
    mvh = jnp.asarray(rng.integers(-200, 200, 2 * n_mb), jnp.int32)
    mvv = jnp.asarray(rng.integers(-200, 200, 2 * n_mb), jnp.int32)
    got = np.asarray(motion_compensate(joint, mvh, mvv, 2 * mb_h_seg,
                                       mb_w, block, method=method,
                                       band_halo=halo, n_seg=2))
    ref = np.concatenate([
        np.asarray(motion_compensate(jnp.asarray(segs[i]),
                                     mvh[i * n_mb:(i + 1) * n_mb],
                                     mvv[i * n_mb:(i + 1) * n_mb],
                                     mb_h_seg, mb_w, block, method=method,
                                     band_halo=halo))
        for i in range(2)])
    np.testing.assert_array_equal(got, ref)
    # and the clamp is load-bearing: without it the MVs read across the
    # segment boundary
    un = np.asarray(motion_compensate(joint, mvh, mvv, 2 * mb_h_seg,
                                      mb_w, block, method=method,
                                      band_halo=halo, n_seg=1))
    assert not np.array_equal(un, ref)
