"""Half-pel forward motion compensation over whole frames.

The reference compensates one macroblock at a time with four hand-unrolled
half-pel cases (/root/reference/src/mpeg1.js:459-687).  On TPU we do the
whole frame in one shot: per-MB (block+1)x(block+1) source windows, the
four taps as static window shifts, and ONE universal rounding formula

    pred = (A + B + C + D + 2) >> 2,   B/C/D offset by (odd_h, odd_v)

which is bit-exact for all four parities:
  - odd_h = odd_v = 1: the reference's (a+b+c+d+2)>>2        (identical)
  - one odd:           (2(a+b)+2)>>2 == (a+b+1)>>1           (exact identity)
  - none:              (4a+2)>>2 == a                        (exact identity)

Two window-extraction formulations, chosen at trace time:
  - 'onehot' (device default): two one-hot matmuls ride the MXU.  XLA
    lowers an arbitrary 2D gather to ~5 ns/element on TPU (~28 ms per
    720p frame, measured -- the whole pipeline's bottleneck); the matmul
    formulation is EXACT (pixels 0..255 and one-hot rows are exact in
    bfloat16; the MXU accumulates in float32, and each dot picks exactly
    one pixel) and runs at MXU speed.
  - 'gather' (CPU default): the straightforward 4-tap gather (a one-hot
    matmul on a 1-core CPU host would be absurdly slow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pixel_mv(mv: jnp.ndarray, mb_h: int, mb_w: int, block: int):
    """Broadcast per-MB values [n_mb] -> per-pixel [mb_h*block, mb_w*block]."""
    grid = mv.reshape(mb_h, mb_w)
    return jnp.repeat(jnp.repeat(grid, block, axis=0), block, axis=1)


def _seg_row_bounds(mb_h: int, n_seg: int, block: int):
    """Per-MB-row vertical clamp bounds in ABSOLUTE plane rows when the
    plane is `n_seg` independent segments stacked along rows (the
    stream-stacked serving formulation, parallel/streams.py): MB row a of
    segment s may only source rows [s*Hs, (s+1)*Hs).  Clamping to the
    segment edge IS the reference's frame-edge row clamp applied per
    stream -- bit-exact vs decoding each stream alone.  Returns (lo, hi)
    int32 [mb_h, 1, 1]."""
    assert mb_h % n_seg == 0
    hs = (mb_h // n_seg) * block
    seg = jnp.arange(mb_h, dtype=jnp.int32) // (mb_h // n_seg)
    lo = (seg * hs)[:, None, None]
    return lo, lo + (hs - 1)


def _mc_gather(ref: jnp.ndarray, mv_h: jnp.ndarray, mv_v: jnp.ndarray,
               mb_h: int, mb_w: int, block: int,
               layout: str = 'plane', n_seg: int = 1) -> jnp.ndarray:
    H, W = ref.shape
    mvh = _pixel_mv(mv_h, mb_h, mb_w, block)
    mvv = _pixel_mv(mv_v, mb_h, mb_w, block)

    iy = jnp.arange(H, dtype=jnp.int32)[:, None]
    ix = jnp.arange(W, dtype=jnp.int32)[None, :]
    sy = iy + jnp.right_shift(mvv, 1)
    sx = ix + jnp.right_shift(mvh, 1)
    oy = mvv & 1
    ox = mvh & 1

    if n_seg > 1:
        hs = H // n_seg
        ylo = (iy // hs) * hs           # per-output-row segment bounds
        yhi = ylo + (hs - 1)
    else:
        ylo, yhi = 0, H - 1

    flat = ref.reshape(-1).astype(jnp.int32)

    def g(y, x):
        y = jnp.clip(y, ylo, yhi)
        x = jnp.clip(x, 0, W - 1)
        return jnp.take(flat, y * W + x, axis=0)

    a = g(sy, sx)
    b = g(sy, sx + ox)
    c = g(sy + oy, sx)
    d = g(sy + oy, sx + ox)
    pred = jnp.right_shift(a + b + c + d + 2, 2)
    if layout == 'block':
        return pred.reshape(mb_h, block, mb_w, block).transpose(0, 2, 1, 3)
    return pred


def combine_taps(win: jnp.ndarray, oy: jnp.ndarray, ox: jnp.ndarray,
                 block: int, layout: str = 'plane') -> jnp.ndarray:
    """(block+1)^2 source windows -> half-pel-averaged block predictions.

    win: int32 [mb_h, mb_w, block+1, block+1]; oy/ox: bool [mb_h, mb_w]
    half-pel parity per MB.  The four taps are static window shifts;
    returns int32 [mb_h*block, mb_w*block] (layout='plane') or
    [mb_h, mb_w, block, block] (layout='block' -- the natural output
    order, no relayout; the block-space frame step consumes this)."""
    mb_h, mb_w = win.shape[:2]
    a = win[:, :, :block, :block]
    oy4 = oy[:, :, None, None]
    ox4 = ox[:, :, None, None]
    b = jnp.where(ox4, win[:, :, :block, 1:], a)
    c = jnp.where(oy4, win[:, :, 1:, :block], a)
    d = jnp.where(oy4, jnp.where(ox4, win[:, :, 1:, 1:],
                                 win[:, :, 1:, :block]),
                  jnp.where(ox4, win[:, :, :block, 1:], a))
    pred = jnp.right_shift(a + b + c + d + 2, 2)
    if layout == 'block':
        return pred
    return pred.transpose(0, 2, 1, 3).reshape(mb_h * block, mb_w * block)


def _mc_onehot(ref: jnp.ndarray, mv_h: jnp.ndarray, mv_v: jnp.ndarray,
               mb_h: int, mb_w: int, block: int,
               layout: str = 'plane', n_seg: int = 1) -> jnp.ndarray:
    H, W = ref.shape
    B1 = block + 1
    vy = jnp.right_shift(mv_v, 1).reshape(mb_h, mb_w)
    vx = jnp.right_shift(mv_h, 1).reshape(mb_h, mb_w)
    oy = (mv_v & 1).reshape(mb_h, mb_w).astype(bool)
    ox = (mv_h & 1).reshape(mb_h, mb_w).astype(bool)

    base_r = (jnp.arange(mb_h, dtype=jnp.int32) * block)[:, None, None]
    base_c = (jnp.arange(mb_w, dtype=jnp.int32) * block)[None, :, None]
    taps = jnp.arange(B1, dtype=jnp.int32)[None, None, :]
    # per-(MB, tap) source coordinates, clamped exactly like the gather
    # path clamps each tap (window row r == sy + r_offset); with n_seg
    # stacked segments the row clamp lands on the SEGMENT edge
    rlo, rhi = (_seg_row_bounds(mb_h, n_seg, block) if n_seg > 1
                else (0, H - 1))
    rows = jnp.clip(base_r + vy[:, :, None] + taps, rlo, rhi)
    cols = jnp.clip(base_c + vx[:, :, None] + taps, 0, W - 1)

    refb = (ref.astype(jnp.int16) - 128).astype(jnp.int8)
    oh_r = (rows[..., None] ==
            jnp.arange(H, dtype=jnp.int32)).astype(jnp.int8)
    # [mb_h, mb_w, B1, W]: pick the B1 source rows of every MB (MXU;
    # int8 x int8 -> int32 with pixels biased by -128 -- exact, each dot
    # selects exactly one value)
    win_r = jnp.einsum('abrh,hw->abrw', oh_r, refb,
                       preferred_element_type=jnp.int32)
    oh_c = (cols[..., None] ==
            jnp.arange(W, dtype=jnp.int32)).astype(jnp.int8)
    # [mb_h, mb_w, B1, B1]: pick the B1 source columns (batched MXU)
    win = jnp.einsum('abrw,abcw->abrc', win_r.astype(jnp.int8), oh_c,
                     preferred_element_type=jnp.int32)
    return combine_taps(win + 128, oy, ox, block, layout)


def _seg_band_bounds(mb_h: int, n_seg: int, block: int, band_v: int,
                     band_rows: int):
    """`_seg_row_bounds` translated into BAND coordinates (band row j of
    MB row a is absolute row a*block + j - band_v).  Returns (lo, hi)
    int32 [mb_h, 1, 1] clamp bounds for band-limited row selection."""
    lo_abs, hi_abs = _seg_row_bounds(mb_h, n_seg, block)
    shift = ((jnp.arange(mb_h, dtype=jnp.int32) * block)[:, None, None]
             - band_v)
    lo = jnp.clip(lo_abs - shift, 0, band_rows - 1)
    hi = jnp.clip(hi_abs - shift, 0, band_rows - 1)
    return lo, hi


def _mc_onehot_band(ref: jnp.ndarray, mv_h: jnp.ndarray, mv_v: jnp.ndarray,
                    mb_h: int, mb_w: int, block: int,
                    band_v: int, band_h: int = 0,
                    layout: str = 'plane', n_seg: int = 1) -> jnp.ndarray:
    """Band-limited one-hot MC: every MB row's sources live within
    `band_v` rows of its origin (callers derive the band from the batch's
    actual MVs, so the bound always holds for the data decoded).  The
    band rides edge-replicated padding, which IS the frame-edge row
    clamp; columns contract first so the big matmul keeps an MXU-shaped
    [band, W] x [W, mb_w*B1] per MB row.  With a horizontal bound
    (band_h > 0) the grouped-columns variant runs instead: ~25% faster
    (measured, slope method).  A fully per-MB 2D band was measured
    SLOWER -- it shatters the contraction into per-MB 48x48 matmuls.

    Integer path: pixels ride as (p - 128) int8, one-hots as int8, and
    both contractions run int8 x int8 -> int32 on the MXU -- exact (each
    dot picks exactly one value) and half the operand bytes of bfloat16.
    """
    if band_h:
        return _mc_onehot_band_grouped(ref, mv_h, mv_v, mb_h, mb_w, block,
                                       band_v, band_h, layout, n_seg)
    H, W = ref.shape
    B1 = block + 1
    assert band_v % block == 0
    K = band_v // block
    nwin = 2 * K + 1
    band_rows = nwin * block

    vy = jnp.right_shift(mv_v, 1).reshape(mb_h, mb_w)
    vx = jnp.right_shift(mv_h, 1).reshape(mb_h, mb_w)
    oy = (mv_v & 1).reshape(mb_h, mb_w).astype(bool)
    ox = (mv_h & 1).reshape(mb_h, mb_w).astype(bool)

    # padded[i] == ref[clip(i - band_v, 0, H-1)] -> band[r, j] ==
    # ref[clip(r*block + j - band_v, 0, H-1)]: row clamp by construction
    padded = jnp.concatenate([
        jnp.repeat(ref[:1], band_v, axis=0), ref,
        jnp.repeat(ref[-1:], band_v, axis=0)])
    padded = (padded.astype(jnp.int16) - 128).astype(jnp.int8)
    band = jnp.stack(
        [padded[k * block:k * block + mb_h * block].reshape(mb_h, block, W)
         for k in range(nwin)], axis=1).reshape(mb_h, band_rows, W)

    taps = jnp.arange(B1, dtype=jnp.int32)[None, None, :]
    base_c = (jnp.arange(mb_w, dtype=jnp.int32) * block)[None, :, None]
    rlo, rhi = (_seg_band_bounds(mb_h, n_seg, block, band_v, band_rows)
                if n_seg > 1 else (0, band_rows - 1))
    rows = jnp.clip(vy[:, :, None] + taps + band_v, rlo, rhi)
    cols = jnp.clip(base_c + vx[:, :, None] + taps, 0, W - 1)

    oh_c = (cols[..., None] ==
            jnp.arange(W, dtype=jnp.int32)).astype(jnp.int8)
    # columns first: [mb_h, mb_w, band_rows, B1], values in [-128, 127]
    win_c = jnp.einsum('ahw,abcw->abhc', band, oh_c,
                       preferred_element_type=jnp.int32)
    oh_r = (rows[..., None] ==
            jnp.arange(band_rows, dtype=jnp.int32)).astype(jnp.int8)
    win = jnp.einsum('abrh,abhc->abrc', oh_r, win_c.astype(jnp.int8),
                     preferred_element_type=jnp.int32)
    return combine_taps(win + 128, oy, ox, block, layout)


def _mc_onehot_band_grouped(ref: jnp.ndarray, mv_h: jnp.ndarray,
                            mv_v: jnp.ndarray, mb_h: int, mb_w: int,
                            block: int, band_v: int, band_h: int,
                            layout: str = 'plane',
                            n_seg: int = 1) -> jnp.ndarray:
    return _mc_grouped_multi((ref,), mv_h, mv_v, mb_h, mb_w, block,
                             band_v, band_h, layout, n_seg)[0]


def _grouped_band_setup(refs, mv_h: jnp.ndarray, mv_v: jnp.ndarray,
                        mb_h: int, mb_w: int, block: int,
                        band_v: int, band_h: int, dtype):
    """Shared scaffolding of the grouped-column band variants (onehot and
    fused): MBs group G per 128-pixel column chunk so the column
    selection spans only the group's source window (G*block +
    2*(band_h + block) columns) instead of the full frame width.
    Edge-replicated padding in both axes IS the frame-edge clamp
    (padded[i, j] == ref[clip(i - band_v, 0, H-1), clip(j - marg,
    0, W-1)]); mb_w pads up to a multiple of G with zero-MV dummy MBs
    whose outputs are sliced away by the caller.

    `refs` planes (same shape, shared motion vectors -- the two chroma
    planes) concatenate their group windows along the group axis so the
    selection matrices are built once and every plane rides the same
    contractions.  Returns (gband [mb_h, P*n_grp, band_rows, span] in
    `dtype`, vy, vx, oy, ox padded MV grids, and the geometry tuple
    (band_rows, G, n_grp, mb_w_pad, marg, span))."""
    H, W = refs[0].shape
    assert band_v % block == 0
    nwin = 2 * (band_v // block) + 1
    band_rows = nwin * block
    G = max(1, 128 // block)
    n_grp = -(-mb_w // G)
    mb_w_pad = n_grp * G
    marg = band_h + block
    span = G * block + 2 * marg
    Wp = mb_w_pad * block + 2 * marg

    def padg(grid, fill=0):
        g = grid.reshape(mb_h, mb_w)
        if mb_w_pad == mb_w:
            return g
        return jnp.pad(g, ((0, 0), (0, mb_w_pad - mb_w)),
                       constant_values=fill)

    vy = padg(jnp.right_shift(mv_v, 1))
    vx = padg(jnp.right_shift(mv_h, 1))
    oy = padg(mv_v & 1).astype(bool)
    ox = padg(mv_h & 1).astype(bool)

    def one_gband(ref):
        padded = jnp.concatenate([
            jnp.repeat(ref[:1], band_v, axis=0), ref,
            jnp.repeat(ref[-1:], band_v, axis=0)])
        padded = jnp.concatenate([
            jnp.repeat(padded[:, :1], marg, axis=1), padded,
            jnp.repeat(padded[:, -1:], Wp - W - marg, axis=1)], axis=1)
        padded = (padded.astype(jnp.int16) - 128).astype(jnp.int8) \
            .astype(dtype)
        band = jnp.stack(
            [padded[k * block:k * block + mb_h * block]
             .reshape(mb_h, block, Wp) for k in range(nwin)],
            axis=1).reshape(mb_h, band_rows, Wp)
        return jnp.stack(
            [band[:, :, g * G * block:g * G * block + span]
             for g in range(n_grp)], axis=1)  # [mb_h, n_grp, rows, span]

    gband = jnp.concatenate([one_gband(r) for r in refs], axis=1)
    return gband, vy, vx, oy, ox, (band_rows, G, n_grp, mb_w_pad, marg,
                                   span)


def _mc_grouped_multi(refs, mv_h: jnp.ndarray,
                      mv_v: jnp.ndarray, mb_h: int, mb_w: int,
                      block: int, band_v: int, band_h: int,
                      layout: str = 'plane', n_seg: int = 1):
    """Row-band + grouped-column band one-hot MC (`_grouped_band_setup`
    geometry): ~10x smaller one-hot materialization than the full-width
    band while the per-group matmul stays MXU-shaped ([band_rows, span]
    x [span, G*B1], span ~350 at 720p).  Returns one prediction per
    ref, in [-128, 127]-biased int8 x int8 -> int32 exact arithmetic."""
    P = len(refs)
    B1 = block + 1
    gband, vy, vx, oy, ox, \
        (band_rows, G, n_grp, mb_w_pad, marg, span) = _grouped_band_setup(
            refs, mv_h, mv_v, mb_h, mb_w, block, band_v, band_h, jnp.int8)

    taps = jnp.arange(B1, dtype=jnp.int32)[None, None, :]
    rlo, rhi = (_seg_band_bounds(mb_h, n_seg, block, band_v, band_rows)
                if n_seg > 1 else (0, band_rows - 1))
    rows = jnp.clip(vy[:, :, None] + taps + band_v, rlo, rhi)
    base_l = ((jnp.arange(mb_w_pad, dtype=jnp.int32) % G)
              * block)[None, :, None]
    cols = jnp.clip(base_l + vx[:, :, None] + taps + marg, 0, span - 1)
    colsg = cols.reshape(mb_h, n_grp, G, B1)
    if P > 1:
        colsg = jnp.concatenate([colsg] * P, axis=1)

    oh_c = (colsg[..., None] ==
            jnp.arange(span, dtype=jnp.int32)).astype(jnp.int8)
    win_c = jnp.einsum('aghw,agbcw->agbhc', gband, oh_c,
                       preferred_element_type=jnp.int32)
    win_c = win_c.reshape(mb_h, P, mb_w_pad, band_rows, B1)
    oh_r = (rows[..., None] ==
            jnp.arange(band_rows, dtype=jnp.int32)).astype(jnp.int8)
    win = jnp.einsum('abrh,apbhc->apbrc', oh_r, win_c.astype(jnp.int8),
                     preferred_element_type=jnp.int32)
    win = win[:, :, :mb_w]
    return tuple(combine_taps(win[:, p] + 128, oy[:, :mb_w],
                              ox[:, :mb_w], block, layout)
                 for p in range(P))


def _fused_tap_weights_pair(idx0: jnp.ndarray, idx1: jnp.ndarray,
                            odd: jnp.ndarray, upper: int) -> jnp.ndarray:
    """Two-tap half-pel weights as a bfloat16 selection matrix.

    idx0/idx1: int32 [..., block] tap source indices (callers apply
    their own clamp geometry first; a final clip to [0, upper) is kept
    as a guard); odd: bool [...] half-pel parity.  Returns
    [..., block, upper] with weight 2 at idx0 when the axis is full-pel,
    else weight 1 at each of idx0 and idx1.  The per-axis total weight
    is always 2, so the row and column matrices compose to a total
    weight of 4 and ONE rounding formula covers all four parities
    (module docstring).  When both taps clamp to the same edge index the
    two weight-1 hits add to 2 -- exactly the a==b case of the
    reference's (a+b+1)>>1."""
    ar = jnp.arange(upper, dtype=jnp.int32)
    w0 = (jnp.clip(idx0, 0, upper - 1)[..., None] == ar)
    w1 = (jnp.clip(idx1, 0, upper - 1)[..., None] == ar)
    odd_f = odd[..., None, None].astype(jnp.bfloat16)
    return (w0.astype(jnp.bfloat16) * (2 - odd_f)
            + w1.astype(jnp.bfloat16) * odd_f)


def _fused_tap_weights(idx: jnp.ndarray, odd: jnp.ndarray,
                       upper: int) -> jnp.ndarray:
    """`_fused_tap_weights_pair` with the standard adjacent taps
    (idx, idx + 1), both clamped to [0, upper)."""
    return _fused_tap_weights_pair(idx, idx + 1, odd, upper)


def _mc_fused_band(ref: jnp.ndarray, mv_h: jnp.ndarray, mv_v: jnp.ndarray,
                   mb_h: int, mb_w: int, block: int,
                   band_v: int, band_h: int = 0,
                   layout: str = 'plane', n_seg: int = 1) -> jnp.ndarray:
    """Band-limited MC with the half-pel taps FOLDED INTO the one-hot
    weights: column weights {2,1} and row weights {2,1} over (p - 128)
    bfloat16 band values, so the two matmuls directly produce the
    4-weighted tap sum and `combine_taps` (plus its int32 (B1)^2 window
    materialization) disappears.  Output columns/rows are `block`, not
    block+1, shrinking both contractions.

    Exactness: band values are integers in [-128, 127] (exact bf16);
    the column pass yields 2a' or a'+b' -- integers in [-256, 254], ALL
    exactly representable in bfloat16 (|int| <= 256 needs <= 8
    significand bits); the row pass accumulates in float32 where every
    product (|x| <= 512) and 2-term sum (|x| <= 1020) is exact.  The
    uniform total weight 4 makes `(res + 2 + 4*128) >> 2` reproduce the
    reference rounding for every parity: (a+b+c+d+2)>>2, (2(a+b)+2)>>2
    == (a+b+1)>>1, and (4a+2)>>2 == a (/root/reference/src/mpeg1.js:
    459-687 semantics, same identity as the module docstring)."""
    if band_h:
        return _mc_fused_grouped_multi((ref,), mv_h, mv_v, mb_h, mb_w,
                                       block, band_v, band_h, layout,
                                       n_seg)[0]
    H, W = ref.shape
    assert band_v % block == 0
    nwin = 2 * (band_v // block) + 1
    band_rows = nwin * block

    vy = jnp.right_shift(mv_v, 1).reshape(mb_h, mb_w)
    vx = jnp.right_shift(mv_h, 1).reshape(mb_h, mb_w)
    oy = (mv_v & 1).reshape(mb_h, mb_w).astype(bool)
    ox = (mv_h & 1).reshape(mb_h, mb_w).astype(bool)

    padded = jnp.concatenate([
        jnp.repeat(ref[:1], band_v, axis=0), ref,
        jnp.repeat(ref[-1:], band_v, axis=0)])
    padded = (padded.astype(jnp.int16) - 128).astype(jnp.int8) \
        .astype(jnp.bfloat16)
    band = jnp.stack(
        [padded[k * block:k * block + mb_h * block].reshape(mb_h, block, W)
         for k in range(nwin)], axis=1).reshape(mb_h, band_rows, W)

    taps = jnp.arange(block, dtype=jnp.int32)[None, None, :]
    base_c = (jnp.arange(mb_w, dtype=jnp.int32) * block)[None, :, None]
    w_c = _fused_tap_weights(base_c + vx[:, :, None] + taps, ox, W)
    ridx = vy[:, :, None] + taps + band_v
    if n_seg > 1:
        rlo, rhi = _seg_band_bounds(mb_h, n_seg, block, band_v, band_rows)
        w_r = _fused_tap_weights_pair(jnp.clip(ridx, rlo, rhi),
                                      jnp.clip(ridx + 1, rlo, rhi),
                                      oy, band_rows)
    else:
        w_r = _fused_tap_weights(ridx, oy, band_rows)

    win_c = jnp.einsum('ahw,abcw->abhc', band, w_c,
                       preferred_element_type=jnp.bfloat16)
    res = jnp.einsum('abrh,abhc->abrc', w_r, win_c,
                     preferred_element_type=jnp.float32)
    pred = jnp.right_shift(res.astype(jnp.int32) + (2 + 4 * 128), 2)
    if layout == 'block':
        return pred
    return pred.transpose(0, 2, 1, 3).reshape(mb_h * block, mb_w * block)


def _mc_fused_grouped_multi(refs, mv_h: jnp.ndarray, mv_v: jnp.ndarray,
                            mb_h: int, mb_w: int, block: int,
                            band_v: int, band_h: int,
                            layout: str = 'plane', n_seg: int = 1):
    """Grouped-column variant of `_mc_fused_band` (same group geometry as
    `_mc_grouped_multi` via `_grouped_band_setup`, same exactness
    argument as `_mc_fused_band`); `refs` planes share the motion
    vectors and the weight matrices."""
    P = len(refs)
    gband, vy, vx, oy, ox, \
        (band_rows, G, n_grp, mb_w_pad, marg, span) = _grouped_band_setup(
            refs, mv_h, mv_v, mb_h, mb_w, block, band_v, band_h,
            jnp.bfloat16)

    taps = jnp.arange(block, dtype=jnp.int32)[None, None, :]
    base_l = ((jnp.arange(mb_w_pad, dtype=jnp.int32) % G)
              * block)[None, :, None]
    cols = (base_l + vx[:, :, None] + taps + marg) \
        .reshape(mb_h, n_grp, G, block)
    w_c = _fused_tap_weights(cols, ox.reshape(mb_h, n_grp, G), span)
    if P > 1:
        w_c = jnp.concatenate([w_c] * P, axis=1)
    ridx = vy[:, :, None] + taps + band_v
    if n_seg > 1:
        rlo, rhi = _seg_band_bounds(mb_h, n_seg, block, band_v, band_rows)
        w_r = _fused_tap_weights_pair(jnp.clip(ridx, rlo, rhi),
                                      jnp.clip(ridx + 1, rlo, rhi),
                                      oy, band_rows)
    else:
        w_r = _fused_tap_weights(ridx, oy, band_rows)

    win_c = jnp.einsum('aghw,agbcw->agbhc', gband, w_c,
                       preferred_element_type=jnp.bfloat16)
    win_c = win_c.reshape(mb_h, P, mb_w_pad, band_rows, block)
    res = jnp.einsum('abrh,apbhc->apbrc', w_r, win_c,
                     preferred_element_type=jnp.float32)
    res = res[:, :, :mb_w]
    preds = jnp.right_shift(res.astype(jnp.int32) + (2 + 4 * 128), 2)
    if layout != 'block':
        return tuple(
            preds[:, p].transpose(0, 2, 1, 3).reshape(mb_h * block,
                                                      mb_w * block)
            for p in range(P))
    return tuple(preds[:, p] for p in range(P))


def band_halo_for(max_abs_mv: int, block: int = 16) -> int:
    """Smallest band halo (multiple of `block`) covering a batch's
    largest |vertical MV| in half-pel units (+1 row for the half-pel
    tap).  Bucketed so the jit-variant count stays tiny."""
    need = ((max_abs_mv + 1) >> 1) + 1
    for h in (block, 2 * block, 4 * block, 8 * block):
        if need <= h:
            return h
    return 0          # beyond buckets: callers fall back to full-height


def motion_compensate(ref: jnp.ndarray, mv_h: jnp.ndarray, mv_v: jnp.ndarray,
                      mb_h: int, mb_w: int, block: int,
                      method: str = None,
                      band_halo=None, layout: str = 'plane',
                      n_seg: int = 1) -> jnp.ndarray:
    """ref: uint8 [H, W] reference plane; mv_*: int32 [n_mb] in this plane's
    half-pel units (chroma callers pass the /2-truncated vectors).
    Returns int32 [H, W] prediction.  method: 'onehot' | 'fused' |
    'gather' | None (auto: fused on accelerators, gather on CPU);
    'fused' folds the half-pel taps into bf16 weight matmuls
    (`_mc_fused_band`, bit-exact) and degrades to the full-window
    one-hot when no band is usable.  band_halo -- an int or a
    (vertical, horizontal) tuple, static, multiples of block, covering
    the data's true MV reach -- selects the cheap 2D band-limited
    formulation on accelerators.

    The accelerator default flipped onehot -> fused on the round-3
    on-chip capture (BENCH_r03: 786.73 vs 603.55 fps device pipeline,
    +30%; bit-exact, tests/test_motion_onehot.py).

    n_seg > 1 treats the plane as n_seg independent segments stacked
    along rows (the stream-stacked serving formulation): source rows
    clamp at SEGMENT edges, so motion never reads across a stream
    boundary and each segment decodes bit-exactly as if alone."""
    if method is None:
        method = 'gather' if jax.default_backend() == 'cpu' else 'fused'
    if method in ('onehot', 'fused'):
        banded = (_mc_fused_band if method == 'fused'
                  else _mc_onehot_band)
        if band_halo:
            bv, bh = (band_halo if isinstance(band_halo, tuple)
                      else (band_halo, band_halo))
            # bh == 0 means the horizontal reach exceeded the buckets:
            # keep the row band with full-width columns (the band_h=0
            # branch); bv == 0 means no vertical bound -> full windows
            if bv and (bv < mb_h * block
                       or (bh and bh < mb_w * block)):
                return banded(ref, mv_h, mv_v, mb_h, mb_w, block,
                              bv, bh, layout, n_seg)
        # no usable band: the full-window one-hot serves both methods
        # (bit-identical results; 'fused' only exists as a banded form)
        return _mc_onehot(ref, mv_h, mv_v, mb_h, mb_w, block,
                          layout=layout, n_seg=n_seg)
    return _mc_gather(ref, mv_h, mv_v, mb_h, mb_w, block, layout=layout,
                      n_seg=n_seg)


def motion_compensate_multi(refs, mv_h: jnp.ndarray, mv_v: jnp.ndarray,
                            mb_h: int, mb_w: int, block: int,
                            method: str = None, band_halo=None,
                            layout: str = 'plane', n_seg: int = 1):
    """Motion-compensate several same-shape planes sharing one MV field
    (the two chroma planes).  With method='fused' and a usable 2D band
    (same usefulness guard as `motion_compensate`: the band must be
    smaller than the plane) the planes share one weight build and ride
    concatenated contractions (`_mc_fused_grouped_multi`); otherwise
    each plane falls back through `motion_compensate` -- bit-identical
    either way.  Returns one prediction per ref."""
    if method == 'fused' and band_halo:
        bv, bh = (band_halo if isinstance(band_halo, tuple)
                  else (band_halo, band_halo))
        if bv and bh and (bv < mb_h * block or bh < mb_w * block):
            return _mc_fused_grouped_multi(refs, mv_h, mv_v, mb_h, mb_w,
                                           block, bv, bh, layout, n_seg)
    return tuple(motion_compensate(r, mv_h, mv_v, mb_h, mb_w, block,
                                   method=method, band_halo=band_halo,
                                   layout=layout, n_seg=n_seg)
                 for r in refs)


def chroma_mv(mv: jnp.ndarray) -> jnp.ndarray:
    """Luma half-pel vector -> chroma half-pel vector: truncate-toward-zero
    division by two (JS `(x/2)|0` semantics at src/mpeg1.js:562-565)."""
    return jnp.int32(jnp.sign(mv)) * (jnp.abs(mv) >> 1)
