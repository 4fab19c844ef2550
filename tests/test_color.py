"""Color conversion kernels vs a straight-line port of the reference's
Canvas2D integer loop (/root/reference/src/canvas2d.js:53-122)."""

import numpy as np

from jsmpeg_tpu.ops.color import ycbcr_to_rgb_int, ycbcr_to_rgb_rec601


def _oracle_canvas2d(y, cr, cb, width, height):
    """Reference loop, names kept: its `cb` argument receives the Cr
    plane (the render() call chain passes (y, cr, cb))."""
    w = ((width + 15) >> 4) << 4
    out = np.zeros((height, width, 3), np.int64)
    ref_cb = cr        # reference's variable naming swap
    ref_cr = cb
    for row in range(height >> 1):
        for col in range(width >> 1):
            ccb = int(ref_cb[row, col])
            ccr = int(ref_cr[row, col])
            r = (ccb + ((ccb * 103) >> 8)) - 179
            g = ((ccr * 88) >> 8) - 44 + ((ccb * 183) >> 8) - 91
            b = (ccr + ((ccr * 198) >> 8)) - 227
            for dy in range(2):
                for dx in range(2):
                    yy = int(y[row * 2 + dy, col * 2 + dx])
                    out[row * 2 + dy, col * 2 + dx] = (yy + r, yy - g,
                                                       yy + b)
    return np.clip(out, 0, 255).astype(np.uint8)


def test_int_conversion_matches_reference_loop():
    rng = np.random.default_rng(5)
    width, height = 48, 32
    cw, ch = 64, 32        # coded size with MB padding
    y = rng.integers(0, 256, (ch, cw), dtype=np.uint8)
    cr = rng.integers(0, 256, (ch // 2, cw // 2), dtype=np.uint8)
    cb = rng.integers(0, 256, (ch // 2, cw // 2), dtype=np.uint8)
    got = np.asarray(ycbcr_to_rgb_int(y, cr, cb, width, height))
    want = _oracle_canvas2d(y, cr, cb, width, height)
    np.testing.assert_array_equal(want, got)


def test_rec601_sane():
    """Float path: neutral chroma (128) must reproduce luma in all
    channels; saturation clamps."""
    y = np.full((16, 16), 77, np.uint8)
    c = np.full((8, 8), 128, np.uint8)
    rgb = np.asarray(ycbcr_to_rgb_rec601(y, c, c, 16, 16))
    assert (rgb == 77).all()
    hot = np.full((8, 8), 255, np.uint8)
    rgb2 = np.asarray(ycbcr_to_rgb_rec601(np.full((16, 16), 235, np.uint8),
                                          hot, hot, 16, 16))
    assert rgb2[..., 0].max() == 255 and rgb2.min() >= 0
