"""Half-pel forward motion compensation over whole frames.

The reference compensates one macroblock at a time with four hand-unrolled
half-pel cases (/root/reference/src/mpeg1.js:459-687).  On TPU we do the
whole frame in one shot: motion vectors broadcast per-pixel, a 4-tap gather,
and ONE universal rounding formula

    pred = (A + B + C + D + 2) >> 2,   B/C/D offset by (odd_h, odd_v)

which is bit-exact for all four parities:
  - odd_h = odd_v = 1: the reference's (a+b+c+d+2)>>2        (identical)
  - one odd:           (2(a+b)+2)>>2 == (a+b+1)>>1           (exact identity)
  - none:              (4a+2)>>2 == a                        (exact identity)
"""

from __future__ import annotations

import jax.numpy as jnp


def _pixel_mv(mv: jnp.ndarray, mb_h: int, mb_w: int, block: int):
    """Broadcast per-MB values [n_mb] -> per-pixel [mb_h*block, mb_w*block]."""
    grid = mv.reshape(mb_h, mb_w)
    return jnp.repeat(jnp.repeat(grid, block, axis=0), block, axis=1)


def motion_compensate(ref: jnp.ndarray, mv_h: jnp.ndarray, mv_v: jnp.ndarray,
                      mb_h: int, mb_w: int, block: int) -> jnp.ndarray:
    """ref: uint8 [H, W] reference plane; mv_*: int32 [n_mb] in this plane's
    half-pel units (chroma callers pass the /2-truncated vectors).
    Returns int32 [H, W] prediction."""
    H, W = ref.shape
    mvh = _pixel_mv(mv_h, mb_h, mb_w, block)
    mvv = _pixel_mv(mv_v, mb_h, mb_w, block)

    iy = jnp.arange(H, dtype=jnp.int32)[:, None]
    ix = jnp.arange(W, dtype=jnp.int32)[None, :]
    sy = iy + jnp.right_shift(mvv, 1)
    sx = ix + jnp.right_shift(mvh, 1)
    oy = mvv & 1
    ox = mvh & 1

    flat = ref.reshape(-1).astype(jnp.int32)

    def g(y, x):
        y = jnp.clip(y, 0, H - 1)
        x = jnp.clip(x, 0, W - 1)
        return jnp.take(flat, y * W + x, axis=0)

    a = g(sy, sx)
    b = g(sy, sx + ox)
    c = g(sy + oy, sx)
    d = g(sy + oy, sx + ox)
    return jnp.right_shift(a + b + c + d + 2, 2)


def chroma_mv(mv: jnp.ndarray) -> jnp.ndarray:
    """Luma half-pel vector -> chroma half-pel vector: truncate-toward-zero
    division by two (JS `(x/2)|0` semantics at src/mpeg1.js:562-565)."""
    return jnp.int32(jnp.sign(mv)) * (jnp.abs(mv) >> 1)
