"""YCbCr -> RGB conversion kernels.

Two variants mirroring the reference's two renderers:
- `ycbcr_to_rgb_int`: the Canvas2D renderer's integer math
  (/root/reference/src/canvas2d.js:89-112), bit-exact, 2x2 shared chroma.
- `ycbcr_to_rgb_rec601`: the WebGL shader's float Rec.601 matrix
  (/root/reference/src/webgl.js:260-281).

Both take coded-size planes and return display-size RGB.
NOTE on argument order: like the reference's render() call chain, `cr` is
the red-difference plane, `cb` the blue-difference plane.
"""

from __future__ import annotations

import jax.numpy as jnp


def _upsample2(c: jnp.ndarray) -> jnp.ndarray:
    return jnp.repeat(jnp.repeat(c, 2, axis=0), 2, axis=1)


def ycbcr_to_rgb_int(y: jnp.ndarray, cr: jnp.ndarray, cb: jnp.ndarray,
                     width: int, height: int) -> jnp.ndarray:
    """Integer conversion, bit-exact with the Canvas2D renderer.

    y: uint8 [CH, CW] coded-size; cr/cb: uint8 [CH/2, CW/2].
    Returns uint8 [height, width, 3].
    """
    yv = y[:height, :width].astype(jnp.int32)
    crf = _upsample2(cr.astype(jnp.int32))[:height, :width]
    cbf = _upsample2(cb.astype(jnp.int32))[:height, :width]
    # reference names its 2nd arg "cb" but receives the Cr plane; the math
    # below uses the real meanings.
    r = (crf + jnp.right_shift(crf * 103, 8)) - 179
    g = (jnp.right_shift(cbf * 88, 8) - 44 +
         jnp.right_shift(crf * 183, 8) - 91)
    b = (cbf + jnp.right_shift(cbf * 198, 8)) - 227
    rgb = jnp.stack([yv + r, yv - g, yv + b], axis=-1)
    return jnp.clip(rgb, 0, 255).astype(jnp.uint8)


def ycbcr_to_rgb_rec601(y: jnp.ndarray, cr: jnp.ndarray, cb: jnp.ndarray,
                        width: int, height: int) -> jnp.ndarray:
    """Float Rec.601 conversion (WebGL shader semantics)."""
    yv = y[:height, :width].astype(jnp.float32)
    crf = _upsample2(cr.astype(jnp.float32))[:height, :width] - 128.0
    cbf = _upsample2(cb.astype(jnp.float32))[:height, :width] - 128.0
    r = yv + 1.402 * crf
    g = yv - 0.344136 * cbf - 0.714136 * crf
    b = yv + 1.772 * cbf
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(jnp.round(rgb), 0, 255).astype(jnp.uint8)
