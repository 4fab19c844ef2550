"""Batched fixed-point 8x8 IDCT (+ optional device-side dequantization).

Reproduces the reference decoder's integer IDCT (semantics of
/root/reference/src/mpeg1.js:916-983) bit-exactly in int32 lanes: JS reduces
to int32 at every `>>` site and at Int32Array stores, and only +/-/* occur
between reductions, so plain wrapping int32 arithmetic is exact.

The transform is elementwise over the batch dimension(s) -- pure VPU work
that XLA fuses with the surrounding dequant/assemble math.  Inputs are
"premultiplied" coefficients: level * PREMULTIPLIER[pos], DC <<= 8 for
intra (the host parser or `dequant_premult` produces them).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import tables as T


def _shr8(x):
    """int32 arithmetic shift right by 8 (input already biased by +128)."""
    return jnp.right_shift(x, 8)


def _butterfly(m, final: bool):
    """One IDCT pass along axis -2 of an int32 [..., 8, 8] array."""
    r = [m[..., i, :] for i in range(8)]
    b1 = r[4]
    b3 = r[2] + r[6]
    b4 = r[5] - r[3]
    tmp1 = r[1] + r[7]
    tmp2 = r[3] + r[5]
    b6 = r[1] - r[7]
    b7 = tmp1 + tmp2
    m0 = r[0]
    x4 = _shr8(b6 * 473 - b4 * 196 + 128) - b7
    x0 = x4 - _shr8((tmp1 - tmp2) * 362 + 128)
    x1 = m0 - b1
    x2 = _shr8((r[2] - r[6]) * 362 + 128) - b3
    x3 = m0 + b1
    y3 = x1 + x2
    y4 = x3 + b3
    y5 = x1 - x2
    y6 = x3 - b3
    y7 = -x0 - _shr8(b4 * 473 + b6 * 196 + 128)
    rows = (b7 + y4, x4 + y3, y5 - x0, y6 - y7,
            y6 + y7, x0 + y5, y3 - x4, y4 - b7)
    if final:
        rows = tuple(_shr8(v + 128) for v in rows)
    return jnp.stack(rows, axis=-2)


def idct_s32(blocks: jnp.ndarray) -> jnp.ndarray:
    """blocks: int32 [..., 8, 8] premultiplied coefficients -> int32 pixels."""
    assert blocks.dtype == jnp.int32
    cols = _butterfly(blocks, final=False)
    rows = _butterfly(cols.swapaxes(-1, -2), final=True)
    return rows.swapaxes(-1, -2)


_PREMULT = np.asarray(T.PREMULTIPLIER_MATRIX, dtype=np.int32).reshape(8, 8)


def dequant_premult(levels: jnp.ndarray, qscale: jnp.ndarray,
                    intra: jnp.ndarray, intra_q: jnp.ndarray,
                    non_intra_q: jnp.ndarray) -> jnp.ndarray:
    """Device-side dequantize + oddify + clamp + premultiply.

    levels:      int32 [n_mb, 6, 64] raw VLC levels at raster positions
                 (intra DC at [..., 0] already predictor-resolved)
    qscale:      int32 [n_mb]
    intra:       bool  [n_mb]
    *_q:         int32 [64] quantizer matrices (raster order)

    Matches src/mpeg1.js:793-810 semantics per coefficient.  Valid only for
    streams without the DC-fast-path stale-coefficient leak (the host parser
    counts those in `quirk_leaks`; its own dequant path is always exact).
    """
    lv = levels.astype(jnp.int32)
    intra_b = intra[:, None, None]
    quant = jnp.where(intra_b, intra_q[None, None, :],
                      non_intra_q[None, None, :])
    x = lv * 2
    x = jnp.where(intra_b, x, x + jnp.sign(lv))
    x = jnp.right_shift(x * qscale[:, None, None] * quant, 4)
    # oddify: if even, step toward zero by one (note: reference maps a
    # dequantized 0 to +1 here; only reachable via escape-coded zero levels,
    # which the host parser flags)
    x = jnp.where((x & 1) == 0, x - jnp.where(x > 0, 1, -1), x)
    x = jnp.clip(x, -2048, 2047)
    x = x * jnp.asarray(T.PREMULTIPLIER_MATRIX, dtype=jnp.int32)[None, None, :]
    # uncoded (all-zero) positions in the dense layout must stay zero
    x = jnp.where(lv == 0, 0, x)
    # intra DC bypasses dequant: value << 8
    dc = jnp.where(intra_b[..., 0], lv[..., 0] << 8, x[..., 0])
    return x.at[..., 0].set(dc)
