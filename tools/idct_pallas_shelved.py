"""Pallas TPU kernel: fused dequantize + integer 8x8 IDCT over a batch of
blocks.

Same integer semantics as ops/idct.py (the reference decoder's fixed-point
IDCT, /root/reference/src/mpeg1.js:793-810,916-983): wrapping int32 math,
`>>` rounding at the butterfly sites, oddify/clamp in the dequant.  The
kernel keeps one [64, B] tile of coefficients resident in VMEM and runs
dequant + both butterfly passes before writing pixels back -- one HBM
round trip per block instead of XLA's fusion-boundary traffic.

The XLA path (idct.py, fused by the compiler into the frame pipeline) is
the default and measured slightly faster end-to-end on v5e (the compiler
fuses dequant+IDCT into the surrounding frame math anyway); this kernel
is the hand-scheduled alternative for chips / shapes where profiling
shows the fusion boundary costing bandwidth, and doubles as the repo's
Pallas reference.  Call `dequant_idct_pallas` directly (same contract as
dequant_premult + idct_s32); it is not wired into the default pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jsmpeg_tpu import tables as T

_LANES = 128            # blocks per kernel instance (lane dimension)


def _shr8(x):
    return jax.lax.shift_right_arithmetic(x, 8)


def _butterfly_rows(r, final: bool):
    """One IDCT pass over a list of 8 [rows, B] slabs -> 8 slabs."""
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
    return rows


def _kernel(lv_ref, qs_ref, it_ref, iq_ref, nq_ref, pm_ref, out_ref):
    lv = lv_ref[:]                        # [64, B] raster-order levels
    qs = qs_ref[:]                        # [1, B]
    it = it_ref[:]                        # [1, B] 0/1
    iq = iq_ref[:]                        # [64, 1]
    nq = nq_ref[:]
    intra = it != 0

    # dequant + oddify + clamp + premultiply (src/mpeg1.js:793-810)
    quant = jnp.where(intra, iq, nq)
    x = lv * 2
    x = jnp.where(intra, x, x + jnp.sign(lv))
    x = jax.lax.shift_right_arithmetic(x * qs * quant, 4)
    x = jnp.where((x & 1) == 0, x - jnp.where(x > 0, 1, -1), x)
    x = jnp.clip(x, -2048, 2047)
    x = x * pm_ref[:]
    x = jnp.where(lv == 0, 0, x)
    # intra DC bypasses dequant (value << 8)
    dc = jnp.where(intra, jax.lax.shift_left(lv[0:1], 8), x[0:1])
    x = jnp.concatenate([dc, x[1:]], axis=0)

    # pass 1: butterflies along the row index i of the 8x8 (slab i holds
    # raster positions i*8..i*8+7 for all lanes)
    r = [x[i * 8:(i + 1) * 8] for i in range(8)]
    c = _butterfly_rows(r, final=False)
    # transpose the 8x8 within each lane: column j of pass-1 output
    # becomes a slab for pass 2
    rt = [jnp.concatenate([c[i][j:j + 1] for i in range(8)], axis=0)
          for j in range(8)]
    o = _butterfly_rows(rt, final=True)
    # transpose back to raster order and store
    out = jnp.concatenate(
        [jnp.concatenate([o[j][i:i + 1] for j in range(8)], axis=0)
         for i in range(8)], axis=0)
    out_ref[:] = out


@functools.partial(jax.jit, static_argnames=('interpret',))
def dequant_idct_pallas(levels: jnp.ndarray, qscale: jnp.ndarray,
                        intra: jnp.ndarray, intra_q: jnp.ndarray,
                        non_intra_q: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """levels int32/int16 [n_mb, 6, 64] raster-order raw levels ->
    int32 [n_mb, 6, 64] decoded pixel residuals (pre-assembly).

    Grid: one kernel instance per 128 blocks; coefficients live in VMEM
    for the whole dequant+IDCT."""
    from jax.experimental import pallas as pl

    n_mb = levels.shape[0]
    n_blk = n_mb * 6
    pad = -(-n_blk // _LANES) * _LANES
    lv = jnp.zeros((pad, 64), jnp.int32).at[:n_blk].set(
        levels.reshape(n_blk, 64).astype(jnp.int32)).T   # [64, pad]
    qs = jnp.zeros((1, pad), jnp.int32).at[0, :n_blk].set(
        jnp.repeat(qscale.astype(jnp.int32), 6,
                   total_repeat_length=n_blk))
    it = jnp.zeros((1, pad), jnp.int32).at[0, :n_blk].set(
        jnp.repeat(intra.astype(jnp.int32), 6,
                   total_repeat_length=n_blk))
    iq = intra_q.astype(jnp.int32).reshape(64, 1)
    nq = non_intra_q.astype(jnp.int32).reshape(64, 1)
    pm = jnp.asarray(T.PREMULTIPLIER_MATRIX, jnp.int32).reshape(64, 1)

    grid = pad // _LANES
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((64, pad), jnp.int32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((64, _LANES), lambda i: (0, i)),
            pl.BlockSpec((1, _LANES), lambda i: (0, i)),
            pl.BlockSpec((1, _LANES), lambda i: (0, i)),
            pl.BlockSpec((64, 1), lambda i: (0, 0)),
            pl.BlockSpec((64, 1), lambda i: (0, 0)),
            pl.BlockSpec((64, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((64, _LANES), lambda i: (0, i)),
        interpret=interpret,
    )(lv, qs, it, iq, nq, pm)
    return out.T[:n_blk].reshape(n_mb, 6, 64)
