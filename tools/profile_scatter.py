"""Slope-time the scatters/gathers that dominate packed_to_levels, and
A/B int16 vs int32 scatter values.  fori_loop chaining inside one jit."""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jax_comp')

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jsmpeg_tpu.utils import fetch

P = 393216          # pairs (one scatter segment)
NBLK = 131072       # coded-block bucket
DENSE = 691200 * 64  # dense lattice elements (32 frames x 3600 MB x 6 x 64)
MASKN = 691200


def f_first(x):
    np.asarray(fetch(x.reshape(-1)[:4].astype(jnp.float32)))


def slope(make_body, init, k_lo=4, k_hi=16):
    def chained(k):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, k, make_body, x)
        return run
    lo, hi = chained(k_lo), chained(k_hi)
    f_first(lo(init)); f_first(hi(init))
    ts = []
    for _ in range(3):
        t0 = time.monotonic(); f_first(lo(init)); a = time.monotonic() - t0
        t0 = time.monotonic(); f_first(hi(init)); b = time.monotonic() - t0
        ts.append((b - a) / (k_hi - k_lo))
    return sorted(ts)[1] * 1e3


def main():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.permutation(DENSE)[:P].astype(np.int32))
    val16 = jnp.asarray(rng.integers(-500, 500, P).astype(np.int16))
    val32 = val16.astype(jnp.int32)

    def body16(i, flat):
        out = jnp.zeros((DENSE,), jnp.int16).at[idx + i].set(val16,
                                                             mode='drop')
        return jnp.where(out[:1] > 0, flat + 1, flat)
    t = slope(body16, jnp.zeros((1,), jnp.int16))
    print(f'pair scatter int16 (393k -> 44M)  {t:7.2f} ms', flush=True)

    def body32(i, flat):
        out = jnp.zeros((DENSE,), jnp.int32).at[idx + i].set(val32,
                                                             mode='drop')
        return jnp.where(out[:1] > 0, flat + 1, flat)
    t = slope(body32, jnp.zeros((1,), jnp.int32))
    print(f'pair scatter int32 (393k -> 44M)  {t:7.2f} ms', flush=True)

    dst = jnp.asarray(np.sort(rng.permutation(MASKN)[:122811])
                      .astype(np.int32))
    upd = jnp.arange(122811, dtype=jnp.int32)

    def bodyblk(i, x):
        # the real blk_ids scatter has MASKN updates (most dropped)
        d = jnp.where(jnp.arange(MASKN) % 6 < 1, jnp.arange(MASKN) // 6,
                      NBLK + 1)
        out = jnp.full((NBLK + 1,), 0, jnp.int32).at[d + i].set(
            jnp.arange(MASKN, dtype=jnp.int32), mode='drop')
        return jnp.where(out[:1] > 0, x + 1, x)
    t = slope(bodyblk, jnp.zeros((1,), jnp.int32))
    print(f'blk_ids scatter (691k updates)    {t:7.2f} ms', flush=True)

    def bodyblk2(i, x):
        # compacted variant: only the real (1-in-6) updates scatter
        out = jnp.full((NBLK + 1,), 0, jnp.int32).at[dst + i].set(
            upd, mode='drop')
        return jnp.where(out[:1] > 0, x + 1, x)
    t = slope(bodyblk2, jnp.zeros((1,), jnp.int32))
    print(f'blk_ids scatter (123k updates)    {t:7.2f} ms', flush=True)

    tbl = jnp.asarray(rng.integers(0, DENSE, NBLK + 1).astype(np.int32))
    q = jnp.asarray(rng.integers(0, NBLK, P).astype(np.int32))

    def bodyg(i, x):
        out = jnp.take(tbl, jnp.clip(q + i, 0, NBLK))
        return x + out[:1]
    t = slope(bodyg, jnp.zeros((1,), jnp.int32))
    print(f'gid gather (340k from 131k)       {t:7.2f} ms', flush=True)


def extra_rowscatter():
    rng = np.random.default_rng(1)
    rows = jnp.asarray(rng.integers(-500, 500, (NBLK, 64)).astype(np.int16))
    ridx = jnp.asarray(np.sort(rng.permutation(691200)[:NBLK])
                       .astype(np.int32))

    def body(i, x):
        out = jnp.zeros((691200, 64), jnp.int16).at[ridx + i].set(
            rows, mode='drop')
        return jnp.where(out[0, :1] > 0, x + 1, x)
    t = slope(body, jnp.zeros((1,), jnp.int16))
    print(f'row scatter (131k x 64 int16)     {t:7.2f} ms', flush=True)


if __name__ == '__main__':
    main()
    extra_rowscatter()
