"""Exact large-array cumulative sums as triangular MXU matmuls.

XLA lowers `jnp.cumsum` over a large 1D array on TPU to a log-depth
associative scan whose passes are relayout-heavy; measured on v5e it costs
milliseconds at a few hundred thousand elements -- far above its bandwidth
bound.  The decode pipeline's index plumbing (run expansion, escape slots,
coded-block ordinals) is all cumsums of small non-negative integers, and
those can ride the MXU instead: reshape to [n/128, 128], multiply by an
upper-triangular ones matrix for the within-block inclusive cumsum, and
recurse on the per-block sums.

Exactness argument (this is on the bit-exact decode path):
  - the triangular matrix is 0/1, exact in bfloat16;
  - block inputs are small integers (values <= `vmax`), exact in bfloat16
    when vmax <= 256 -- every level-1 use here feeds 0/1 indicators, and
    level-2 feeds per-block sums <= 128 * vmax;
  - the MXU accumulates in float32, and every partial sum is an integer
    below 2**24, so no rounding ever occurs;
  - levels whose values exceed the bfloat16-exact range fall back to a
    plain `jnp.cumsum` (they are tiny: n/128**2 elements).

The public helper returns int32 and requires total sum < 2**24.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

_BLOCK = 128


@functools.lru_cache(maxsize=None)
def _tri(dtype_name: str):
    # numpy, not a device array: a cached jnp constant would leak tracers
    # across jit traces
    t = np.triu(np.ones((_BLOCK, _BLOCK), np.float32))
    return t.astype(jnp.dtype(dtype_name))


def _cumsum_blocks(x: jnp.ndarray, vmax: int) -> jnp.ndarray:
    """Inclusive cumsum of a float32 1D array of non-negative integers
    (values <= vmax, total < 2**24).  Returns float32."""
    n = x.shape[0]
    if n <= 1024 or vmax > 256:
        return jnp.cumsum(x)
    r = -(-n // _BLOCK)
    xp = jnp.pad(x, (0, r * _BLOCK - n)).reshape(r, _BLOCK)
    s1 = jnp.matmul(xp.astype(jnp.bfloat16), _tri('bfloat16'),
                    preferred_element_type=jnp.float32)
    b = s1[:, -1]                       # block sums, <= _BLOCK * vmax
    c = _cumsum_blocks(b, vmax * _BLOCK)
    out = s1 + (c - b)[:, None]
    return out.reshape(-1)[:n]


def indicator_cumsum(x: jnp.ndarray, vmax: int = 1) -> jnp.ndarray:
    """Inclusive cumsum of small non-negative integers (values <= vmax,
    vmax <= 256, total < 2**24) as exact MXU matmuls.  x: 1D bool or int;
    returns int32."""
    assert vmax <= 256
    return _cumsum_blocks(x.astype(jnp.float32), vmax).astype(jnp.int32)
