"""Device mesh helpers for parallel decode.

Axes (cf. SURVEY.md section 2, parallelism table):
  'gop'  -- data parallel: closed GOPs are independent decode units,
            sharded across hosts/chips (DCN/ICI).
  'tile' -- spatial parallel: macroblock-tile shards of one frame across
            chips (ICI), with halo exchange of reference-plane slabs for
            motion compensation.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

try:                                    # jax >= 0.4.35
    from jax import shard_map as _shard_map_mod
    shard_map = jax.shard_map
except AttributeError:                  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def make_mesh(n_gop: Optional[int] = None, n_tile: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_gop is None:
        n_gop = len(devices) // n_tile
    use = devices[:n_gop * n_tile]
    arr = np.array(use).reshape(n_gop, n_tile)
    return Mesh(arr, ('gop', 'tile'))


def _pvary(x, axes):
    """Mark a shard-local constant as device-varying (API moved between
    jax versions)."""
    if hasattr(jax.lax, 'pcast'):
        try:
            return jax.lax.pcast(x, axes, to='varying')
        except TypeError:
            return jax.lax.pcast(x, to='varying', axis_name=axes)
    return jax.lax.pvary(x, axes)
