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


def resolve_mesh(spec, devices: Optional[Sequence] = None) -> Optional[Mesh]:
    """Accepts what PlayerConfig.mesh / CLI --mesh carry and returns a
    ('gop', 'tile') Mesh (or None):
      Mesh          -> itself
      int n         -> n-way GOP parallel
      (g, t)        -> explicit shape
      '4x2' / '8'   -> parsed shape (gop x tile)
      'auto'/'all'  -> every visible device, GOP-parallel
    """
    if spec is None:
        return None
    if isinstance(spec, Mesh):
        return spec
    if isinstance(spec, int):
        return make_mesh(n_gop=spec, n_tile=1, devices=devices)
    if isinstance(spec, (tuple, list)):
        g, t = spec
        return make_mesh(n_gop=int(g), n_tile=int(t), devices=devices)
    if isinstance(spec, str):
        s = spec.lower().replace('gop', '').replace('tile', '').strip()
        if s in ('auto', 'all'):
            return make_mesh(devices=devices)
        if 'x' in s:
            g, _, t = s.partition('x')
            return make_mesh(n_gop=int(g), n_tile=int(t), devices=devices)
        return make_mesh(n_gop=int(s), n_tile=1, devices=devices)
    raise TypeError(f'unsupported mesh spec: {spec!r}')


def _pvary(x, axes):
    """Mark a shard-local constant as device-varying (API moved between
    jax versions)."""
    if hasattr(jax.lax, 'pcast'):
        try:
            return jax.lax.pcast(x, axes, to='varying')
        except TypeError:
            return jax.lax.pcast(x, to='varying', axis_name=axes)
    return jax.lax.pvary(x, axes)
