"""GOP-parallel decode: shard independent GOPs over the 'gop' mesh axis.

A closed GOP (I-frame followed by P-frames) depends on nothing outside
itself, so a batch of GOPs decodes embarrassingly parallel: one
`lax.scan` (serial P-frame dependence) per GOP, `vmap` over the local
GOPs, `shard_map` over the mesh.  This is the primary scaling axis
(SURVEY.md section 2) -- the reference is single-threaded and has no
equivalent.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..host.mpeg1_parse import FrameData
from ..models.mpeg1 import empty_frame_arrays, frame_to_arrays, stack_frames
from ..ops.frame import FrameArrays, Planes, decode_frame_step
from .mesh import _pvary, shard_map


def split_at_iframes(frames, pic_type_of) -> list:
    """Split a picture sequence at I-frames into closed GOPs."""
    gops: list = []
    for f in frames:
        if pic_type_of(f) == 1 or not gops:
            gops.append([])
        gops[-1].append(f)
    return gops


def split_gops(frames: List[FrameData]) -> List[List[FrameData]]:
    return split_at_iframes(frames, lambda f: f.pic_type)


def stack_gops(gops: List[List[FrameData]], pad_gops_to: int,
               pad_frames_to: int, n_mb: int) -> Tuple[FrameArrays, np.ndarray]:
    """Stack GOPs into [G, F, ...] arrays (padded; invalid frames no-op).
    Returns (stacked, n_frames_per_gop)."""
    counts = np.array([len(g) for g in gops] + [0] * (pad_gops_to - len(gops)))
    rows = []
    empty = empty_frame_arrays(n_mb)
    for gi in range(pad_gops_to):
        fr = [frame_to_arrays(f) for f in gops[gi]] if gi < len(gops) else []
        fr += [empty] * (pad_frames_to - len(fr))
        rows.append(stack_frames(fr))
    stacked = FrameArrays(*[np.stack([getattr(r, name) for r in rows])
                            for name in FrameArrays._fields])
    return stacked, counts


@functools.partial(jax.jit, static_argnames=('mb_h', 'mb_w', 'mesh'))
def decode_gops_sharded(stacked: FrameArrays, mb_h: int, mb_w: int,
                        mesh: Mesh):
    """stacked: [G, F, ...] with G divisible by mesh 'gop' axis size.
    Returns planes stacked [G, F, H, W] etc."""
    cw, ch = mb_w * 16, mb_h * 16

    def decode_one_gop(frames: FrameArrays):
        z = lambda h, w: jnp.zeros((h, w), dtype=jnp.uint8)
        state = (Planes(z(ch, cw), z(ch >> 1, cw >> 1), z(ch >> 1, cw >> 1)),
                 Planes(z(ch, cw), z(ch >> 1, cw >> 1), z(ch >> 1, cw >> 1)))
        # the zero-initialized carry is device-varying along 'gop'
        state = _pvary(state, 'gop')
        step = functools.partial(decode_frame_step, mb_h=mb_h, mb_w=mb_w)
        _, outs = jax.lax.scan(step, state, frames)
        return outs

    def local_shard(frames: FrameArrays):
        return jax.vmap(decode_one_gop)(frames)

    spec = P('gop')
    fn = shard_map(local_shard, mesh=mesh,
                   in_specs=(FrameArrays(*[spec] * len(FrameArrays._fields)),),
                   out_specs=Planes(spec, spec, spec))
    return fn(stacked)


def decode_gop_parallel(frames: List[FrameData], mb_h: int, mb_w: int,
                        mesh: Mesh) -> List[Planes]:
    """Convenience driver: split/pad/stack frames, decode across the mesh,
    return per-frame planes in input order."""
    gops = split_gops(frames)
    from .packed import gop_closed
    for gop in gops:
        if not gop_closed(gop):
            raise ValueError('GOP not closed (slice-gap frame exposes '
                             'pre-GOP plane content); decode off-mesh')
    n_gop_axis = mesh.shape['gop']
    g = max(1, -(-len(gops) // n_gop_axis)) * n_gop_axis
    f = max(len(x) for x in gops)
    stacked, counts = stack_gops(gops, g, f, mb_h * mb_w)
    outs = decode_gops_sharded(stacked, mb_h, mb_w, mesh)
    result = []
    for gi, gop in enumerate(gops):
        for fi in range(len(gop)):
            result.append(Planes(outs.y[gi, fi], outs.cr[gi, fi],
                                 outs.cb[gi, fi]))
    return result
