"""MPEG1 video decoder: host parse + TPU decode pipeline.

Public decoder with the reference's Decoder contract
(connect/write/decode/seek, cf. /root/reference/src/jsmpeg.js:43-54) built
TPU-first: the host parser turns the bitstream into dense per-frame tensors,
and a jitted `lax.scan` over frames runs dequant/IDCT/motion-comp/assembly
on device with the reference planes as the scan carry.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..host.mpeg1_parse import FrameData, MPEG1Parser
from ..ops.frame import FrameArrays, Planes, decode_frame_planes, \
    decode_frame_step


def frame_to_arrays(f: FrameData, valid: bool = True) -> FrameArrays:
    return FrameArrays(
        coef=f.coef.astype(np.int32),
        coded=f.coded,
        intra=f.intra,
        written=f.written,
        mv_h=f.mv[:, 0].astype(np.int32),
        mv_v=f.mv[:, 1].astype(np.int32),
        valid=np.asarray(valid),
    )


def empty_frame_arrays(n_mb: int) -> FrameArrays:
    return FrameArrays(
        coef=np.zeros((n_mb, 6, 64), np.int32),
        coded=np.zeros((n_mb, 6), bool),
        intra=np.zeros(n_mb, bool),
        written=np.zeros(n_mb, bool),
        mv_h=np.zeros(n_mb, np.int32),
        mv_v=np.zeros(n_mb, np.int32),
        valid=np.asarray(False),
    )


def stack_frames(frames: List[FrameArrays]) -> FrameArrays:
    return FrameArrays(*[np.stack([getattr(f, name) for f in frames])
                         for name in FrameArrays._fields])


@functools.partial(jax.jit, static_argnames=('mb_h', 'mb_w'))
def decode_one(cur: Planes, fwd: Planes, f: FrameArrays,
               mb_h: int, mb_w: int):
    (new_cur, new_fwd), out = decode_frame_step((cur, fwd), f, mb_h, mb_w)
    return new_cur, new_fwd, out


@functools.partial(jax.jit, static_argnames=('mb_h', 'mb_w'))
def decode_scan(cur: Planes, fwd: Planes, stacked: FrameArrays,
                mb_h: int, mb_w: int):
    """Decode a stack of frames with the reference planes as scan carry."""
    step = functools.partial(decode_frame_step, mb_h=mb_h, mb_w=mb_w)
    (cur, fwd), outs = jax.lax.scan(step, (cur, fwd), stacked)
    return cur, fwd, outs


class MPEG1Decoder:
    """Streaming-capable MPEG1 video decoder (TPU pipeline).

    write() bytes in, decode() one frame out -- or decode_available() to
    batch every parsed picture through a single device scan (the
    high-throughput path).
    """

    def __init__(self, options: Optional[dict] = None):
        options = options or {}
        self.parser = MPEG1Parser()
        self.destination = None
        self._cur: Optional[Planes] = None
        self._fwd: Optional[Planes] = None
        self.frame_rate = 30.0
        self.on_decode = options.get('onVideoDecode')

    # ------------------------------------------------------- decoder API

    def connect(self, destination) -> None:
        self.destination = destination

    def write(self, pts, buffers) -> None:
        if isinstance(buffers, (bytes, bytearray, memoryview, np.ndarray)):
            buffers = [buffers]
        for b in buffers:
            self.parser.write(b)
        if self.parser.has_sequence_header and self._cur is None:
            self._init_planes()

    def _init_planes(self) -> None:
        seq = self.parser.seq
        self.frame_rate = seq.frame_rate
        cw, ch = seq.coded_width, seq.coded_height
        z = lambda h, w: jnp.zeros((h, w), dtype=jnp.uint8)
        self._cur = Planes(z(ch, cw), z(ch >> 1, cw >> 1), z(ch >> 1, cw >> 1))
        self._fwd = Planes(z(ch, cw), z(ch >> 1, cw >> 1), z(ch >> 1, cw >> 1))
        if self.destination is not None and hasattr(self.destination, 'resize'):
            self.destination.resize(seq.width, seq.height)

    @property
    def seq(self):
        return self.parser.seq

    def decode(self, eof: bool = False):
        """Decode one picture; returns Planes or None."""
        fd = self.parser.parse_frame(eof=eof)
        if fd is None:
            return None
        seq = self.parser.seq
        self._cur, self._fwd, out = decode_one(
            self._cur, self._fwd, frame_to_arrays(fd),
            mb_h=seq.mb_height, mb_w=seq.mb_width)
        if self.destination is not None:
            self.destination.render(out.y, out.cr, out.cb)
        return out

    def decode_available(self, eof: bool = False, pad_to: int = 0):
        """Parse every complete picture buffered and decode them in one
        device scan.  Returns list of Planes (device arrays, stacked)."""
        frames = []
        while True:
            fd = self.parser.parse_frame(eof=eof)
            if fd is None:
                break
            frames.append(frame_to_arrays(fd))
        if not frames:
            return None
        seq = self.parser.seq
        n = len(frames)
        if pad_to > n:
            frames += [empty_frame_arrays(seq.mb_size)] * (pad_to - n)
        stacked = stack_frames(frames)
        self._cur, self._fwd, outs = decode_scan(
            self._cur, self._fwd, stacked,
            mb_h=seq.mb_height, mb_w=seq.mb_width)
        result = [Planes(outs.y[i], outs.cr[i], outs.cb[i]) for i in range(n)]
        if self.destination is not None:
            for p in result:
                self.destination.render(p.y, p.cr, p.cb)
        return result
