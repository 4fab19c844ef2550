"""MP2 audio decoder: host parse + synthesis (exact host path or TPU path).

Decoder contract mirrors the reference (connect/write/decode,
/root/reference/src/jsmpeg.js:43-54); destination receives
play(sample_rate, left, right).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..host.mp2_parse import MP2Parser
from ..ops import mp2_synth


@functools.partial(jax.jit, static_argnames=('v_pos_init',))
def _tpu_synth(samples, v_chunks, v_pos_init):
    return mp2_synth.synthesize_tpu(samples, v_chunks, v_pos_init)


class MP2Decoder:
    """mode='exact': bit-exact host synthesis (numpy, float64 DAG).
    mode='tpu': MXU matmul synthesis (float32, ~1e-7 output error)."""

    def __init__(self, options: Optional[dict] = None, mode: str = 'exact'):
        options = options or {}
        self.parser = MP2Parser()
        self.destination = None
        self.mode = mode
        self.sample_rate = 44100
        self._state = mp2_synth.initial_state()
        self._v_chunks = np.zeros((15, 2, 64), dtype=np.float32)
        self._v_pos = 0
        self.on_decode = options.get('onAudioDecode')

    def connect(self, destination) -> None:
        self.destination = destination

    def write(self, pts, buffers) -> None:
        if isinstance(buffers, (bytes, bytearray, memoryview, np.ndarray)):
            buffers = [buffers]
        for b in buffers:
            self.parser.write(b)

    def decode(self):
        """Decode one frame -> (left, right) float32[1152] or None."""
        frame = self.parser.parse_frame()
        if frame is None:
            return None
        self.sample_rate = frame.sample_rate
        pcm = self._synthesize(frame.samples)
        left, right = pcm[0], pcm[1]
        if self.destination is not None:
            self.destination.play(self.sample_rate, left, right)
        return left, right

    def decode_available(self):
        """Parse and synthesize every buffered frame in one batch."""
        frames = []
        while True:
            f = self.parser.parse_frame()
            if f is None:
                break
            frames.append(f)
        if not frames:
            return None
        self.sample_rate = frames[-1].sample_rate
        samples = np.concatenate([f.samples for f in frames])
        pcm = self._synthesize(samples)
        if self.destination is not None:
            n = 1152
            for i in range(len(frames)):
                self.destination.play(self.sample_rate,
                                      pcm[0, i * n:(i + 1) * n],
                                      pcm[1, i * n:(i + 1) * n])
        return pcm.reshape(2, len(frames), 1152).transpose(1, 0, 2)

    def _synthesize(self, samples: np.ndarray) -> np.ndarray:
        if self.mode == 'exact':
            pcm, self._state = mp2_synth.synthesize_exact(samples, self._state)
            return pcm
        pcm, new_chunks = _tpu_synth(jnp.asarray(samples),
                                     jnp.asarray(self._v_chunks),
                                     self._v_pos)
        self._v_chunks = np.asarray(new_chunks)
        self._v_pos = (self._v_pos - 64 * samples.shape[0]) % 1024
        return np.asarray(pcm)
