"""Player/decoder configuration.

One flat options object passed down the stack, mirroring the reference's
documented option names (README.md:34-60 of the reference) where they are
meaningful off-browser, plus TPU-specific knobs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional


@dataclass
class PlayerConfig:
    # reference-compatible options
    loop: bool = False
    autoplay: bool = False
    audio: bool = True
    video: bool = True
    poster: Optional[str] = None            # write first frame here (.ppm)
    streaming: bool = False                 # EVICT buffers, latest-wins decode
    max_audio_lag: float = 0.25             # maxAudioLag
    video_buffer_size: int = 512 * 1024     # videoBufferSize
    audio_buffer_size: int = 128 * 1024     # audioBufferSize
    chunk_size: int = 1024 * 1024           # progressive source chunk
    decode_first_frame: bool = True
    progressive: bool = True
    throttled: bool = True
    reconnect_interval: float = 5.0

    # callbacks (reference: onVideoDecode/onAudioDecode/onPlay/...)
    on_video_decode: Optional[Callable] = None
    on_audio_decode: Optional[Callable] = None
    on_play: Optional[Callable] = None
    on_pause: Optional[Callable] = None
    on_ended: Optional[Callable] = None
    on_stalled: Optional[Callable] = None
    on_source_established: Optional[Callable] = None
    on_source_completed: Optional[Callable] = None

    # TPU-specific
    # audio synthesis: 'exact' = bit-exact host path (C++/float64 DAG);
    # 'tpu' = MXU matmul synthesis batched on device -- float32, within
    # ~3e-5 absolute of exact on non-saturated content; it cannot
    # reproduce the reference's deliberate int32 accumulator wraparound
    # on saturated noise (bounded by tests/test_mp2_differential)
    audio_mode: str = 'exact'               # 'exact' | 'tpu'
    batch_gop: bool = True                  # batch frames through lax.scan
    mesh: Any = None                        # parallel decode mesh (optional)
    # decoder tuning flags (README 'Tuning flags' table; all bit-exact
    # formulation choices, A/B'd in bench.py).  None = the decoder's
    # default, which also honors the JSMPEG_TPU_* envs -- a set value
    # overrides the env
    wire_ids: Optional[bool] = None         # +2 B/block coded-block ids
    mc_method: Optional[str] = None         # 'fused' | 'fused_pair'
    block_carry: Optional[bool] = None      # MB-block scan carry
    inline_upload: Optional[bool] = None    # wire buffer via jit call
    prewarm: bool = False                   # compile F=1 variants at connect

    @classmethod
    def from_options(cls, options: Optional[dict]) -> 'PlayerConfig':
        """Accept a reference-style camelCase options dict."""
        if options is None:
            return cls()
        if isinstance(options, cls):
            return options
        alias = {
            'maxAudioLag': 'max_audio_lag',
            'videoBufferSize': 'video_buffer_size',
            'audioBufferSize': 'audio_buffer_size',
            'chunkSize': 'chunk_size',
            'decodeFirstFrame': 'decode_first_frame',
            'reconnectInterval': 'reconnect_interval',
            'onVideoDecode': 'on_video_decode',
            'onAudioDecode': 'on_audio_decode',
            'onPlay': 'on_play',
            'onPause': 'on_pause',
            'onEnded': 'on_ended',
            'onStalled': 'on_stalled',
            'onSourceEstablished': 'on_source_established',
            'onSourceCompleted': 'on_source_completed',
            'audioMode': 'audio_mode',
            'batchGOP': 'batch_gop',
            'wireIds': 'wire_ids',
            'mcMethod': 'mc_method',
            'blockCarry': 'block_carry',
            'inlineUpload': 'inline_upload',
        }
        kw = {}
        for k, v in options.items():
            key = alias.get(k, k)
            if key in cls.__dataclass_fields__:
                kw[key] = v
        return cls(**kw)
