"""Observability: per-stage counters/timers and a profiler trace helper.

The reference exposes per-decode timing callbacks (onVideoDecode /
onAudioDecode) and little else; this module adds structured pipeline
counters (packets, PES units, frames, macroblocks/s, stage milliseconds)
and wraps `jax.profiler` tracing for device-side inspection.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict


class StageTimer:
    """Accumulating wall-clock timers + counters keyed by stage name."""

    def __init__(self):
        self.seconds: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def time(self, stage: str, n: int = 1):
        t0 = time.monotonic()
        try:
            yield
        finally:
            self.seconds[stage] += time.monotonic() - t0
            self.counts[stage] += n

    def add(self, stage: str, n: int = 1) -> None:
        self.counts[stage] += n

    def rate(self, stage: str) -> float:
        s = self.seconds.get(stage, 0.0)
        return self.counts.get(stage, 0) / s if s else 0.0

    def summary(self) -> Dict[str, dict]:
        out = {}
        for k in sorted(set(self.seconds) | set(self.counts)):
            out[k] = {
                'count': self.counts.get(k, 0),
                'seconds': round(self.seconds.get(k, 0.0), 6),
                'per_second': round(self.rate(k), 2),
            }
        return out


@contextlib.contextmanager
def device_trace(log_dir: str = '/tmp/jsmpeg_tpu_trace'):
    """Capture a jax profiler trace around a decode region; view with
    tensorboard or xprof."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def player_stats(player) -> dict:
    """Snapshot of pipeline counters for a Player."""
    stats = {
        'ts_packets': player.demuxer.packets_parsed,
        'ts_resyncs': player.demuxer.resyncs,
        'source_progress': round(player.source.progress, 4),
        'streaming': player.streaming,
    }
    if player.video is not None:
        seq = player.video.seq
        stats['video'] = {
            'frames_parsed': getattr(player.video.parser, 'frames_parsed', 0),
            'frames_rendered': player.renderer.frames_rendered,
            'resolution': f'{seq.width}x{seq.height}' if seq else None,
            'frame_rate': player.video.frame_rate,
            'decoded_time': round(player.video.decoded_time, 4),
            'quirk_fallbacks': getattr(player.video.parser, 'quirk_leaks', 0),
        }
    if player.audio is not None:
        stats['audio'] = {
            'sample_rate': player.audio.sample_rate,
            'samples_played': player.audio_out.samples_played,
            'decoded_time': round(player.audio.decoded_time, 4),
        }
    return stats
