"""Round-4 on-chip measurement campaign.  Each stage appends one JSON
line to /tmp/campaign_r4.jsonl so a mid-run hang still leaves everything
completed so far.

Stages (in order of value):
  1. bench       full bench.py -> the BENCH_r04-shaped line (fused-MC
                 defaults + stacked multistream + upload/attribution rows)
  2. streams     tools/profile_streams.py S in {1,2,4,8}, stacked + vmap
                 (the serving formulation decision)
  3. stacked     tools/profile_stacked.py piecewise stage scaling
  4. dense       tools/profile_device.py on the 28 Mbit/s stress stream
  5. p1080       tools/profile_device.py on the 1080p stream
  6. matrix      tools/profile_matrix.py flag cross-product (defaults
                 sanity: fused MC must still be the winner)

Usage: python tools/campaign_r4.py [stages...]   (default: all)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

OUT = '/tmp/campaign_r4.jsonl'
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log_line(stage: str, payload):
    rec = {'stage': stage, 't': time.strftime('%H:%M:%S'), 'data': payload}
    with open(OUT, 'a') as f:
        f.write(json.dumps(rec) + '\n')
    print(json.dumps(rec), flush=True)


def run(cmd, timeout, env=None):
    t0 = time.monotonic()
    e = dict(os.environ)
    e.update(env or {})
    p = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True,
                      timeout=timeout, env=e)
    return p.returncode, p.stdout, p.stderr, time.monotonic() - t0


def stage_bench():
    rc, out, err, dt = run([sys.executable, 'bench.py'], 5400)
    line = [l for l in out.splitlines() if l.strip().startswith('{')]
    log_line('bench', {'rc': rc, 'dt_s': round(dt, 1),
                       'json': json.loads(line[-1]) if line else None,
                       'stderr_tail': err[-500:] if rc else ''})


def stage_streams():
    rc, out, err, dt = run(
        [sys.executable, 'tools/profile_streams.py'], 5400)
    log_line('streams', {'rc': rc, 'dt_s': round(dt, 1),
                         'out': out[-4000:],
                         'stderr_tail': err[-500:] if rc else ''})


def stage_stacked():
    rc, out, err, dt = run(
        [sys.executable, 'tools/profile_stacked.py'], 5400)
    log_line('stacked', {'rc': rc, 'dt_s': round(dt, 1),
                         'out': out[-4000:],
                         'stderr_tail': err[-500:] if rc else ''})


def stage_dense():
    rc, out, err, dt = run(
        [sys.executable, 'tools/profile_device.py'], 3600,
        env={'PROF_STREAM': 'dense'})
    log_line('dense', {'rc': rc, 'dt_s': round(dt, 1), 'out': out[-4000:],
                       'stderr_tail': err[-500:] if rc else ''})


def stage_p1080():
    rc, out, err, dt = run(
        [sys.executable, 'tools/profile_device.py'], 3600,
        env={'PROF_STREAM': '1080p'})
    log_line('p1080', {'rc': rc, 'dt_s': round(dt, 1), 'out': out[-4000:],
                       'stderr_tail': err[-500:] if rc else ''})


def stage_matrix():
    rc, out, err, dt = run(
        [sys.executable, 'tools/profile_matrix.py'], 5400)
    line = [l for l in out.splitlines() if l.strip().startswith('{')]
    log_line('matrix', {'rc': rc, 'dt_s': round(dt, 1),
                        'json': json.loads(line[-1]) if line else None,
                        'out': out[-2000:],
                        'stderr_tail': err[-500:] if rc else ''})


STAGES = {'bench': stage_bench, 'streams': stage_streams,
          'stacked': stage_stacked, 'dense': stage_dense,
          'p1080': stage_p1080, 'matrix': stage_matrix}


def main():
    names = sys.argv[1:] or list(STAGES)
    for name in names:
        try:
            STAGES[name]()
        except Exception as e:                     # noqa: BLE001
            log_line(name, {'error': repr(e)})


if __name__ == '__main__':
    main()
