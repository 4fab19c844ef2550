"""Round-3 on-chip measurement campaign: run the moment the tunnel
recovers.  Each stage appends one JSON line to /tmp/campaign_r3.jsonl so
a mid-run hang still leaves everything completed so far.

Stages (in order of value):
  1. bench            full bench.py -> the BENCH_r03-shaped line
  2. slopes           tools/profile_device.py scan/unpack/p2l slope rows
  3. dense            dense-stress e2e (on-chip confirmation of the 4.5x
                      CPU A/B from the frame-bucket fix)
  4. streams          tools/profile_streams.py S in {1,2,4,8} aggregate
                      (the serving amortization curve)
  5. mc               tools/profile_mc.py formulation shootout

Usage: python tools/campaign_r3.py [stages...]   (default: all)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

OUT = '/tmp/campaign_r3.jsonl'
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log_line(stage: str, payload):
    rec = {'stage': stage, 't': time.strftime('%H:%M:%S'), 'data': payload}
    with open(OUT, 'a') as f:
        f.write(json.dumps(rec) + '\n')
    print(json.dumps(rec), flush=True)


def run(cmd, timeout):
    t0 = time.monotonic()
    p = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True,
                       timeout=timeout)
    return p.returncode, p.stdout, p.stderr, time.monotonic() - t0


def stage_bench():
    rc, out, err, dt = run([sys.executable, 'bench.py'], 3600)
    line = [l for l in out.splitlines() if l.strip().startswith('{')]
    log_line('bench', {'rc': rc, 'dt_s': round(dt, 1),
                       'json': json.loads(line[-1]) if line else None,
                       'stderr_tail': err[-500:] if rc else ''})


def stage_slopes():
    rc, out, err, dt = run(
        [sys.executable, 'tools/profile_device.py'], 3600)
    log_line('slopes', {'rc': rc, 'dt_s': round(dt, 1), 'out': out[-4000:],
                        'stderr_tail': err[-500:] if rc else ''})


def stage_dense():
    code = (
        "import time, numpy as np\n"
        "import importlib.util\n"
        "spec = importlib.util.spec_from_file_location('bench','bench.py')\n"
        "bench = importlib.util.module_from_spec(spec)\n"
        "spec.loader.exec_module(bench)\n"
        "from jsmpeg_tpu.models.mpeg1 import MPEG1Decoder\n"
        "from jsmpeg_tpu.utils import fetch\n"
        "es = bench.build_dense_stream()\n"
        "def one():\n"
        "    d = MPEG1Decoder(); d.write(0.0, es)\n"
        "    t0 = time.monotonic()\n"
        "    o = d.decode_available(eof=True)\n"
        "    np.asarray(fetch(o[-1].y[:1, :4]))\n"
        "    return len(o), time.monotonic() - t0\n"
        "one()\n"
        "ts = [one()[1] for _ in range(5)]\n"
        "ts.sort()\n"
        "print('DENSE', 32 / ts[len(ts)//2], 32 / ts[0])\n")
    rc, out, err, dt = run([sys.executable, '-c', code], 2400)
    row = [l for l in out.splitlines() if l.startswith('DENSE')]
    log_line('dense', {'rc': rc, 'dt_s': round(dt, 1),
                       'fps_median_best': row[-1] if row else None,
                       'stderr_tail': err[-500:] if rc else ''})


def stage_streams():
    rc, out, err, dt = run(
        [sys.executable, 'tools/profile_streams.py'], 3600)
    log_line('streams', {'rc': rc, 'dt_s': round(dt, 1),
                         'out': out[-3000:],
                         'stderr_tail': err[-500:] if rc else ''})


def stage_mc():
    rc, out, err, dt = run(
        [sys.executable, 'tools/profile_mc.py'], 3600)
    log_line('mc', {'rc': rc, 'dt_s': round(dt, 1), 'out': out[-3000:],
                    'stderr_tail': err[-500:] if rc else ''})


_MATRIX_BEST = None     # this run's winner (stage_bench_best prefers it)


def stage_matrix():
    global _MATRIX_BEST
    rc, out, err, dt = run(
        [sys.executable, 'tools/profile_matrix.py'], 3600)
    line = [l for l in out.splitlines() if l.strip().startswith('{')]
    parsed = json.loads(line[-1]) if line else None
    if rc == 0 and parsed:
        _MATRIX_BEST = parsed.get('best')
    log_line('matrix', {'rc': rc, 'dt_s': round(dt, 1), 'json': parsed,
                        'out': out[-2000:],
                        'stderr_tail': err[-500:] if rc else ''})


def stage_bench_best():
    """Re-run the e2e bench under the matrix stage's winning flags: the
    matrix isolates the device side, but wire_ids pays +17% upload, so
    the e2e verdict (upload included) needs its own capture."""
    best, source = _MATRIX_BEST, 'this_run'
    if not best:
        # manual single-stage invocation: fall back to the log, labeled
        # as such (the winner may be from an OLDER build)
        source = 'log_fallback'
        try:
            for line in open(OUT):
                rec = (json.loads(line)
                       if line.strip().startswith('{') else {})
                if rec.get('stage') == 'matrix' and rec['data'].get('json'):
                    best = rec['data']['json'].get('best')
        except FileNotFoundError:
            pass
    if not best:
        log_line('bench_best', {'skipped': 'no matrix winner recorded'})
        return
    env = dict(os.environ)
    if best.get('mc'):
        env['JSMPEG_TPU_MC'] = best['mc']
    else:
        env.pop('JSMPEG_TPU_MC', None)    # ambient value must not taint
    env['JSMPEG_TPU_BLOCK_CARRY'] = '1' if best.get('block_carry') else '0'
    env['JSMPEG_TPU_WIRE_IDS'] = '1' if best.get('wire_ids') else '0'
    t0 = time.monotonic()
    p = subprocess.run([sys.executable, 'bench.py'], cwd=ROOT, env=env,
                       capture_output=True, text=True, timeout=3600)
    line = [l for l in p.stdout.splitlines() if l.strip().startswith('{')]
    log_line('bench_best', {
        'rc': p.returncode, 'dt_s': round(time.monotonic() - t0, 1),
        'flags': best, 'flags_source': source,
        'json': json.loads(line[-1]) if line else None,
        'stderr_tail': p.stderr[-500:] if p.returncode else ''})


STAGES = {'bench': stage_bench, 'slopes': stage_slopes,
          'dense': stage_dense, 'streams': stage_streams,
          'mc': stage_mc, 'matrix': stage_matrix,
          'bench_best': stage_bench_best}

if __name__ == '__main__':
    want = sys.argv[1:] or ['bench', 'matrix', 'bench_best', 'slopes',
                            'dense', 'streams', 'mc']
    for name in want:
        try:
            STAGES[name]()
        except Exception as e:          # keep later stages alive
            log_line(name, {'error': repr(e)})
