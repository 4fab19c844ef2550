"""Backend recovery watcher: probe the tunneled TPU until it answers,
then fire the measurement campaign (tools/campaign_r4.py by
default; --campaign selects another).

The tunneled backend has been hanging at init (the failure that emptied
BENCH_r02), so every probe runs in its OWN PROCESS GROUP with a hard
timeout and its output redirected to a temp file -- a hung init (or a
grandchild holding inherited pipes, or a D-state child) can never wedge
the watcher itself.  Probe results append to /tmp/backend_probe.jsonl;
a successful probe launches the campaign exactly once and the watcher
exits with the campaign's return code.

A probe only counts as OK when the expected platform answered with the
right VALUE: if the TPU plugin fails to load, JAX silently falls back
to the CPU backend and a platform-blind probe would launch an "on-chip"
campaign on CPU, mislabeling every captured number.

Usage: python tools/watch_backend.py [--interval 120] [--once]
                                     [--platform tpu]
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROBE_LOG = '/tmp/backend_probe.jsonl'

# The probe must FETCH result bytes: on this transport block_until_ready
# returns early (BASELINE.md round-2 integrity note), so only a host
# readback proves the chip executed anything.  It exits NONZERO unless
# the platform matches and the fetched value is exactly right
# (ones((8,128)) * 2 summed == 2048.0), so a CPU fallback or a garbage
# readback can never count as recovery.
_PROBE_CODE = (
    "import sys, jax, numpy as np\n"
    "ds = jax.devices()\n"
    "x = jax.device_put(np.ones((8, 128), np.float32), ds[0])\n"
    "v = float(np.asarray((x * 2).sum()))\n"
    "ok = ds[0].platform == sys.argv[1] and v == 2048.0\n"
    "print('PROBE_OK' if ok else 'PROBE_BAD', len(ds), ds[0].platform, v)\n"
    "sys.exit(0 if ok else 1)\n"
)


def _run_isolated(cmd, timeout_s: float, cwd: str):
    """Run cmd in its own session with stdout+stderr to a temp file; on
    timeout kill the WHOLE process group (a plain child kill leaves
    runtime grandchildren holding the pipes).  Returns (rc|None, text)."""
    with tempfile.TemporaryFile(mode='w+') as out:
        proc = subprocess.Popen(cmd, stdout=out, stderr=out, cwd=cwd,
                                start_new_session=True)
        try:
            rc = proc.wait(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                proc.kill()
            proc.wait()
            rc = None
        out.seek(0)
        return rc, out.read()


def probe(timeout_s: float, platform: str) -> dict:
    t0 = time.monotonic()
    rc, text = _run_isolated(
        [sys.executable, '-c', _PROBE_CODE, platform], timeout_s, ROOT)
    dt = round(time.monotonic() - t0, 1)
    if rc is None:
        return {'ok': False, 'dt_s': dt,
                'detail': f'timeout after {timeout_s}s (init hang)'}
    lines = [l for l in text.strip().splitlines() if l]
    marked = [l for l in lines if l.startswith('PROBE_')]
    return {'ok': rc == 0 and any(l.startswith('PROBE_OK') for l in marked),
            'dt_s': dt,
            'detail': (marked[-1] if marked
                       else (lines or ['?'])[-1][-200:])}


def log(rec: dict):
    rec = {'t': time.strftime('%Y-%m-%d %H:%M:%S'), **rec}
    with open(PROBE_LOG, 'a') as f:
        f.write(json.dumps(rec) + '\n')
    print(json.dumps(rec), flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('--interval', type=float, default=120.0,
                    help='seconds between probes')
    ap.add_argument('--probe-timeout', type=float, default=150.0,
                    help='per-probe subprocess timeout (first compile on a '
                         'healthy chip takes ~20-40s; init hang never returns)')
    ap.add_argument('--platform', default='tpu',
                    help='required jax platform (a CPU fallback must not '
                         'count as recovery)')
    ap.add_argument('--once', action='store_true',
                    help='single probe, exit 0 iff backend answered')
    ap.add_argument('--max-wait', type=float, default=0.0,
                    help='give up (exit 2) after this many seconds without '
                         'recovery; 0 = wait forever')
    ap.add_argument('--campaign', default='tools/campaign_r4.py',
                    help='campaign script to launch on recovery')
    ap.add_argument('--stages', nargs='*', default=None,
                    help='campaign stages to run on recovery '
                         '(default: the campaign default order)')
    args = ap.parse_args()

    t_start = time.monotonic()
    while True:
        rec = probe(args.probe_timeout, args.platform)
        log({'event': 'probe', **rec})
        if args.once:
            return 0 if rec['ok'] else 1
        if rec['ok']:
            log({'event': 'recovered',
                 'action': f'launching {args.campaign}'})
            cmd = [sys.executable, args.campaign] + (args.stages or [])
            p = subprocess.run(cmd, cwd=ROOT)
            log({'event': 'campaign_done', 'rc': p.returncode})
            # propagate: a supervisor must distinguish a completed
            # campaign from one that crashed right after recovery
            return p.returncode
        if args.max_wait and time.monotonic() - t_start > args.max_wait:
            log({'event': 'gave_up', 'after_s': round(time.monotonic()
                                                      - t_start, 1)})
            return 2
        time.sleep(args.interval)


if __name__ == '__main__':
    sys.exit(main())
