"""Backend recovery watcher: probe the tunneled TPU until it answers,
then fire the round-3 measurement campaign (tools/campaign_r3.py).

The tunneled backend has been hanging at init (the failure that emptied
BENCH_r02), so every probe runs in a SUBPROCESS with a hard timeout —
a hung init can never wedge the watcher itself.  Probe results append
to /tmp/backend_probe.jsonl; a successful probe (device visible AND a
fetch-forced op returns) launches the campaign exactly once.

Usage: python tools/watch_backend.py [--interval 120] [--once]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROBE_LOG = '/tmp/backend_probe.jsonl'

# The probe must FETCH result bytes: on this transport block_until_ready
# returns early (BASELINE.md round-2 integrity note), so only a host
# readback proves the chip executed anything.
_PROBE_CODE = (
    "import jax, numpy as np\n"
    "ds = jax.devices()\n"
    "x = jax.device_put(np.ones((8, 128), np.float32), ds[0])\n"
    "v = float(np.asarray((x * 2).sum()))\n"
    "print('PROBE_OK', len(ds), ds[0].platform, v)\n"
)


def probe(timeout_s: float) -> dict:
    t0 = time.monotonic()
    try:
        p = subprocess.run([sys.executable, '-c', _PROBE_CODE],
                           capture_output=True, text=True,
                           timeout=timeout_s, cwd=ROOT)
        ok_line = [l for l in p.stdout.splitlines()
                   if l.startswith('PROBE_OK')]
        return {'ok': p.returncode == 0 and bool(ok_line),
                'dt_s': round(time.monotonic() - t0, 1),
                'detail': (ok_line[-1] if ok_line
                           else (p.stderr.strip().splitlines() or ['?'])[-1][-200:])}
    except subprocess.TimeoutExpired:
        return {'ok': False, 'dt_s': round(time.monotonic() - t0, 1),
                'detail': f'timeout after {timeout_s}s (init hang)'}


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
    ap.add_argument('--once', action='store_true',
                    help='single probe, exit 0 iff backend answered')
    ap.add_argument('--stages', nargs='*', default=None,
                    help='campaign stages to run on recovery '
                         '(default: campaign_r3 default order)')
    args = ap.parse_args()

    while True:
        rec = probe(args.probe_timeout)
        log({'event': 'probe', **rec})
        if args.once:
            return 0 if rec['ok'] else 1
        if rec['ok']:
            log({'event': 'recovered', 'action': 'launching campaign_r3'})
            cmd = [sys.executable, 'tools/campaign_r3.py'] + (args.stages or [])
            p = subprocess.run(cmd, cwd=ROOT)
            log({'event': 'campaign_done', 'rc': p.returncode})
            return 0
        time.sleep(args.interval)


if __name__ == '__main__':
    sys.exit(main())
