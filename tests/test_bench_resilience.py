"""bench.py must survive a dead/hanging device backend: the driver runs
plain `python bench.py` at round end, and round 2's record was empty
because one backend-init failure killed the whole process (BENCH_r02
rc=1).  Inject the failure via bench's explicit hooks
(BENCH_FAIL_DEVICE kills the child at startup, BENCH_HANG_DEVICE wedges
it; the old JAX_PLATFORMS=bogus simulation stopped failing when the
platform plugin started ignoring the variable) and require: rc 0,
exactly one parseable JSON line, host rows present, and an `error`
field naming the cause."""

import json
import os
import pathlib
import subprocess
import sys

BENCH = str(pathlib.Path(__file__).resolve().parents[1] / 'bench.py')


def _run(extra_env, args=()):
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)
    env.update({'BENCH_FRAMES': '2', 'BENCH_SCALING': '0',
                'BENCH_DEVICE_ATTEMPTS': '2', 'BENCH_DEVICE_BACKOFF': '1',
                'BENCH_DEVICE_INIT_TIMEOUT': '15'})
    env.update(extra_env)
    out = subprocess.run([sys.executable, BENCH, *args],
                         capture_output=True, text=True, timeout=600,
                         env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith('{')]
    assert len(lines) == 1, out.stdout
    return json.loads(lines[0])


def test_bench_survives_unavailable_backend():
    row = _run({'BENCH_FAIL_DEVICE': '1'})
    assert row['metric'] == '720p_mpeg1_fps_host_parse_only'
    assert row['value'] == row['host_parse_fps'] > 0
    assert row['mp2_frames_per_s'] > 0
    assert row['ts_demux_mb_s'] > 0
    assert 'error' in row and 'device child' in row['error']


def test_bench_survives_hanging_backend():
    """A child that wedges at init (the tunneled backend's real failure
    mode) must hit the init timeout, be killed, and still leave a host
    row."""
    row = _run({'BENCH_HANG_DEVICE': '1', 'BENCH_DEVICE_ATTEMPTS': '1',
                'BENCH_DEVICE_INIT_TIMEOUT': '5'})
    assert row['metric'] == '720p_mpeg1_fps_host_parse_only'
    assert row['value'] == row['host_parse_fps'] > 0
    assert 'error' in row and 'timeout' in row['error']


def test_bench_host_only_flag():
    row = _run({}, args=('--host-only',))
    assert row['value'] == row['host_parse_fps'] > 0
    assert 'error' in row
