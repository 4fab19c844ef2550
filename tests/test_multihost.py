"""Multi-host decode: 2 processes x 4 virtual CPU devices each join one
jax.distributed runtime; each parses only its own GOP byte ranges and
decodes its shards of the global mesh bit-exactly (parallel/multihost.py).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from jsmpeg_tpu.host.native import native_available
from jsmpeg_tpu.parallel.multihost import index_gops

pytestmark = pytest.mark.skipif(not native_available(),
                                reason='native parser required')

_WORKER = os.path.join(os.path.dirname(__file__), '_mh_worker.py')


def _free_port():
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


def test_index_gops_matches_parse():
    """The start-code GOP index agrees with the VLC parse: same GOP
    count, same frame counts, and ranges re-parse to the same frames."""
    from jsmpeg_tpu.host import best_parser
    from jsmpeg_tpu.parallel.gop import split_at_iframes
    from jsmpeg_tpu.parallel.multihost import parse_gop_range
    from jsmpeg_tpu.parallel.packed import split_packed_frames
    from jsmpeg_tpu.testing.gen import encode_realistic_stream

    es, _ = encode_realistic_stream(96, 64, n_frames=11, seed=9, gop=4)
    header, ranges = index_gops(es)
    parser = best_parser()
    parser.write(es)
    frames = []
    while True:
        b = parser.parse_batch(32, eof=True)
        if b is None:
            break
        frames.extend(split_packed_frames(b))
        if b['n'] < 32:
            break
    gops = split_at_iframes(frames, lambda f: f['pic_type'])
    assert len(ranges) == len(gops)
    assert [r[2] for r in ranges] == [len(g) for g in gops]
    # each indexed range re-parses to the same per-frame wire bytes
    off = 0
    for (s, e, n), gop in zip(ranges, gops):
        _, got = parse_gop_range(header, es, s, e)
        assert len(got) == len(gop)
        for a, b in zip(got, gop):
            for k in ('run_len', 'run_flags', 'run_cbp', 'run_mv',
                      'sp_pos', 'sp_v8', 'sp_esc'):
                np.testing.assert_array_equal(a[k], b[k])
        off += n


def _run_workers(n_proc, n_tile, timeout=300):
    port = _free_port()
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)       # worker sets its own device count
    env.pop('JSMPEG_TPU_TESTS', None)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(_WORKER)))
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(port), str(n_proc), str(pid),
         str(n_tile)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True, cwd=repo_root) for pid in range(n_proc)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'worker {pid} failed:\n{out}'
        assert 'bit-exact' in out


@pytest.mark.parametrize('n_tile', [1, 2])
def test_two_process_decode(n_tile):
    _run_workers(2, n_tile)


def test_four_process_tiled_decode():
    """4 hosts x 4 virtual devices, n_tile=2 (an 8x2 global mesh): shakes
    out bucket agreement (allgather over 4 processes) and the
    addressable-shard readout when hosts own multiple gop rows."""
    _run_workers(4, 2, timeout=600)
