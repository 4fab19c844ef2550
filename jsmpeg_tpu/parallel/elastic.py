"""Elastic GOP-shard decode: worker failure re-dispatches the shard.

SURVEY.md section 5 (failure detection / recovery) prescribes the
distributed posture: "host failure = re-decode that GOP shard (GOPs are
idempotent work units)".  The jax.distributed collective fabric cannot
lose a member mid-job (a dead process stalls every collective), so
recovery lives one level above it -- the same place the reference keeps
its own resilience (stream-level reconnect/retry, websocket.js:63-70,
ajax-progressive.js:88-93): a coordinator hands closed-GOP byte ranges
to worker processes and re-queues the in-flight range of any worker
that dies (SIGKILL, crash, socket loss).  Results are idempotent files
keyed by GOP index, so a re-run of the same shard is harmless.

  coordinator: decode_gops_elastic(es, n_workers=3)
  worker:      python -m jsmpeg_tpu.parallel.elastic <host> <port> \
                   <es_path> <outdir>

Workers run the standard single-host decode path on their local backend;
each GOP range is primed with the shared sequence-header prefix, exactly
like the jax.distributed multihost path (multihost.parse_gop_range).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

from .multihost import index_gops


def _send(sock: socket.socket, obj: dict) -> None:
    sock.sendall((json.dumps(obj) + '\n').encode())


class _LineReader:
    def __init__(self, sock: socket.socket):
        self._f = sock.makefile('r')

    def recv(self) -> Optional[dict]:
        line = self._f.readline()
        if not line:
            return None
        return json.loads(line)


def decode_gops_elastic(es: bytes, n_workers: int = 3,
                        outdir: Optional[str] = None,
                        worker_env: Optional[dict] = None,
                        on_assign=None, timeout: float = 300.0):
    """Decode an elementary stream by sharding closed GOPs over
    `n_workers` worker processes with failure recovery: a worker that
    dies mid-shard has its shard re-queued to the survivors.

    Returns (n_frames_per_gop, frames): frames is the full ordered list
    of decoded Planes-as-numpy (y, cr, cb) tuples, bit-exact to a serial
    decode.  `on_assign(worker_id, pid, gop_index)` is a test hook fired
    before each job send (e.g. to SIGKILL a worker mid-run).  Raises
    RuntimeError when every worker died with shards outstanding."""
    import tempfile

    header, ranges = index_gops(es)
    if not ranges:
        return [], []
    own_tmp = outdir is None
    tmp = tempfile.mkdtemp(prefix='jsmpeg_elastic_') if own_tmp else outdir
    es_path = os.path.join(tmp, 'stream.es')
    with open(es_path, 'wb') as f:
        f.write(es)

    srv = socket.socket()
    srv.bind(('127.0.0.1', 0))
    srv.listen(n_workers)
    srv.settimeout(timeout)
    port = srv.getsockname()[1]

    env = dict(os.environ)
    if worker_env:
        env.update(worker_env)
    procs = [subprocess.Popen(
        [sys.executable, '-m', 'jsmpeg_tpu.parallel.elastic',
         '127.0.0.1', str(port), es_path, tmp],
        env=env, cwd=os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))))
        for _ in range(n_workers)]

    jobs: List[Tuple[int, int, int, int]] = [
        (gi, s, e, n) for gi, (s, e, n) in enumerate(ranges)]
    pending = list(reversed(jobs))         # pop() serves in stream order
    done: set = set()
    lock = threading.Condition()
    alive = [0]                            # incremented per started handler

    def handle(worker_id: int, sock: socket.socket, pid: int):
        reader = _LineReader(sock)
        try:
            if reader.recv() is None:      # ready handshake
                return
            while True:
                with lock:
                    while not pending and len(done) < len(jobs):
                        lock.wait(0.1)
                    if len(done) >= len(jobs):
                        return
                    job = pending.pop()
                if on_assign is not None:
                    on_assign(worker_id, pid, job[0])
                try:
                    _send(sock, {'gop': job[0], 'start': job[1],
                                 'end': job[2], 'n': job[3]})
                    r = reader.recv()
                except OSError:
                    r = None
                if r is None or r.get('done') != job[0]:
                    # worker died mid-shard: re-queue for the survivors
                    with lock:
                        if job[0] not in done:
                            pending.append(job)
                        lock.notify_all()
                    return
                with lock:
                    done.add(job[0])
                    lock.notify_all()
        finally:
            with lock:
                alive[0] -= 1
                lock.notify_all()
            try:
                _send(sock, {'quit': True})
            except OSError:
                pass
            sock.close()

    threads = []
    try:
        # Accept within a bounded window and proceed with whoever showed
        # up: a worker that crashes at startup (observed rarely under
        # load) must not stall the whole decode -- survivors absorb its
        # shards exactly like a mid-run death.  Zero workers is fatal.
        import time as _time
        deadline = _time.monotonic() + min(60.0, timeout)
        for w in range(n_workers):
            with lock:
                if len(done) >= len(jobs):
                    break       # early workers already finished the job
            try:
                srv.settimeout(max(1.0, deadline - _time.monotonic()))
                conn, _ = srv.accept()
            except (TimeoutError, OSError):
                break
            # a WEDGED worker (alive but never replying) must not hold
            # its shard forever: recv times out -> OSError -> re-queue
            conn.settimeout(timeout)
            with lock:
                alive[0] += 1
            t = threading.Thread(target=handle,
                                 args=(w, conn, procs[w].pid), daemon=True)
            t.start()
            threads.append(t)
        if not threads:
            raise RuntimeError('no elastic workers connected')
        with lock:
            while len(done) < len(jobs):
                if alive[0] == 0:
                    raise RuntimeError(
                        f'all workers died with {len(jobs) - len(done)} '
                        f'GOP shards outstanding')
                lock.wait(0.2)
        for t in threads:
            t.join(timeout=10)
    finally:
        srv.close()
        for p in procs:
            if p.poll() is None:
                p.terminate()
        for p in procs:
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()

    frames = []
    counts = []
    for gi in range(len(ranges)):
        with np.load(os.path.join(tmp, f'gop_{gi}.npz')) as z:
            y, cr, cb = z['y'], z['cr'], z['cb']
        counts.append(len(y))
        for i in range(len(y)):
            frames.append((y[i], cr[i], cb[i]))
    if own_tmp:
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
    return counts, frames


def _range_closed(header: bytes, chunk: bytes) -> bool:
    """True when this GOP byte range is an independent decode unit: its
    first two frames cover every macroblock (written or intra).  A
    slice-gap MB there would expose pre-GOP stale plane content
    (parallel/packed.gop_closed semantics), which a from-zero range
    decode cannot reproduce."""
    from ..host import best_parser
    p = best_parser()
    p.write(header + chunk)
    for _ in range(2):
        fd = p.parse_frame(eof=True)
        if fd is None:
            return True
        if not bool((np.asarray(fd.written) | np.asarray(fd.intra)).all()):
            return False
    return True


def _worker_main(host: str, port: int, es_path: str, outdir: str) -> None:
    # virtual-CPU test runs: the axon plugin pins the TPU backend unless
    # the platform is forced after import (tests/conftest.py pattern)
    if 'cpu' in os.environ.get('JAX_PLATFORMS', ''):
        import jax
        jax.config.update('jax_platforms', 'cpu')
    from ..models.mpeg1 import MPEG1Decoder

    with open(es_path, 'rb') as f:
        es = f.read()
    header, _ = index_gops(es)

    sock = socket.create_connection((host, port))
    reader = _LineReader(sock)
    _send(sock, {'ready': True})
    die_after = int(os.environ.get('JSMPEG_ELASTIC_DIE_AFTER', '-1'))
    hang_after = int(os.environ.get('JSMPEG_ELASTIC_HANG_AFTER', '-1'))
    jobs_done = 0
    while True:
        msg = reader.recv()
        if msg is None or msg.get('quit'):
            return
        gi, s, e = msg['gop'], msg['start'], msg['end']
        if die_after >= 0 and jobs_done >= die_after:
            os._exit(137)          # simulated SIGKILL mid-shard
        if hang_after >= 0 and jobs_done >= hang_after:
            import time
            while True:            # simulated wedge: alive, never replies
                time.sleep(60)
        from ..utils import fetch
        dec = MPEG1Decoder()
        if _range_closed(header, es[s:e]):
            dec.write(0.0, header + es[s:e])
            outs = dec.decode_available(eof=True)
        else:
            # slice-gap GOP depends on pre-GOP plane content: decode the
            # whole prefix (bit-exact stale-pixel semantics) and keep
            # only this range's frames.  Slower, still idempotent.
            dec.write(0.0, es[:e])
            allf = dec.decode_available(eof=True)
            k = int(msg.get('n') or 0)
            outs = [allf[i] for i in range(len(allf) - k, len(allf))]
        z = np.zeros((0, 0, 0), np.uint8)
        y = np.stack([fetch(o.y) for o in outs]) if outs else z
        cr = np.stack([fetch(o.cr) for o in outs]) if outs else z
        cb = np.stack([fetch(o.cb) for o in outs]) if outs else z
        tmp_path = os.path.join(outdir, f'gop_{gi}.npz.tmp{os.getpid()}')
        with open(tmp_path, 'wb') as f:
            np.savez(f, y=y, cr=cr, cb=cb)
        os.replace(tmp_path, os.path.join(outdir, f'gop_{gi}.npz'))
        jobs_done += 1
        _send(sock, {'done': gi})


if __name__ == '__main__':
    _worker_main(sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4])
