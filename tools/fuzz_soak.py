"""Long-running robustness soak: random fixtures x random corruption
modes through every ingest layer, plus a clean differential round each
iteration (batch pipeline vs serial-exact) so silent wrong-output bugs
surface, not just crashes.  Round 4 adds mesh rounds (random gop x tile
geometry vs serial, bit-exact) and serving-fleet rounds (N streams with
one corrupted sibling through MultiStreamDecoder in quarantine posture,
random stacked/vmap formulation: isolation must never contaminate the
clean feeds).

Runs until --seconds (or forever with 0); any failure logs a one-line
JSON reproducer {seed, mode, error} to --log and keeps going.  Exit
code 1 if any iteration failed.  CPU-backend friendly: small streams.

Usage: python tools/fuzz_soak.py [--seconds 3600] [--log /tmp/fuzz.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jax_comp')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _fixture(rng):
    from jsmpeg_tpu.testing.gen import encode_test_stream
    from jsmpeg_tpu.testing.mp2_enc import encode_stream
    from jsmpeg_tpu.testing.ts_mux import mux_av
    w = int(rng.choice([48, 96, 160]))
    h = int(rng.choice([48, 64, 96]))
    n = int(rng.integers(2, 9))
    gop = int(rng.integers(1, 5))
    f_code = int(rng.integers(1, 5))
    es, chunks = encode_test_stream(w, h, n_frames=n,
                                    seed=int(rng.integers(1 << 30)),
                                    gop=gop, f_code=f_code,
                                    full_pel=bool(rng.integers(2)))
    aes, af = encode_stream(int(rng.integers(1, 5)),
                            seed=int(rng.integers(1 << 30)))
    v = chunks[:-1]
    v[-1] += chunks[-1]
    return es, mux_av(v, 25.0, af, 1152, 44100)


def _corrupt(ts: bytes, rng, mode: str) -> bytes:
    b = bytearray(ts)
    if mode == 'bitflips':
        for _ in range(int(rng.integers(1, 60))):
            b[int(rng.integers(0, len(b)))] ^= int(rng.integers(1, 256))
    elif mode == 'truncate':
        b = b[:int(rng.integers(0, len(b)))]
    elif mode == 'garbage_prefix':
        b = bytearray(rng.integers(0, 256, int(rng.integers(1, 5000)),
                                   dtype=np.uint8).tobytes()) + b
    elif mode == 'drop_packets':
        n = len(b) // 188
        keep = [i for i in range(n) if rng.random() > 0.1]
        b = bytearray(b''.join(bytes(b[i * 188:(i + 1) * 188])
                               for i in keep))
    elif mode == 'dup_packets':
        n = len(b) // 188
        out = bytearray()
        for i in range(n):
            pkt = bytes(b[i * 188:(i + 1) * 188])
            out += pkt
            if rng.random() < 0.08:
                out += pkt
        b = out
    elif mode == 'mix':
        for m in ('drop_packets', 'bitflips'):
            b = bytearray(_corrupt(bytes(b), rng, m))
    return bytes(b)


def _drain(ts_bytes: bytes) -> None:
    from jsmpeg_tpu.demux import TSDemuxer
    from jsmpeg_tpu.models.mp2 import MP2Decoder
    from jsmpeg_tpu.models.mpeg1 import MPEG1Decoder
    dem = TSDemuxer()
    vid = MPEG1Decoder({'streaming': True})
    aud = MP2Decoder({'streaming': True})
    dem.connect(0xE0, vid)
    dem.connect(0xC0, aud)
    # random chunking exercises the resync/partial-packet paths
    rng = np.random.default_rng(len(ts_bytes))
    pos = 0
    while pos < len(ts_bytes):
        step = int(rng.integers(1, 4096))
        dem.write(ts_bytes[pos:pos + step])
        pos += step
    dem.flush()
    for _ in range(64):
        if vid.decode(eof=True) is None:
            break
    for _ in range(64):
        if aud.decode() is None:
            break


def _differential(es: bytes, rng) -> None:
    """Clean stream: the default pipeline must equal a random tuning-flag
    combination bit-for-bit (every flag is a formulation choice)."""
    from jsmpeg_tpu.models.mpeg1 import MPEG1Decoder

    def run(opts):
        d = MPEG1Decoder(opts)
        d.write(0.0, es)
        return [(np.asarray(p.y), np.asarray(p.cr), np.asarray(p.cb))
                for p in d.decode_available(eof=True)]

    flags = {'mc_method': [None, 'fused', 'fused_pair'][
                 int(rng.integers(3))],
             'block_carry': bool(rng.integers(2)),
             'wire_ids': bool(rng.integers(2))}
    a = run({})
    b = run(flags)
    assert len(a) == len(b) and len(a) > 0, flags
    for i, (fa, fb) in enumerate(zip(a, b)):
        for x, y in zip(fa, fb):
            assert np.array_equal(x, y), f'frame {i} differs: {flags}'


def _mesh_differential(es: bytes, rng) -> None:
    """Clean stream through a random (gop x tile) mesh must equal the
    serial pipeline bit-for-bit (round-4 soak extension: the mesh path
    under the same random-geometry fire as the single pipeline)."""
    import jax

    from jsmpeg_tpu.models.mpeg1 import MPEG1Decoder
    from jsmpeg_tpu.parallel.mesh import make_mesh
    from jsmpeg_tpu.parallel.packed import decode_packed_mesh
    n_dev = len(jax.devices())
    shapes = [(g, t) for g in (1, 2, 4) for t in (1, 2)
              if g * t <= n_dev]
    g, t = shapes[int(rng.integers(len(shapes)))]
    fell_back = False
    try:
        outs = decode_packed_mesh(es, make_mesh(n_gop=g, n_tile=t))
    except RuntimeError:
        return          # quirk stream needs the serial-exact path
    except ValueError as e:
        if 'halo' not in str(e) and 'GOP not closed' not in str(e):
            raise
        # MV reach beyond the tile halo / slice-gap open GOP: the raw
        # mesh API refuses (policy); the PRODUCT mesh path must instead
        # fall back off-mesh and still decode bit-exactly -- checked
        # below (round-5 soak find, seed 799)
        fell_back = True
        dm = MPEG1Decoder()
        dm.write(0.0, es)
        outs = dm.decode_available(eof=True,
                                   mesh=make_mesh(n_gop=g, n_tile=t))
    d = MPEG1Decoder()
    d.write(0.0, es)
    ref = d.decode_available(eof=True)
    tag = f'mesh {g}x{t}' + (' (off-mesh fallback)' if fell_back else '')
    assert len(outs) == len(ref), f'{tag} frame count'
    for i in range(len(ref)):
        p, r = outs[i], ref[i]
        for a, b in zip((p.y, p.cr, p.cb), (r.y, r.cr, r.cb)):
            assert np.array_equal(np.asarray(a), np.asarray(b)), \
                f'{tag} frame {i} differs'


def _streams_round(rng, mode: str) -> None:
    """Serving fleet under fire: N same-geometry streams, ONE corrupted,
    through a MultiStreamDecoder in quarantine posture (random
    stacked/vmap formulation).  The clean streams must decode bit-exactly
    regardless of what the corrupt sibling does (quarantine/demotion
    must isolate, never contaminate)."""
    from jsmpeg_tpu.models.mpeg1 import MPEG1Decoder
    from jsmpeg_tpu.parallel.streams import MultiStreamDecoder
    from jsmpeg_tpu.testing.gen import encode_test_stream
    w = int(rng.choice([48, 96]))
    h = int(rng.choice([48, 64]))
    n_streams = int(rng.integers(2, 4))
    streams = [encode_test_stream(w, h,
                                  n_frames=int(rng.integers(2, 7)),
                                  seed=int(rng.integers(1 << 30)),
                                  gop=int(rng.integers(1, 4)))[0]
               for _ in range(n_streams)]
    bad = int(rng.integers(n_streams))
    feeds = [(_corrupt(s, rng, mode) if i == bad else s)
             for i, s in enumerate(streams)]
    dec = MultiStreamDecoder(
        n_streams, batch_frames=4, quarantine=True,
        streaming=bool(rng.integers(2)),
        mode=('stacked', 'vmap', 'roundrobin')[int(rng.integers(3))])
    frames = [[] for _ in range(n_streams)]

    def harvest(outs):
        if outs is None:
            return
        for i, st in enumerate(outs):
            for f in range(st.y.shape[0]):
                frames[i].append(
                    type(st)(st.y[f], st.cr[f], st.cb[f]))

    pos = [0] * n_streams
    while any(pos[i] < len(feeds[i]) for i in range(n_streams)):
        for i in range(n_streams):
            step = int(rng.integers(1, 2048))
            dec.write(i, feeds[i][pos[i]:pos[i] + step])
            pos[i] += step
        harvest(dec.decode_batch())
    for tail in dec.decode_all(eof=True), :
        for i, fs in enumerate(tail):
            frames[i].extend(fs)
    for i, es in enumerate(streams):
        if i == bad or dec.dead[i]:
            continue
        d = MPEG1Decoder()
        d.write(0.0, es)
        ref = d.decode_available(eof=True)
        assert len(frames[i]) == len(ref), \
            f'clean stream {i} frame count under corrupt sibling'
        for k, (p, r) in enumerate(zip(frames[i], ref)):
            assert np.array_equal(np.asarray(p.y), np.asarray(r.y)), \
                f'clean stream {i} frame {k} contaminated'


MODES = ('bitflips', 'truncate', 'garbage_prefix', 'drop_packets',
         'dup_packets', 'mix')


def _elastic_failure_round(es: bytes, rng) -> None:
    """Elastic GOP-shard decode with a randomly SIGKILLed worker: the
    re-dispatched shards must still produce a bit-exact decode
    (parallel/elastic.py; SURVEY section 5 distributed recovery)."""
    import signal

    from jsmpeg_tpu.parallel.elastic import decode_gops_elastic
    from jsmpeg_tpu.parallel.multihost import index_gops
    from tests.oracle.ref_mpeg1 import OracleMPEG1

    _, ranges = index_gops(es)
    if len(ranges) < 2:
        return
    victim = int(rng.integers(0, 3))
    killed = []

    def on_assign(worker_id, pid, gop_index):
        if worker_id == victim and not killed:
            os.kill(pid, signal.SIGKILL)
            killed.append(gop_index)

    counts, frames = decode_gops_elastic(
        es, n_workers=3, worker_env={'JAX_PLATFORMS': 'cpu'},
        on_assign=on_assign)
    golden = OracleMPEG1(es).decode_all()
    assert len(frames) == len(golden), (len(frames), len(golden))
    for (y, cr, cb), (gy, gcr, gcb) in zip(frames, golden):
        assert np.array_equal(y, gy) and np.array_equal(cr, gcr) \
            and np.array_equal(cb, gcb)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('--seconds', type=float, default=3600)
    ap.add_argument('--log', default='/tmp/fuzz_soak.jsonl')
    ap.add_argument('--seed', type=int, default=None)
    args = ap.parse_args(argv)

    # honor JAX_PLATFORMS=cpu even where a platform plugin pins the
    # device backend regardless of the env var (this box's axon TPU):
    # the soak's random geometries would otherwise each pay a ~100 s
    # tunnel compile -- and the chip should stay free for real work
    if 'cpu' in os.environ.get('JAX_PLATFORMS', ''):
        import jax
        jax.config.update('jax_platforms', 'cpu')

    t_end = time.monotonic() + args.seconds if args.seconds else None
    base = args.seed if args.seed is not None else int(time.time())
    it = fails = 0
    while t_end is None or time.monotonic() < t_end:
        seed = base + it
        rng = np.random.default_rng(seed)
        mode = MODES[it % len(MODES)]
        try:
            es, ts = _fixture(rng)
            _drain(_corrupt(ts, rng, mode))
            if it % len(MODES) == 0:
                _differential(es, rng)
            if it % 3 == 1:
                _streams_round(rng, mode)
            if it % 6 == 4:
                _mesh_differential(es, rng)
            if it % 12 == 7:
                _elastic_failure_round(es, rng)
        except Exception as e:                      # log + keep going
            fails += 1
            rec = {'seed': seed, 'mode': mode, 'error': repr(e),
                   'trace': traceback.format_exc()[-2000:]}
            with open(args.log, 'a') as f:
                f.write(json.dumps(rec) + '\n')
            print(f'FAIL it={it} seed={seed} mode={mode}: {e!r}',
                  flush=True)
        it += 1
        if it % 25 == 0:
            print(f'{it} iterations, {fails} failures', flush=True)
        if it % 50 == 0:
            # the random geometry x flags sweep compiles a new XLA
            # executable per combination; unbounded in-process caching
            # OOM'd a 6h soak (LLVM 'Cannot allocate memory' then a
            # libgcc segfault).  Product processes serve a fixed
            # geometry set and don't hit this.
            import jax
            jax.clear_caches()
    print(f'done: {it} iterations, {fails} failures', flush=True)
    return 1 if fails else 0


if __name__ == '__main__':
    raise SystemExit(main())
