"""Cross-product A/B of the device-scan tuning flags at 720p.

bench.py measures each flag in isolation; the production default should
be the best COMBINATION, and the flags touch different costs (MC
formulation vs carry relayouts vs coded-ordinal computation) so their
effects may compose.  This stage times every
{mc_method} x {block_carry} x {wire_ids} variant on the same resident
wire buffer (loop + fetch fencing, docs/PERF_ANALYSIS.md methodology),
checks each against the default output bit-for-bit, and prints a table
plus one JSON line with the winner — the data needed to flip defaults
in one shot when the chip answers.

An optional positional arg selects the stream: 720p (default; the
campaign's matrix stage), dense, or 1080p.  The dense/1080p sweeps are
manual chip-side tools: they time one whole-batch scan, NOT the
product's split-group dispatch, so read them as flag deltas only.
"""

from __future__ import annotations

import itertools
import json
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jax_comp')

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jsmpeg_tpu.models.mpeg1 import (MPEG1Decoder, build_fused_buffer,
                                     decode_scan_fused)
from jsmpeg_tpu.ops.frame import Planes
from jsmpeg_tpu.utils import fetch

F = 32
REPS = 10


def bench_stream() -> bytes:
    """The same cached realistic stream bench.py uses."""
    import bench
    return bench.build_stream()[0]


def main():
    which = (sys.argv[1] if len(sys.argv) > 1 else '720p')
    if os.environ.get('JSMPEG_MATRIX_SMALL'):
        # CPU smoke mode: tiny stream, the same 12-variant sweep
        if which != '720p':
            raise SystemExit('JSMPEG_MATRIX_SMALL runs its own tiny '
                             'stream; drop the stream selector')
        from jsmpeg_tpu.testing.gen import encode_test_stream
        es, _ = encode_test_stream(160, 96, n_frames=8, seed=6, gop=4)
        which = 'small'
        globals().update(F=8, REPS=2)
    elif which == 'dense':
        import bench
        es = bench.build_dense_stream()
    elif which == '1080p':
        cache = '/tmp/jsmpeg_tpu_bench_1920x1080_32.es'
        if os.path.exists(cache):
            es = open(cache, 'rb').read()
        else:
            from jsmpeg_tpu.testing.gen import encode_realistic_stream
            es, _ = encode_realistic_stream(1920, 1080, n_frames=32,
                                            seed=7, gop=8)
            open(cache, 'wb').write(es)
    else:
        es = bench_stream()
    dec = MPEG1Decoder()
    dec.write(0.0, es)
    batch = dec.parser.parse_batch(F, eof=True)
    seq = dec.parser.seq
    cw, ch = seq.coded_width, seq.coded_height
    z = lambda hh, ww: jnp.zeros((hh, ww), dtype=jnp.uint8)
    cur = Planes(z(ch, cw), z(ch >> 1, cw >> 1), z(ch >> 1, cw >> 1))
    fwd = Planes(z(ch, cw), z(ch >> 1, cw >> 1), z(ch >> 1, cw >> 1))
    iq = jnp.asarray(seq.intra_quant_matrix, dtype=jnp.int32)
    nq = jnp.asarray(seq.non_intra_quant_matrix, dtype=jnp.int32)
    halo = MPEG1Decoder._band_halo(batch)

    wires = {}
    for ids in (False, True):
        buf, n_blk, n_runs, mvw, n_pairs, n_esc = build_fused_buffer(
            batch, F, seq.mb_size, wire_ids=ids)
        wires[ids] = (jax.device_put(buf),
                      dict(mb_h=seq.mb_height, mb_w=seq.mb_width,
                           n_frames=F, n_blk=n_blk, n_runs=n_runs,
                           n_pairs=n_pairs, n_esc=n_esc, band_halo=halo,
                           mv_wide=mvw, wire_ids=ids))

    want = None
    results = []
    for mc, bc, ids in itertools.product((None, 'fused', 'fused_pair'),
                                         (False, True), (False, True)):
        dev, kw = wires[ids]
        run = lambda: decode_scan_fused(cur, fwd, dev, iq, nq,
                                        block_carry=bc, mc_method=mc, **kw)
        r = run()
        got = np.asarray(jax.device_get(r[2].y[-1]))
        if want is None:
            want = got
        assert np.array_equal(want, got), (mc, bc, ids)   # bit-exact
        np.asarray(fetch(r[2].y[-1, :1, :4]))             # warm + force
        t0 = time.monotonic()
        for _ in range(REPS):
            r = run()
        np.asarray(fetch(r[2].y[-1, :1, :4]))
        fps = round(F * REPS / (time.monotonic() - t0), 2)
        tag = f"mc={mc or 'onehot':<10} bc={int(bc)} ids={int(ids)}"
        print(f'{tag}  {fps:8.1f} fps', flush=True)
        results.append({'mc': mc, 'block_carry': bc, 'wire_ids': ids,
                        'fps': fps})

    best = max(results, key=lambda r: r['fps'])
    print(json.dumps({'metric': f'device_matrix_{which}',
                      'rows': results, 'best': best}), flush=True)


if __name__ == '__main__':
    main()
