"""Stream-parallel amortization curve on the real chip: aggregate fps
for S in {1, 2, 4, 8} copies of the 720p bench stream through one
vmapped scan (resident wire, loop+fetch fenced).  The serving claim in
docs/SERVING.md rests on this curve: aggregate approaches S-linear
while per-step fixed costs amortize, until MXU/HBM saturates.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jax_comp')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'bench', os.path.join(os.path.dirname(__file__), '..', 'bench.py'))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    from jsmpeg_tpu.models.mpeg1 import (MPEG1Decoder,
                                         build_fused_buffer_sized, _bucket,
                                         fused_pair_bucket, mv_fits_narrow)
    from jsmpeg_tpu.ops.frame import Planes
    from jsmpeg_tpu.parallel.streams import decode_scan_fused_many
    from jsmpeg_tpu.utils import fetch

    es, _ = bench.build_stream()
    dec = MPEG1Decoder()
    dec.write(0.0, es)
    batch = dec.parser.parse_batch(32, eof=True)
    seq = dec.parser.seq
    F = 32
    n_pairs = fused_pair_bucket(len(batch['sp_pos']), len(batch['sp_esc']))
    n_runs = _bucket(max(len(batch['run_len']), 1), lo=256)
    n_blk = _bucket(max(batch['n_blocks'], 1), lo=1024)
    mvw = not mv_fits_narrow(batch['run_mv'])
    buf = build_fused_buffer_sized(batch, F, n_pairs, n_runs, seq.mb_size,
                                   mvw)
    iq = jnp.asarray(seq.intra_quant_matrix, dtype=jnp.int32)
    nq = jnp.asarray(seq.non_intra_quant_matrix, dtype=jnp.int32)
    cw, ch = seq.coded_width, seq.coded_height
    kw = dict(mb_h=seq.mb_height, mb_w=seq.mb_width, n_frames=F,
              n_blk=n_blk, n_runs=n_runs,
              band_halo=MPEG1Decoder._band_halo(batch), mv_wide=mvw)

    reps = int(os.environ.get('PROFILE_STREAMS_REPS', '10'))
    s_list = tuple(int(x) for x in os.environ.get(
        'PROFILE_STREAMS_S', '1,2,4,8').split(','))
    rows = []
    for S in s_list:
        dev = jax.device_put(np.stack([buf] * S))
        z = lambda hh, ww: jnp.zeros((S, hh, ww), dtype=jnp.uint8)
        cur = Planes(z(ch, cw), z(ch >> 1, cw >> 1), z(ch >> 1, cw >> 1))
        r = decode_scan_fused_many(cur, cur, dev, iq, nq, **kw)
        np.asarray(fetch(r[2].y[-1, -1, :1, :4]))   # warm + force
        t0 = time.monotonic()
        for _ in range(reps):
            r = decode_scan_fused_many(cur, cur, dev, iq, nq, **kw)
        np.asarray(fetch(r[2].y[-1, -1, :1, :4]))
        dt = time.monotonic() - t0
        agg = S * F * reps / dt
        rows.append({'streams': S, 'aggregate_fps': round(agg, 1),
                     'per_stream_fps': round(agg / S, 1),
                     'ms_per_joint_batch': round(dt / reps * 1e3, 1)})
        print(json.dumps(rows[-1]), flush=True)
    base = rows[0]['aggregate_fps']
    for row in rows:
        row['amortization'] = round(row['aggregate_fps']
                                    / (base * row['streams']), 3)
    print(json.dumps({'metric': 'multistream_scaling', 'rows': rows}),
          flush=True)


if __name__ == '__main__':
    main()
