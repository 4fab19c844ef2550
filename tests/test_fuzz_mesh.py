"""Randomized mesh-vs-serial differential fuzz: random realistic streams
(varied size, GOP structure, qscale, motion) decoded on a ('gop','tile')
mesh must equal the serial single-chip pipeline bit-for-bit.  Hardens the
parallel wire split, halo exchange and carry threading beyond the crafted
cases in test_packed_mesh.py."""

import numpy as np
import pytest

jax = pytest.importorskip('jax')

from jsmpeg_tpu.host.native import native_available
from jsmpeg_tpu.models.mpeg1 import MPEG1Decoder
from jsmpeg_tpu.parallel.mesh import make_mesh
from jsmpeg_tpu.parallel.packed import decode_packed_mesh
from jsmpeg_tpu.testing.gen import encode_realistic_stream

pytestmark = pytest.mark.skipif(not native_available(),
                                reason='native parser required')


def _serial(es):
    dec = MPEG1Decoder()
    dec.write(0.0, es)
    outs = dec.decode_available(eof=True)
    return [(np.asarray(p.y), np.asarray(p.cr), np.asarray(p.cb))
            for p in outs]


@pytest.mark.parametrize('seed', range(6))
def test_random_stream_mesh_bit_exact(seed):
    rng = np.random.default_rng(1000 + seed)
    # mb_h must be shardable: multiples of n_tile rows with halo <= rows
    # per tile handled by the driver's padding; sizes stay small for CI
    w = int(rng.choice([64, 96, 128]))
    h = int(rng.choice([96, 128]))
    n_frames = int(rng.integers(4, 13))
    gop = int(rng.choice([2, 3, 4, 6]))
    es, _ = encode_realistic_stream(w, h, n_frames=n_frames,
                                    seed=int(rng.integers(1 << 30)),
                                    gop=gop)
    ref = _serial(es)
    n_gop, n_tile = [(4, 2), (2, 2), (8, 1), (2, 4)][seed % 4]
    mesh = make_mesh(n_gop=n_gop, n_tile=n_tile)
    outs = decode_packed_mesh(es, mesh)
    assert len(outs) == len(ref) == n_frames
    for i, p in enumerate(outs):
        got = (np.asarray(p.y), np.asarray(p.cr), np.asarray(p.cb))
        for a, b in zip(got, ref[i]):
            np.testing.assert_array_equal(
                a, b, err_msg=f'seed {seed} frame {i} ({w}x{h} gop={gop})')
