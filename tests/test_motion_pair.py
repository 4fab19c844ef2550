"""motion_compensate_pair must equal two independent motion_compensate
calls bit-for-bit on every path (banded one-hot and fallbacks)."""

import numpy as np
import pytest

jax = pytest.importorskip('jax')
import jax.numpy as jnp  # noqa: E402

from jsmpeg_tpu.ops.motion import (motion_compensate,  # noqa: E402
                                   motion_compensate_pair)


@pytest.mark.parametrize('seed', range(4))
@pytest.mark.parametrize('method', ['onehot', 'gather'])
def test_pair_equals_separate(seed, method):
    rng = np.random.default_rng(seed)
    mb_h = int(rng.integers(3, 7))
    mb_w = int(rng.integers(2, 12))
    block = 8
    H, W = mb_h * block, mb_w * block
    cr = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.uint8))
    cb = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.uint8))
    mv_h = jnp.asarray(rng.integers(-29, 30, mb_h * mb_w).astype(np.int32))
    mv_v = jnp.asarray(rng.integers(-29, 30, mb_h * mb_w).astype(np.int32))
    halo = (16, 16)
    for layout in ('plane', 'block'):
        want = [np.asarray(motion_compensate(
            p, mv_h, mv_v, mb_h, mb_w, block, method=method,
            band_halo=halo, layout=layout)) for p in (cr, cb)]
        got = motion_compensate_pair((cr, cb), mv_h, mv_v, mb_h, mb_w,
                                     block, method=method, band_halo=halo,
                                     layout=layout)
        for w, g in zip(want, got):
            np.testing.assert_array_equal(w, np.asarray(g))
