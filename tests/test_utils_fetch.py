"""fetch() must return byte-identical arrays for all routed dtypes."""

import jax.numpy as jnp
import numpy as np

from jsmpeg_tpu.utils import fetch


def test_fetch_uint8_roundtrip():
    x = np.random.default_rng(0).integers(0, 256, (48, 64), dtype=np.uint8)
    np.testing.assert_array_equal(fetch(jnp.asarray(x)), x)


def test_fetch_int8_roundtrip():
    x = np.random.default_rng(1).integers(-128, 128, (16, 32), dtype=np.int8)
    np.testing.assert_array_equal(fetch(jnp.asarray(x)), x)


def test_fetch_int32_roundtrip():
    x = np.random.default_rng(2).integers(-2**31, 2**31, (7, 9),
                                          dtype=np.int32)
    np.testing.assert_array_equal(fetch(jnp.asarray(x)), x)


def test_fetch_odd_width_uint8():
    # widths not divisible by 4 fall back to the plain path
    x = np.random.default_rng(3).integers(0, 256, (5, 7), dtype=np.uint8)
    np.testing.assert_array_equal(fetch(jnp.asarray(x)), x)


def test_fetch_3d():
    x = np.random.default_rng(4).integers(0, 256, (3, 8, 16), dtype=np.uint8)
    np.testing.assert_array_equal(fetch(jnp.asarray(x)), x)


def test_fetch_planes_packed():
    from jsmpeg_tpu.ops.frame import Planes
    from jsmpeg_tpu.utils import fetch_planes_packed
    rng = np.random.default_rng(5)
    y = rng.integers(0, 256, (32, 48), dtype=np.uint8)
    cr = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    cb = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    p = Planes(jnp.asarray(y), jnp.asarray(cr), jnp.asarray(cb))
    got = fetch_planes_packed(p)
    assert all(isinstance(a, np.ndarray) for a in got)
    np.testing.assert_array_equal(got.y, y)
    np.testing.assert_array_equal(got.cr, cr)
    np.testing.assert_array_equal(got.cb, cb)
    # numpy input passes through untouched
    again = fetch_planes_packed(got)
    assert again.y is got.y
