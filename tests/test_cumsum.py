"""indicator_cumsum must agree exactly with jnp.cumsum (it sits on the
bit-exact decode path)."""

import numpy as np
import pytest

from jsmpeg_tpu.ops.cumsum import indicator_cumsum


@pytest.mark.parametrize('n', [1, 7, 128, 129, 1024, 1025, 16384,
                               128 * 128 + 5, 393216, 691200])
def test_indicator_exact(n):
    rng = np.random.default_rng(n)
    x = rng.integers(0, 2, size=n).astype(np.int32)
    got = np.asarray(indicator_cumsum(x))
    np.testing.assert_array_equal(got, np.cumsum(x))


@pytest.mark.parametrize('vmax', [2, 6, 64, 128, 256])
def test_small_values_exact(vmax):
    rng = np.random.default_rng(vmax)
    x = rng.integers(0, vmax + 1, size=200_001).astype(np.int32)
    # keep the total below 2**24
    x = np.where(np.cumsum(x) < (1 << 24) - 300, x, 0).astype(np.int32)
    got = np.asarray(indicator_cumsum(x, vmax=vmax))
    np.testing.assert_array_equal(got, np.cumsum(x))


def test_all_ones_long():
    x = np.ones(700_000, np.int32)
    got = np.asarray(indicator_cumsum(x))
    np.testing.assert_array_equal(got, np.arange(1, 700_001))


def test_bool_input():
    x = np.zeros(130_000, bool)
    x[::7] = True
    got = np.asarray(indicator_cumsum(x))
    np.testing.assert_array_equal(got, np.cumsum(x.astype(np.int64)))
