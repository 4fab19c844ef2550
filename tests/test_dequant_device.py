"""Device-side dequant+premultiply must equal the host parser's integer
dequant on every coefficient."""

import jax.numpy as jnp
import numpy as np

from jsmpeg_tpu import tables as T
from jsmpeg_tpu.ops.idct import dequant_premult


def _host_dequant(levels, qscale, intra, quant):
    """scalar reference of the dequant chain (mpeg1.js:793-810)."""
    out = np.zeros(64, dtype=np.int64)
    for pos in range(64):
        lv = int(levels[pos])
        if pos == 0 and intra:
            out[0] = (lv << 8) & 0xFFFFFFFF
            if out[0] >= 0x80000000:
                out[0] -= 0x100000000
            continue
        if lv == 0:
            continue
        x = lv << 1
        if not intra:
            x += -1 if x < 0 else 1
        x = (x * qscale * int(quant[pos])) >> 4
        if (x & 1) == 0:
            x -= 1 if x > 0 else -1
        x = min(max(x, -2048), 2047)
        out[pos] = x * int(T.PREMULTIPLIER_MATRIX[pos])
    return out


def test_dequant_matches_host():
    rng = np.random.default_rng(0)
    n_mb = 40
    levels = rng.integers(-255, 256, (n_mb, 6, 64)).astype(np.int16)
    levels[rng.random((n_mb, 6, 64)) < 0.7] = 0
    qscale = rng.integers(1, 32, n_mb).astype(np.uint8)
    intra = rng.random(n_mb) < 0.5
    iq = T.DEFAULT_INTRA_QUANT_MATRIX
    nq = T.DEFAULT_NON_INTRA_QUANT_MATRIX

    got = np.asarray(dequant_premult(
        jnp.asarray(levels, dtype=jnp.int32), jnp.asarray(qscale, jnp.int32),
        jnp.asarray(intra), jnp.asarray(iq, jnp.int32),
        jnp.asarray(nq, jnp.int32)))

    for m in range(n_mb):
        for b in range(6):
            exp = _host_dequant(levels[m, b], int(qscale[m]), bool(intra[m]),
                                iq if intra[m] else nq)
            np.testing.assert_array_equal(got[m, b], exp,
                                          err_msg=f'mb {m} block {b}')


def test_dequant_custom_matrices():
    rng = np.random.default_rng(1)
    n_mb = 16
    levels = rng.integers(-40, 41, (n_mb, 6, 64)).astype(np.int16)
    qscale = rng.integers(1, 32, n_mb).astype(np.uint8)
    intra = rng.random(n_mb) < 0.5
    iq = np.clip(T.DEFAULT_INTRA_QUANT_MATRIX + rng.integers(-3, 4, 64),
                 1, 255).astype(np.int32)
    nq = np.clip(16 + rng.integers(-4, 5, 64), 1, 255).astype(np.int32)
    got = np.asarray(dequant_premult(
        jnp.asarray(levels, dtype=jnp.int32), jnp.asarray(qscale, jnp.int32),
        jnp.asarray(intra), jnp.asarray(iq, jnp.int32),
        jnp.asarray(nq, jnp.int32)))
    for m in range(n_mb):
        for b in range(6):
            exp = _host_dequant(levels[m, b], int(qscale[m]), bool(intra[m]),
                                iq if intra[m] else nq)
            np.testing.assert_array_equal(got[m, b], exp)


def test_pallas_dequant_idct_bit_exact():
    """The shelved Pallas fused dequant+IDCT kernel (slower than the XLA
    fusion on v5e, demoted to tools/ -- docs/PERF_ANALYSIS.md) still
    matches the XLA path exactly (interpret mode here)."""
    import sys
    import numpy as np
    import jax.numpy as jnp
    from jsmpeg_tpu.ops.idct import dequant_premult, idct_s32
    sys.path.insert(0, str(__import__('pathlib').Path(__file__)
                           .resolve().parents[1] / 'tools'))
    from idct_pallas_shelved import dequant_idct_pallas

    rng = np.random.default_rng(3)
    n_mb = 30
    levels = rng.integers(-255, 256, (n_mb, 6, 64)).astype(np.int32)
    levels[rng.random((n_mb, 6, 64)) < 0.7] = 0
    levels[:, :, 0] = rng.integers(0, 2048, (n_mb, 6))
    qscale = rng.integers(1, 32, n_mb).astype(np.int32)
    intra = rng.random(n_mb) < 0.5
    iq = rng.integers(1, 255, 64).astype(np.int32)
    nq = rng.integers(1, 255, 64).astype(np.int32)
    ref = idct_s32(dequant_premult(
        jnp.asarray(levels), jnp.asarray(qscale), jnp.asarray(intra),
        jnp.asarray(iq), jnp.asarray(nq)).reshape(-1, 6, 8, 8))
    got = dequant_idct_pallas(
        jnp.asarray(levels), jnp.asarray(qscale), jnp.asarray(intra),
        jnp.asarray(iq), jnp.asarray(nq), interpret=True)
    np.testing.assert_array_equal(
        np.asarray(ref).reshape(n_mb, 6, 64), np.asarray(got))
