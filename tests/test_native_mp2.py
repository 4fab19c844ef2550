"""C++ MP2 decoder vs Python parser + exact synthesis: bit-exact on
samples, synthesis state, and PCM."""

import numpy as np
import pytest

from jsmpeg_tpu.host.mp2_parse import MP2Parser
from jsmpeg_tpu.ops import mp2_synth
from jsmpeg_tpu.testing.mp2_enc import encode_stream

native = pytest.importorskip('jsmpeg_tpu.host.native')

if not native.native_available():
    pytest.skip('native frontend not built', allow_module_level=True)


def test_parse_and_synthesis_bit_exact():
    es, _ = encode_stream(20, seed=7)
    py = MP2Parser()
    py.write(es)
    nat = native.NativeMP2Parser()
    nat.write(es)
    st = mp2_synth.initial_state()
    n = 0
    while True:
        fp = py.parse_frame()
        fn = nat.parse_frame()
        assert (fp is None) == (fn is None)
        if fp is None:
            break
        np.testing.assert_array_equal(fp.samples, fn.samples)
        assert fp.frame_size == fn.frame_size
        assert fp.sample_rate == fn.sample_rate
        pcm_py, st = mp2_synth.synthesize_exact(fp.samples, st)
        left, right = nat.synthesize(fn.samples)
        np.testing.assert_array_equal(pcm_py[0], left)
        np.testing.assert_array_equal(pcm_py[1], right)
        n += 1
    assert n == 20


def test_decode_pcm_full_path():
    es, _ = encode_stream(12, seed=9)
    nat = native.NativeMP2Parser()
    nat.write(es)
    py = MP2Parser()
    py.write(es)
    st = mp2_synth.initial_state()
    while True:
        out = nat.decode_pcm()
        f = py.parse_frame()
        assert (out is None) == (f is None)
        if out is None:
            break
        pcm, st = mp2_synth.synthesize_exact(f.samples, st)
        np.testing.assert_array_equal(pcm[0], out[0])
        np.testing.assert_array_equal(pcm[1], out[1])


def test_state_roundtrip():
    es, _ = encode_stream(6, seed=11)
    a = native.NativeMP2Parser()
    a.write(es)
    for _ in range(3):
        a.decode_pcm()
    v, pos = a.get_state()
    b = native.NativeMP2Parser()
    b.write(es)
    b.bits.index = a.bits.index
    b.set_state(v, pos)
    ra = a.decode_pcm()
    rb = b.decode_pcm()
    np.testing.assert_array_equal(ra[0], rb[0])
    np.testing.assert_array_equal(ra[1], rb[1])


def test_chunked_writes_and_partial_frames():
    es, _ = encode_stream(8, seed=13)
    nat = native.NativeMP2Parser()
    out = []
    for i in range(0, len(es), 333):
        nat.write(es[i:i + 333])
        while True:
            r = nat.decode_pcm()
            if r is None:
                break
            out.append(r)
    py = MP2Parser()
    py.write(es)
    st = mp2_synth.initial_state()
    k = 0
    while True:
        f = py.parse_frame()
        if f is None:
            break
        pcm, st = mp2_synth.synthesize_exact(f.samples, st)
        np.testing.assert_array_equal(pcm[0], out[k][0])
        k += 1
    assert k == len(out) == 8
