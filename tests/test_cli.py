"""CLI surface (python -m jsmpeg_tpu): end-to-end decode of a muxed A/V
clip to y4m + wav, bit-exact against the oracle."""

import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope='module')
def clip(tmp_path_factory):
    from jsmpeg_tpu.testing.gen import encode_test_stream
    from jsmpeg_tpu.testing.mp2_enc import encode_stream as mp2_stream
    from jsmpeg_tpu.testing.ts_mux import mux_av
    es, chunks = encode_test_stream(80, 48, n_frames=6, seed=51, gop=3,
                                    frame_rate=25.0)
    aes, af = mp2_stream(8, seed=52)
    v = chunks[:-1]
    v[-1] += chunks[-1]
    path = tmp_path_factory.mktemp('cli') / 'clip.ts'
    path.write_bytes(mux_av(v, 25.0, af, 1152, 44100))
    return str(path), es


def test_cli_offline_decode(clip, tmp_path):
    path, es = clip
    y4m = tmp_path / 'out.y4m'
    wav = tmp_path / 'out.wav'
    r = subprocess.run(
        [sys.executable, '-m', 'jsmpeg_tpu', path, '-o', str(y4m),
         '--wav', str(wav), '--stats', '--offline'],
        capture_output=True, text=True, timeout=300,
        env={'JAX_PLATFORMS': 'cpu', 'PATH': '/usr/bin:/bin',
             'PYTHONPATH': '/root/repo',
             'HOME': '/root'})
    assert r.returncode == 0, r.stderr[-2000:]
    assert '"video_frames": 6' in r.stdout

    data = y4m.read_bytes()
    header, _, body = data.partition(b'\n')
    assert header.startswith(b'YUV4MPEG2 W80 H48 F25:1')
    frames = body.split(b'FRAME\n')[1:]
    assert len(frames) == 6
    from tests.oracle.ref_mpeg1 import OracleMPEG1
    golden = OracleMPEG1(es).decode_all()
    for i, fr in enumerate(frames):
        y = np.frombuffer(fr[:80 * 48], np.uint8).reshape(48, 80)
        np.testing.assert_array_equal(golden[i][0][:48, :80], y,
                                      err_msg=f'frame {i}')

    import wave
    w = wave.open(str(wav))
    assert w.getnchannels() == 2
    assert w.getnframes() == 8 * 1152


def test_cli_multi_input(clip, tmp_path):
    """Two inputs decode jointly (stream-parallel batch) and each output
    is byte-identical to the single-input offline decode."""
    path, es = clip
    from jsmpeg_tpu.testing.gen import encode_test_stream
    from jsmpeg_tpu.testing.ts_mux import mux_video
    es2, chunks = encode_test_stream(80, 48, n_frames=4, seed=77, gop=2,
                                     frame_rate=25.0)
    v = chunks[:-1]
    v[-1] += chunks[-1]
    other = tmp_path / 'other.ts'
    other.write_bytes(mux_video(v, 25.0))
    env = {'JAX_PLATFORMS': 'cpu', 'PATH': '/usr/bin:/bin',
           'PYTHONPATH': '/root/repo', 'HOME': '/root'}
    r = subprocess.run(
        [sys.executable, '-m', 'jsmpeg_tpu', path, str(other),
         '-o', str(tmp_path / 'm%d.y4m')],
        capture_output=True, text=True, timeout=300, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert '"video_frames": [6, 4]' in r.stdout
    r = subprocess.run(
        [sys.executable, '-m', 'jsmpeg_tpu', path, '--no-audio',
         '-o', str(tmp_path / 'solo.y4m'), '--offline'],
        capture_output=True, text=True, timeout=300, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert ((tmp_path / 'm0.y4m').read_bytes()
            == (tmp_path / 'solo.y4m').read_bytes())


def test_cli_multi_input_mesh(clip, tmp_path):
    """Multi-input + --mesh: streams' GOPs spread over a virtual device
    mesh, outputs identical to the single-chip joint decode."""
    path, es = clip
    env = {'JAX_PLATFORMS': 'cpu', 'PATH': '/usr/bin:/bin',
           'PYTHONPATH': '/root/repo', 'HOME': '/root',
           'XLA_FLAGS': '--xla_force_host_platform_device_count=8'}
    r = subprocess.run(
        [sys.executable, '-m', 'jsmpeg_tpu', path, path,
         '--mesh', '4x2', '-o', str(tmp_path / 'mm%d.y4m')],
        capture_output=True, text=True, timeout=300, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert '"video_frames": [6, 6]' in r.stdout
    r2 = subprocess.run(
        [sys.executable, '-m', 'jsmpeg_tpu', path, path,
         '-o', str(tmp_path / 'sm%d.y4m')],
        capture_output=True, text=True, timeout=300, env=env)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert ((tmp_path / 'mm0.y4m').read_bytes()
            == (tmp_path / 'sm0.y4m').read_bytes())
    assert ((tmp_path / 'mm1.y4m').read_bytes()
            == (tmp_path / 'sm1.y4m').read_bytes())
