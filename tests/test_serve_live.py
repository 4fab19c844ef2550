"""Joint live serving (tools/serve.py): two TCP feeds dribbling MPEG-TS
at different rates decode jointly and bit-exactly vs serial."""

import io
import socket
import threading
import time

import numpy as np
import pytest

from jsmpeg_tpu.models.mpeg1 import MPEG1Decoder
from jsmpeg_tpu.testing.gen import encode_test_stream
from jsmpeg_tpu.testing.ts_mux import mux_video
from tests.oracle.ref_mpeg1 import OracleMPEG1


def _clip(seed, n_frames=6):
    es, chunks = encode_test_stream(64, 48, n_frames=n_frames, seed=seed,
                                    gop=3)
    v = chunks[:-1]
    v[-1] = v[-1] + chunks[-1]
    return es, mux_video(v, 25.0)


def _tcp_server(ts, delay):
    """One-shot TCP server: accepts a client, dribbles `ts` in chunks,
    then holds the socket open (a live feed never EOFs)."""
    srv = socket.socket()
    srv.bind(('127.0.0.1', 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    done = threading.Event()

    def run():
        conn, _ = srv.accept()
        for off in range(0, len(ts), 752):
            conn.sendall(ts[off:off + 752])
            time.sleep(delay)
        done.set()
        time.sleep(8)        # hold open past the client's deadline
        conn.close()
        srv.close()

    threading.Thread(target=run, daemon=True).start()
    return port, done


def test_joint_live_tcp_feeds(tmp_path):
    import sys
    sys.path.insert(0, 'tools')
    from serve import serve

    es_a, ts_a = _clip(61)
    es_b, ts_b = _clip(62)
    pa, done_a = _tcp_server(ts_a, 0.004)
    pb, done_b = _tcp_server(ts_b, 0.02)      # slower feed

    out = str(tmp_path / 's%d.y4m')
    stats = serve([f'tcp://127.0.0.1:{pa}', f'tcp://127.0.0.1:{pb}'],
                  out_pattern=out, batch=4, interval=0.02, seconds=6.0)
    assert done_a.is_set() and done_b.is_set(), 'feeds did not finish'
    assert stats['video_frames'] == [6, 6]

    for i, es in enumerate((es_a, es_b)):
        golden = OracleMPEG1(es).decode_all()
        data = (tmp_path / f's{i}.y4m').read_bytes()
        frames = data.split(b'FRAME\n')[1:]
        assert len(frames) == 6, f'stream {i}'
        for k, fr in enumerate(frames):
            y = np.frombuffer(fr[:64 * 48], np.uint8).reshape(48, 64)
            np.testing.assert_array_equal(golden[k][0][:48, :64], y,
                                          err_msg=f's{i} f{k}')


def test_serve_static_av_with_audio(tmp_path):
    """Static A/V inputs through serve(): per-stream wav rides the host
    MP2 path and matches a serial decode byte-for-byte."""
    import sys
    sys.path.insert(0, 'tools')
    from serve import serve

    from jsmpeg_tpu.models.mp2 import MP2Decoder
    from jsmpeg_tpu.sinks import WavWriter
    from jsmpeg_tpu.testing.mp2_enc import encode_stream as mp2_stream
    from jsmpeg_tpu.testing.ts_mux import mux_av

    paths = []
    audio_es = []
    for seed in (71, 72):
        es, chunks = encode_test_stream(64, 48, n_frames=4, seed=seed,
                                        gop=2)
        aes, af = mp2_stream(5, seed=seed)
        v = chunks[:-1]
        v[-1] = v[-1] + chunks[-1]
        p = tmp_path / f'in{seed}.ts'
        p.write_bytes(mux_av(v, 25.0, af, 1152, 44100))
        paths.append(str(p))
        audio_es.append(aes)

    stats = serve(paths, out_pattern=str(tmp_path / 'v%d.y4m'),
                  wav_pattern=str(tmp_path / 'a%d.wav'), batch=4,
                  interval=0.01, seconds=30.0)
    assert stats['video_frames'] == [4, 4]
    for i, aes in enumerate(audio_es):
        ref_path = tmp_path / f'ref{i}.wav'
        ad = MP2Decoder()
        ad.connect(WavWriter(str(ref_path)))
        ad.write(0.0, aes)
        ad.decode_available()
        ad.destination.close()
        got = (tmp_path / f'a{i}.wav').read_bytes()
        assert len(got) > 44 and got == ref_path.read_bytes(), f'wav {i}'


def test_stalled_feed_does_not_block(tmp_path):
    """Head-of-line isolation: feed B sends one GOP then stalls; feed A
    must still decode ALL its frames within the deadline."""
    import sys
    sys.path.insert(0, 'tools')
    from serve import serve

    es_a, ts_a = _clip(63)
    _, ts_b = _clip(64)
    pa, done_a = _tcp_server(ts_a, 0.004)
    pb, _ = _tcp_server(ts_b[:400], 0.004)    # truncated: stalls forever

    stats = serve([f'tcp://127.0.0.1:{pa}', f'tcp://127.0.0.1:{pb}'],
                  out_pattern=str(tmp_path / 'hb%d.y4m'), batch=4,
                  interval=0.02, seconds=5.0)
    assert done_a.is_set()
    assert stats['video_frames'][0] == 6, 'stalled feed blocked the batch'

    golden = OracleMPEG1(es_a).decode_all()
    data = (tmp_path / 'hb0.y4m').read_bytes()
    frames = data.split(b'FRAME\n')[1:]
    assert len(frames) == 6
    y = np.frombuffer(frames[-1][:64 * 48], np.uint8).reshape(48, 64)
    np.testing.assert_array_equal(golden[-1][0][:48, :64], y)
