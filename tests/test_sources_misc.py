"""HTTP source, buffer caps, callbacks, metrics."""

import http.server
import threading
import time

import numpy as np
import pytest

from jsmpeg_tpu.metrics import StageTimer, player_stats
from jsmpeg_tpu.player import Player
from jsmpeg_tpu.sinks import VideoCollector
from jsmpeg_tpu.testing.gen import encode_test_stream
from jsmpeg_tpu.testing.ts_mux import mux_video
from tests.oracle.ref_mpeg1 import OracleMPEG1


def _ts(seed=91, n=4):
    es, chunks = encode_test_stream(48, 32, n_frames=n, seed=seed, gop=2)
    v = chunks[:-1]
    v[-1] = v[-1] + chunks[-1]
    return es, mux_video(v, 25.0)


@pytest.fixture(scope='module')
def http_server(tmp_path_factory):
    root = tmp_path_factory.mktemp('www')
    es, ts = _ts()
    (root / 'clip.ts').write_bytes(ts)

    class Handler(http.server.SimpleHTTPRequestHandler):
        def translate_path(self, path):
            return str(root / path.lstrip('/'))

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(('127.0.0.1', 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f'http://127.0.0.1:{srv.server_port}/clip.ts', es
    srv.shutdown()


def test_http_progressive_source(http_server):
    url, es = http_server
    vc = VideoCollector()
    p = Player(url, {'chunkSize': 700}, renderer=vc)
    p.run()
    golden = OracleMPEG1(es).decode_all()
    assert vc.frames_rendered == len(golden) == 4
    for (gy, _, _), (py, _, _) in zip(golden, vc.frames):
        assert np.array_equal(gy, py)


def test_adaptive_throttle_slow_source(tmp_path):
    """The progressive throttle must scale with measured chunk load time
    (reference src/ajax-progressive.js:47-58: worst case = loadTime*8+2):
    a slow medium prefetches at high headroom, a fast one does not."""
    from jsmpeg_tpu.sources import ProgressiveFileSource
    path = tmp_path / 'clip.bin'
    path.write_bytes(b'x' * 4096)
    src = ProgressiveFileSource(str(path), chunk_size=512)
    got = []

    class Dest:
        def write(self, b):
            got.append(len(b))
    src.connect(Dest())
    src.start()
    # fast source (local file, ~0 load time): 3 s headroom > 0*8+2 -> hold
    src.resume(3.0)
    assert len(got) == 1
    # slow source: simulate a 0.5 s measured chunk load -> worst case 6 s;
    # the same 3 s headroom must now trigger a prefetch
    src._load_time = 0.5
    src.resume(3.0)
    assert len(got) == 2
    # and low headroom still loads regardless of speed
    src._load_time = 0.0
    src.resume(1.0)
    assert len(got) == 3


def test_render_progress_surface():
    """render_progress draws a stderr-style bar when a stream is attached
    (reference loading bar: src/canvas2d.js:36-46) and stays silent
    otherwise."""
    import io

    from jsmpeg_tpu.sinks import VideoCollector
    vc = VideoCollector()
    vc.render_progress(0.5)            # silent: no stream attached
    buf = io.StringIO()
    vc.progress_stream = buf
    vc.render_progress(0.25)
    vc.render_progress(0.253)          # <1% delta: no redraw
    vc.render_progress(1.0)
    out = buf.getvalue()
    assert ' 25%' in out and '100%' in out
    assert out.count('\r') == 2 and out.endswith('\n')


def test_http_whole_file(http_server):
    url, es = http_server
    vc = VideoCollector()
    p = Player(url, {'progressive': False}, renderer=vc)
    n_video, _ = p.decode_offline()
    assert n_video == 4


def test_source_callbacks(http_server):
    url, es = http_server
    fired = []
    p = Player(url, {
        'onSourceEstablished': lambda s: fired.append('est'),
        'onSourceCompleted': lambda s: fired.append('done'),
        'onEnded': lambda s: fired.append('ended'),
    }, renderer=VideoCollector())
    p.run()
    assert 'est' in fired and 'done' in fired and 'ended' in fired


def test_streaming_buffer_cap():
    from jsmpeg_tpu.models.mpeg1 import MPEG1Decoder
    es, _ = _ts(seed=5, n=6)
    dec = MPEG1Decoder({'streaming': True, 'videoBufferSize': 2048})
    # write far more than the cap without decoding: memory must stay bounded
    for _ in range(50):
        dec.write(None, es)
    unread = dec.parser.bits.byte_length - (dec.parser.bits.index >> 3)
    assert unread <= 2048 + len(es)


def test_player_stats():
    es, ts = _ts(seed=13)
    vc = VideoCollector()
    p = Player(ts, {'progressive': False}, renderer=vc)
    p.decode_offline()
    s = player_stats(p)
    assert s['video']['frames_rendered'] == 4
    assert s['ts_packets'] > 0
    assert s['video']['resolution'] == '48x32'


def test_stage_timer():
    t = StageTimer()
    with t.time('parse', n=10):
        pass
    assert t.summary()['parse']['count'] == 10


def test_volume_property():
    """player.volume scales PCM in the sink (reference player.js:143-150);
    volume 1.0 is a bit-exact passthrough."""
    import numpy as np
    from jsmpeg_tpu.sinks import PCMCollector
    a = PCMCollector()
    l = np.full(8, 0.5, np.float32)
    a.play(44100, l, l)
    a.volume = 0.25
    a.play(44100, l, l)
    np.testing.assert_array_equal(a.chunks[0][0], l)
    np.testing.assert_allclose(a.chunks[1][0], l * np.float32(0.25))


def test_http_stream_source_clean_eof_completes():
    """A finite chunked body ends the HTTPStreamSource cleanly: completed
    is set and the body is NOT replayed from byte 0 (only errors
    reconnect -- the reference Fetch source also finishes when the
    stream ends)."""
    import socket

    from jsmpeg_tpu.sources import HTTPStreamSource

    payload = b'0123456789abcdef' * 64
    served = []

    def serve(sock):
        conn, _ = sock.accept()
        conn.recv(4096)
        conn.sendall(b'HTTP/1.1 200 OK\r\n'
                     b'Content-Type: video/mp2t\r\n'
                     b'Transfer-Encoding: chunked\r\n\r\n')
        for i in range(0, len(payload), 256):
            chunk = payload[i:i + 256]
            conn.sendall(b'%x\r\n%s\r\n' % (len(chunk), chunk))
        conn.sendall(b'0\r\n\r\n')          # clean chunked EOF
        conn.close()
        served.append(True)

    sock = socket.socket()
    sock.bind(('127.0.0.1', 0))
    sock.listen(1)
    port = sock.getsockname()[1]
    t = threading.Thread(target=serve, args=(sock,), daemon=True)
    t.start()

    got = []

    class Dest:
        def write(self, b):
            got.append(bytes(b))

    src = HTTPStreamSource(f'http://127.0.0.1:{port}/live.ts',
                           reconnect_interval=0.05)
    src.connect(Dest())
    src.start()
    deadline = time.monotonic() + 5
    while time.monotonic() < deadline and not src.completed:
        src.drain()
        time.sleep(0.01)
    src.drain()
    assert src.completed
    assert b''.join(got) == payload          # exactly once, no replay
    src.destroy()
    sock.close()


def test_mesh_flush_limit_bounds_pending():
    """Long inputs flush the mesh decode in bounded chunks (the
    retain=False memory contract); the carry threads across flushes so
    output stays bit-exact even when a flush splits a GOP."""
    from jsmpeg_tpu.models.mpeg1 import MPEG1Decoder
    from jsmpeg_tpu.parallel.mesh import make_mesh

    es, _ = encode_test_stream(48, 48, n_frames=20, seed=61, gop=5)
    ref_dec = MPEG1Decoder()
    ref_dec.write(0.0, es)
    ref = [(np.asarray(p.y), np.asarray(p.cr), np.asarray(p.cb))
           for p in ref_dec.decode_available(eof=True)]

    dec = MPEG1Decoder()
    dec.BATCH_FRAMES = 4                 # flush_limit = 4 * n_gop = 8
    dec.write(0.0, es)
    outs = dec.decode_available(eof=True, mesh=make_mesh(n_gop=2, n_tile=1))
    assert len(outs) == len(ref) == 20
    for i, p in enumerate(outs):
        got = (np.asarray(p.y), np.asarray(p.cr), np.asarray(p.cb))
        for a, b in zip(got, ref[i]):
            np.testing.assert_array_equal(a, b, err_msg=f'frame {i}')
