"""HTTP source, buffer caps, callbacks, metrics."""

import http.server
import threading

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
