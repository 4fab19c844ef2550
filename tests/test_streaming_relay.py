"""Live-streaming end to end: HTTP ingest -> relay -> WebSocket/TCP client
-> Player, mirroring the reference's ffmpeg -> websocket-relay -> browser
chain on localhost."""

import socket
import threading
import time

import numpy as np
import pytest

from jsmpeg_tpu.player import Player
from jsmpeg_tpu.sinks import VideoCollector
from jsmpeg_tpu.testing.gen import encode_test_stream
from jsmpeg_tpu.testing.ts_mux import mux_video
from tests.oracle.ref_mpeg1 import OracleMPEG1


def _make_ts(seed=77):
    es, chunks = encode_test_stream(48, 32, n_frames=6, seed=seed, gop=3)
    v = chunks[:-1]
    v[-1] = v[-1] + chunks[-1]
    return es, mux_video(v, 25.0)


@pytest.fixture(scope='module')
def relay():
    import asyncio
    import sys
    sys.path.insert(0, 'tools')
    from relay import Relay, serve

    loop = asyncio.new_event_loop()
    ports = {}

    def find_port():
        s = socket.socket()
        s.bind(('127.0.0.1', 0))
        p = s.getsockname()[1]
        s.close()
        return p

    ports = dict(http=find_port(), ws=find_port(), tcp=find_port())

    def run():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(serve('sec', ports['http'], ports['ws'],
                                      ports['tcp'], None, host='127.0.0.1'))

    t = threading.Thread(target=run, daemon=True)
    t.start()
    time.sleep(0.4)
    yield ports
    # daemon thread + loop die with the process; stopping the loop from
    # here races server teardown and only produces warnings


def _post_stream(port, ts, chunk=600, delay=0.002):
    s = socket.create_connection(('127.0.0.1', port))
    s.sendall(b'POST /sec HTTP/1.1\r\nHost: x\r\n\r\n')
    for i in range(0, len(ts), chunk):
        s.sendall(ts[i:i + chunk])
        time.sleep(delay)
    time.sleep(0.3)
    s.close()


@pytest.mark.parametrize('scheme', ['ws', 'tcp', 'http'])
def test_live_stream_end_to_end(relay, scheme):
    """ws/tcp: push sources.  http: the relay serves the live TS back out
    as an endless chunked body (no Content-Length) and HTTPStreamSource
    pumps it incrementally -- the reference Fetch source role
    (src/fetch.js:22-62)."""
    es, ts = _make_ts()
    golden = OracleMPEG1(es).decode_all()

    url = {'ws': f'ws://127.0.0.1:{relay["ws"]}/',
           'tcp': f'tcp://127.0.0.1:{relay["tcp"]}',
           'http': f'http://127.0.0.1:{relay["http"]}/live.ts'}[scheme]
    vc = VideoCollector()
    p = Player(url, {'audio': False, 'streaming': scheme == 'http'},
               renderer=vc)
    p.play()
    time.sleep(0.4)   # let the client connect before streaming starts

    feeder = threading.Thread(target=_post_stream,
                              args=(relay['http'], ts), daemon=True)
    feeder.start()

    deadline = time.monotonic() + 20
    while time.monotonic() < deadline and vc.frames_rendered < 5:
        p.tick()
        time.sleep(0.005)
    feeder.join()
    for _ in range(20):
        p.tick()
    p.destroy()

    assert vc.frames_rendered >= 5, vc.frames_rendered
    # streaming decode must be bit-exact for the frames it produced
    for (gy, gcr, gcb), (py, pcr, pcb) in zip(golden, vc.frames):
        assert np.array_equal(gy, py)
        assert np.array_equal(gcr, pcr)
        assert np.array_equal(gcb, pcb)
