"""End-to-end: .ts file -> Player -> decoded planes + PCM, vs oracles."""

import numpy as np
import pytest

from jsmpeg_tpu.player import Player
from jsmpeg_tpu.sinks import PCMCollector, VideoCollector
from jsmpeg_tpu.testing.gen import encode_test_stream
from jsmpeg_tpu.testing.mp2_enc import encode_stream as mp2_stream
from jsmpeg_tpu.testing.ts_mux import mux_av, mux_video
from tests.oracle.ref_mp2 import OracleMP2
from tests.oracle.ref_mpeg1 import OracleMPEG1


@pytest.fixture(scope='module')
def av_ts():
    es, chunks = encode_test_stream(64, 48, n_frames=6, seed=12, gop=3,
                                    frame_rate=25.0)
    audio_es, audio_frames = mp2_stream(10, seed=13)
    # drop the trailing sequence-end chunk from the PES list (it is part of
    # the last frame payload in chunked form)
    vframes = chunks[:-1]
    vframes[-1] = vframes[-1] + chunks[-1]
    ts = mux_av(vframes, 25.0, audio_frames, 1152, 44100)
    return ts, es, audio_es


def test_offline_av_decode_matches_oracles(av_ts):
    ts, video_es, audio_es = av_ts
    vc, ac = VideoCollector(), PCMCollector()
    p = Player(ts, {'progressive': False}, renderer=vc, audio_out=ac)
    n_video, n_audio = p.decode_offline()

    golden_v = OracleMPEG1(video_es).decode_all()
    golden_a = OracleMP2(audio_es).decode_all()
    assert n_video == len(golden_v) == 6
    assert n_audio == len(golden_a) == 10
    for (gy, gcr, gcb), (py, pcr, pcb) in zip(golden_v, vc.frames):
        assert np.array_equal(gy, py)
        assert np.array_equal(gcr, pcr)
        assert np.array_equal(gcb, pcb)
    got = ac.pcm
    gl = np.concatenate([f[0] for f in golden_a])
    gr = np.concatenate([f[1] for f in golden_a])
    assert np.array_equal(got[0], gl)
    assert np.array_equal(got[1], gr)


def test_offline_audio_mode_tpu():
    """Player.decode_offline with audio_mode='tpu' batches every audio
    frame through the device matmul synthesis; on non-saturated content
    (real audio: the int32 U accumulator stays linear) output stays
    within the documented float bound of the exact path."""
    es, chunks = encode_test_stream(64, 48, n_frames=6, seed=12, gop=3,
                                    frame_rate=25.0)
    audio_es, audio_frames = mp2_stream(10, seed=13, sf_range=(24, 63))
    vframes = chunks[:-1]
    vframes[-1] = vframes[-1] + chunks[-1]
    ts = mux_av(vframes, 25.0, audio_frames, 1152, 44100)
    ac = PCMCollector()
    p = Player(ts, {'progressive': False, 'audio_mode': 'tpu',
                    'video': False}, audio_out=ac)
    _, n_audio = p.decode_offline()
    golden_a = OracleMP2(audio_es).decode_all()
    assert n_audio == len(golden_a) == 10
    got = ac.pcm
    gl = np.concatenate([f[0] for f in golden_a])
    gr = np.concatenate([f[1] for f in golden_a])
    np.testing.assert_allclose(got[0], gl, atol=3e-5)
    np.testing.assert_allclose(got[1], gr, atol=3e-5)


def test_poster_written(av_ts, tmp_path):
    """cfg.poster writes the decodeFirstFrame preview as a PPM (the
    data-poster analog of the reference video element)."""
    ts, video_es, _ = av_ts
    poster = tmp_path / 'poster.ppm'
    vc = VideoCollector()
    p = Player(ts, {'progressive': False, 'poster': str(poster),
                    'audio': False}, renderer=vc)
    p.decode_offline()
    data = poster.read_bytes()
    assert data.startswith(b'P6\n64 48\n255\n')
    # poster pixels = RGB of the first decoded frame
    from jsmpeg_tpu.ops.color import ycbcr_to_rgb_int
    from jsmpeg_tpu.utils import fetch
    gy, gcr, gcb = OracleMPEG1(video_es).decode_all()[0]
    rgb = fetch(ycbcr_to_rgb_int(gy, gcr, gcb, 64, 48))
    assert data.split(b'\n', 3)[3] == rgb.tobytes()


def test_tick_driven_av_sync(av_ts):
    ts, video_es, audio_es = av_ts
    vc, ac = VideoCollector(), PCMCollector()
    p = Player(ts, {'progressive': False}, renderer=vc, audio_out=ac)
    p.run(realtime=False)
    assert vc.frames_rendered == 6
    assert ac.samples_played == 10 * 1152
    # bit-exact through the tick path too
    golden_v = OracleMPEG1(video_es).decode_all()
    for (gy, _, _), (py, _, _) in zip(golden_v, vc.frames):
        assert np.array_equal(gy, py)


def test_video_only_file(tmp_path):
    es, chunks = encode_test_stream(48, 32, n_frames=4, seed=14, gop=2)
    vframes = chunks[:-1]
    vframes[-1] = vframes[-1] + chunks[-1]
    ts = mux_video(vframes, 25.0)
    path = tmp_path / 'clip.ts'
    path.write_bytes(ts)
    vc = VideoCollector()
    p = Player(str(path), {'audio': False, 'chunkSize': 512}, renderer=vc)
    p.run()
    assert vc.frames_rendered == 4
    golden = OracleMPEG1(es).decode_all()
    for (gy, _, _), (py, _, _) in zip(golden, vc.frames):
        assert np.array_equal(gy, py)


def test_seek_and_loop(av_ts):
    ts, video_es, _ = av_ts
    vc = VideoCollector()
    p = Player(ts, {'progressive': False, 'audio': False}, renderer=vc)
    p.run()
    n1 = vc.frames_rendered
    assert n1 == 6
    p.seek(0.0)
    p._ended_fired = False
    p.play()
    while p.tick():
        pass
    # after seek to 0 we decode the stream again (frames re-rendered)
    assert vc.frames_rendered > n1


def test_streaming_push_source():
    from jsmpeg_tpu.sources import PushSource
    es, chunks = encode_test_stream(48, 32, n_frames=4, seed=15, gop=2)
    vframes = chunks[:-1]
    vframes[-1] = vframes[-1] + chunks[-1]
    ts = mux_video(vframes, 25.0)
    src = PushSource()
    vc = VideoCollector()
    p = Player(src, {'audio': False}, renderer=vc)
    p.play()
    # push in odd-sized chunks like a network would
    pos = 0
    while pos < len(ts):
        src.write(ts[pos:pos + 1001])
        pos += 1001
        p.tick()
    for _ in range(8):
        p.tick()
    assert vc.frames_rendered >= 3   # streaming mode decodes what is buffered
    golden = OracleMPEG1(es).decode_all()
    for (gy, _, _), (py, _, _) in zip(golden, vc.frames):
        assert np.array_equal(gy, py)


def test_seek_to_iframe_clean_resume():
    """seek(t, to_iframe=True) resumes at a GOP boundary: the first frame
    decoded after the snap is bit-exact with the oracle's I frame."""
    import numpy as np
    from jsmpeg_tpu.host.mpeg1_parse import MPEG1Parser
    from jsmpeg_tpu.host.native import NativeMPEG1Parser, native_available
    from jsmpeg_tpu.models.mpeg1 import MPEG1Decoder
    from jsmpeg_tpu.testing.gen import encode_test_stream
    from tests.oracle.ref_mpeg1 import OracleMPEG1

    es, chunks = encode_test_stream(96, 64, n_frames=9, seed=17, gop=3,
                                    frame_rate=25.0)
    golden = OracleMPEG1(es).decode_all()
    for native in ([True] if native_available() else []) + [False]:
        dec = MPEG1Decoder({'native': native})
        # emulate per-frame PES writes with PTS so timestamps collect
        off = 0
        for i, c in enumerate(chunks[:-1]):
            dec.write(i / 25.0, c)
            off += len(c)
        dec.write(None, chunks[-1])
        # seek into the middle of GOP 1 (frames 3..5): snap lands on
        # frame 6's I picture (the next I at/after the seek point)
        dec.seek(4.4 / 25.0, to_iframe=True)
        out = dec.decode(eof=True)
        got = np.asarray(out.y)
        matches = [i for i, (gy, _, _) in enumerate(golden)
                   if np.array_equal(gy, got)]
        assert matches and all(m % 3 == 0 for m in matches), matches


def test_offline_count_includes_first_frame_preview():
    """decode_offline must count the decodeFirstFrame preview (decoded
    during write) -- regression: it was undercounted by one when the
    first write held a complete picture."""
    import numpy as np
    from jsmpeg_tpu.models.mpeg1 import MPEG1Decoder
    from jsmpeg_tpu.sinks import VideoCollector
    from jsmpeg_tpu.testing.gen import encode_test_stream

    es, _ = encode_test_stream(80, 48, n_frames=5, seed=23, gop=5)
    dec = MPEG1Decoder({'decodeFirstFrame': True})
    sink = VideoCollector()
    dec.connect(sink)
    dec.write(0.0, es)          # whole ES in one write -> preview decodes
    assert dec.frames_decoded == 1
    dec.decode_available(eof=True, retain=False)
    assert dec.frames_decoded == 5
    assert sink.frames_rendered == 5


def test_retain_false_frameseq_contract():
    """retain=False: len() counts all frames; accessing released frames
    raises a descriptive IndexError; no destination -> ValueError."""
    import pytest as _pytest
    from jsmpeg_tpu.models.mpeg1 import MPEG1Decoder
    from jsmpeg_tpu.sinks import NullVideoSink
    from jsmpeg_tpu.testing.gen import encode_test_stream

    es, _ = encode_test_stream(80, 48, n_frames=4, seed=24, gop=2)
    dec = MPEG1Decoder()
    dec.write(0.0, es)
    with _pytest.raises(ValueError):
        dec.decode_available(eof=True, retain=False)
    dec2 = MPEG1Decoder()
    dec2.connect(NullVideoSink())
    dec2.write(0.0, es)
    seq = dec2.decode_available(eof=True, retain=False)
    assert len(seq) == 4
    with _pytest.raises(IndexError, match='released'):
        seq[0]
    assert list(iter(seq)) == []
