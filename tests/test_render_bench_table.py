"""The README bench-table renderer is the honesty loop's last hop: a
crash or silent omission would break the claim-traces-to-capture chain,
so every row shape bench.py can emit must render."""

import json
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT / 'tools'))

from render_bench_table import load, render  # noqa: E402


FULL_ROW = {
    'metric': '720p_mpeg1_fps_e2e_per_chip', 'value': 310.0,
    'fps_best': 420.0, 'device_pipeline_fps': 800.1,
    'device_pipeline_fmc_fps': 900.0, 'device_pipeline_fmc2_fps': 910.0,
    'device_pipeline_bc_fps': 805.0, 'device_pipeline_ids_fps': 850.0,
    'device_multistream_fps': {'streams': 4, 'aggregate': 1203.4},
    'streaming_latency_720p_ms': {'p50': 38.0, 'p95': 51.0,
                                  'inline': {'p50': 35.0, 'p95': 44.0}},
    'ts_e2e_fps': 300.0, 'host_parse_fps': 1300.0, 'ts_demux_mb_s': 1000.0,
    'dense_28mbit_fps': 130.0, 'device_1080p_fps': 200.0,
    'mp2_frames_per_s': 8500.0,
    'scaling': {'kind': 'real_multichip',
                'rows': [{'mesh': '1x1', 'fps': 800},
                         {'mesh': '4x2', 'fps': 5200,
                          'efficiency': 0.81}]},
}


def test_full_capture_renders_every_row():
    out = render(dict(FULL_ROW), 'BENCH_r03.json')
    for frag in ('310 fps median (10.3x)', '420 fps best',
                 'fused MC 900 fps', 'fused_pair MC 910 fps',
                 'block_carry 805 fps', 'wire_ids 850 fps',
                 '1203 fps aggregate over 4 streams',
                 'p50 38 ms / p95 51 ms',
                 'inline-upload A/B p50 35 / p95 44 ms',
                 '4x2: 5200 fps (eff 81%)', 'BENCH_r03.json'):
        assert frag in out, frag
    # r05+ captures carry the 'feeder' arm instead (default is inline)
    row = dict(FULL_ROW)
    row['streaming_latency_720p_ms'] = {'p50': 39.0, 'p95': 50.0,
                                        'feeder': {'p50': 38.0,
                                                   'p95': 62.0}}
    out = render(row, 'BENCH_r05.json')
    assert 'feeder-upload A/B p50 38 / p95 62 ms' in out


def test_host_only_capture_renders_with_error():
    row = {'metric': '720p_mpeg1_fps_host_parse_only', 'value': 1300.0,
           'host_parse_fps': 1300.0, 'mp2_frames_per_s': 8500.0,
           'ts_demux_mb_s': 1000.0,
           'error': 'device child init-timeout after 300s'}
    out = render(row, 'BENCH_r03.json')
    assert 'error: device child init-timeout' in out
    assert 'host C++ parse' in out


def test_legacy_scalar_rows_still_render():
    row = {'device_multistream_fps': 1200.0,
           'streaming_latency_720p_ms': 45.0}
    out = render(row, 'x.json')
    assert '1200 fps' in out and '45 ms' in out


def test_load_accepts_driver_record_and_raw_line(tmp_path):
    p = tmp_path / 'a.json'
    p.write_text(json.dumps({'cmd': 'bench', 'rc': 0,
                             'parsed': {'value': 1.0}}))
    assert load(str(p)) == {'value': 1.0}
    p2 = tmp_path / 'b.log'
    p2.write_text('noise\n' + json.dumps({'value': 2.0}) + '\n')
    assert load(str(p2)) == {'value': 2.0}


def test_main_splices_readme_markers(tmp_path, monkeypatch):
    """End-to-end: main() must replace only the marked block."""
    cap = tmp_path / 'cap.json'
    cap.write_text(json.dumps(FULL_ROW))
    readme = tmp_path / 'README.md'
    readme.write_text('# x\n<!-- BENCH_TABLE_BEGIN -->\nold\n'
                      '<!-- BENCH_TABLE_END -->\n(pending regeneration '
                      'from a round-3 capture)\ntail stays\n')
    r = subprocess.run(
        [sys.executable, '-c',
         'import sys; sys.path.insert(0, %r); sys.argv = ["x", %r]; '
         'import render_bench_table as m; m.ROOT = __import__("pathlib")'
         '.Path(%r); m.main()'
         % (str(ROOT / 'tools'), str(cap), str(tmp_path))],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    text = readme.read_text()
    assert 'old' not in text and 'fused MC 900 fps' in text
    assert 'pending regeneration' not in text
    assert 'tail stays' in text
