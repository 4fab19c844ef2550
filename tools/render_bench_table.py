"""Regenerate README.md's performance table from a captured bench JSON.

Usage:  python tools/render_bench_table.py <bench.json|BENCH_rN.json>

Accepts either the raw one-line JSON that `python bench.py` prints, a
file whose last {...} line is that JSON, or a driver record of the form
{"cmd": ..., "rc": ..., "parsed": {...}}.  Rewrites the block between
BENCH_TABLE_BEGIN/END markers in README.md and appends the source
filename, so the published numbers always trace to one capture
(VERDICT round-2 item 7: no hand-maintained perf claims).
"""

from __future__ import annotations

import json
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]


def load(path: str) -> dict:
    text = pathlib.Path(path).read_text()
    try:
        obj = json.loads(text)
        if isinstance(obj, dict) and isinstance(obj.get('parsed'), dict):
            return obj['parsed']
        if isinstance(obj, dict):
            return obj
    except json.JSONDecodeError:
        pass
    rows = [l for l in text.splitlines() if l.strip().startswith('{')]
    return json.loads(rows[-1])


def render(row: dict, source: str) -> str:
    BASE = 30.0      # reference sustained 720p fps (its README.md:5)

    def x(v):
        return f'{v / BASE:.1f}x'

    lines = ['| metric | rate |', '|---|---|']

    def add(label, text):
        lines.append(f'| {label} | {text} |')

    if row.get('device_pipeline_fps'):
        v = row['device_pipeline_fps']
        add('fused 720p device scan (sustained, wire resident, '
            'fetch-fenced)', f'{v:.0f} fps ({x(v)} the reference\'s '
            '30 fps baseline)')
    if row.get('metric') == '720p_mpeg1_fps_e2e_per_chip' and row.get('value'):
        v, b = row['value'], row.get('fps_best')
        best = f' / {b:.0f} fps best' if b else ''
        add('end-to-end (ES bytes → decoded planes)',
            f'{v:.0f} fps median ({x(v)}){best}')
    if row.get('ts_e2e_fps'):
        add('end-to-end from `.ts` (TS demux + PES included)',
            f'{row["ts_e2e_fps"]:.0f} fps')
    if row.get('host_parse_fps'):
        add('host C++ parse (1 shared core)',
            f'{row["host_parse_fps"]:.0f} fps')
    if row.get('ts_demux_mb_s'):
        add('host C++ TS demux', f'{row["ts_demux_mb_s"]:.0f} MB/s')
    if row.get('dense_28mbit_fps'):
        add('coefficient-dense stress stream '
            f'(~{row.get("dense_bitrate_mbit_s", 28):.0f} Mbit/s noise)',
            f'{row["dense_28mbit_fps"]:.0f} fps')
    if row.get('device_1080p_fps'):
        add('1080p sustained device scan (denser stream)',
            f'{row["device_1080p_fps"]:.0f} fps (the reference only '
            'claims 1080p "works just fine" on desktop)')
    abs_ = [(k, lbl) for k, lbl in
            (('device_pipeline_fmc_fps', 'fused MC'),
             ('device_pipeline_fmc2_fps', 'fused_pair MC'),
             ('device_pipeline_bc_fps', 'block_carry'),
             ('device_pipeline_ids_fps', 'wire_ids'))
            if row.get(k)]
    if abs_:
        add('formulation A/Bs on the same device scan',
            ' / '.join(f'{lbl} {row[k]:.0f} fps' for k, lbl in abs_))
    ms = row.get('device_multistream_fps')
    if isinstance(ms, dict) and ms.get('aggregate'):
        mode = ms.get('mode', 'vmap')
        add(f'multi-stream serving ({mode} dispatch, the default)',
            f'{ms["aggregate"]:.0f} fps aggregate over '
            f'{ms.get("streams", "?")} streams')
    elif ms:
        add('multi-stream serving (aggregate)', f'{ms:.0f} fps')
    mss = row.get('device_multistream_stacked_fps')
    if isinstance(mss, dict) and mss.get('aggregate'):
        add('multi-stream stacked-rows joint scan (A/B; loses to the '
            'serial bound at 720p, docs/SERVING.md)',
            f'{mss["aggregate"]:.0f} fps aggregate over '
            f'{mss.get("streams", "?")} streams')
    if row.get('upload_mb_s'):
        add('sustained H2D wire upload (this transport)',
            f'{row["upload_mb_s"]:.0f} MB/s')
    att = row.get('e2e_attribution')
    if isinstance(att, dict) and att.get('e2e_wall_s'):
        add('e2e stage attribution (each stage timed alone; overlap '
            'makes sum > wall)',
            f'parse {att["parse_s"]:.2f} s + upload {att["upload_s"]:.2f}'
            f' s + scan {att["scan_s"]:.2f} s + fetch '
            f'{att["fetch_rpc_s"]:.2f} s vs wall {att["e2e_wall_s"]:.2f} s')
    lat = row.get('streaming_latency_720p_ms')
    if isinstance(lat, dict):
        txt = (f'p50 {lat["p50"]:.0f} ms / p95 {lat["p95"]:.0f} ms incl. '
               'one readback RPC (reference claims ~50 ms)')
        # A/B arm: 'feeder' (r05+: default is auto-inline at F=1) or
        # 'inline' (r04 captures: default was the feeder thread)
        for key, lbl in (('feeder', 'feeder-upload A/B'),
                         ('inline', 'inline-upload A/B')):
            arm = lat.get(key)
            if isinstance(arm, dict) and arm.get('p50') == arm.get('p50'):
                txt += (f'; {lbl} p50 {arm["p50"]:.0f} / '
                        f'p95 {arm["p95"]:.0f} ms')
        add('live-streaming chunk-to-frame latency at 720p', txt)
    elif lat:
        add('live-streaming chunk-to-frame latency at 720p',
            f'{lat:.0f} ms (reference claims ~50 ms)')
    if row.get('mp2_frames_per_s'):
        v = row['mp2_frames_per_s']
        add('MP2 decode (C++ host path, bit-exact)',
            f'{v:.0f} frames/s (≈{v / 41.67:.0f}x realtime)')
    sc = row.get('scaling')
    if isinstance(sc, dict) and sc.get('rows'):
        parts = ', '.join(f'{r["mesh"]}: {r["fps"]} fps' +
                          (f' (eff {r["efficiency"]:.0%})'
                           if 'efficiency' in r else '')
                          for r in sc['rows'] if r.get('fps'))
        kind = ('real multi-chip' if sc.get('kind') == 'real_multichip'
                else 'virtual-CPU mesh, functional only')
        add(f'mesh scaling ({kind})', parts)
    lines.append(f'\nSource capture: `{source}`' +
                 (f' — error: {row["error"]}' if row.get('error') else ''))
    return '\n'.join(lines)


def main():
    path = sys.argv[1]
    row = load(path)
    table = render(row, pathlib.Path(path).name)
    readme = ROOT / 'README.md'
    text = readme.read_text()
    b = '<!-- BENCH_TABLE_BEGIN -->'
    e = '<!-- BENCH_TABLE_END -->'
    i, j = text.index(b) + len(b), text.index(e)
    new = text[:i] + '\n' + table + '\n' + text[j:]
    # drop any stale "(pending regeneration" note right after the block
    tail_start = new.index(e) + len(e)
    tail = new[tail_start:]
    if tail.lstrip('\n').startswith('(pending regeneration'):
        nl = tail.index(')\n') + 2
        tail = tail[nl:]
        new = new[:tail_start] + '\n' + tail
    readme.write_text(new)
    print(f'README.md table regenerated from {path}')


if __name__ == '__main__':
    main()
