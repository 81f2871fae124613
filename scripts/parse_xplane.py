"""Parse a captured jax.profiler xplane.pb into a per-op device-time
summary of the TensorCore timeline.

The XSpace planes are hierarchical (Steps > XLA Modules > XLA Ops, plus
an overlapping Async XLA Ops DMA line) — summing every line double-counts.
This reads ONLY the leaf 'XLA Ops' line of the TPU device plane and
reports: the while-loop (scan) busy time, a per-opcode rollup, and the
top individual ops, all normalized per scan step.

Usage: python scripts/parse_xplane.py TRACE_DIR [OUT_JSON] [--group N]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys


def analyze(trace_dir: str, group: int = 16):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, '**', '*.xplane.pb'), recursive=True),
        key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError('no xplane.pb under ' + trace_dir)
    raw = open(paths[-1], 'rb').read()
    if raw[:2] == b'\x1f\x8b':
        raw = gzip.decompress(raw)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    space = xplane_pb2.XSpace()
    space.ParseFromString(raw)
    device = next((p for p in space.planes
                   if p.name.startswith('/device:TPU')), None)
    if device is None:  # CPU runs name the plane differently
        device = next(p for p in space.planes
                      if 'host' not in p.name.lower() and p.lines)
    emeta = {m.id: m.name for m in device.event_metadata.values()}
    line = next(l for l in device.lines if l.name == 'XLA Ops')

    by_opcode = {}
    by_name = {}
    while_ms = 0.0
    for ev in line.events:
        name = emeta.get(ev.metadata_id, '?')
        ms = ev.duration_ps / 1e9
        if name.startswith('%while'):
            while_ms += ms
            continue
        m = re.match(r'%([a-zA-Z\-_]+)', name)
        op = m.group(1) if m else name[:24]
        d = by_opcode.setdefault(op, [0.0, 0])
        d[0] += ms
        d[1] += 1
        d = by_name.setdefault(name, [0.0, 0])
        d[0] += ms
        d[1] += 1

    total = sum(v[0] for v in by_opcode.values())
    return {
        'plane': device.name,
        'group': group,
        'scan_while_ms_per_step': round(while_ms / group, 2),
        'op_total_ms_per_step': round(total / group, 2),
        'by_opcode': [
            {'op': k, 'ms_per_step': round(v[0] / group, 3),
             'ops_per_step': v[1] // group,
             'pct': round(100 * v[0] / max(total, 1e-9), 1)}
            for k, v in sorted(by_opcode.items(), key=lambda kv: -kv[1][0])
            [:20]],
        'top_individual_ops': [
            {'name': k[:220], 'ms_per_step': round(v[0] / group, 3),
             'count_per_step': v[1] // group}
            for k, v in sorted(by_name.items(), key=lambda kv: -kv[1][0])
            [:25]],
    }


def main():
    trace_dir = sys.argv[1]
    out_json = sys.argv[2] if len(sys.argv) > 2 and \
        not sys.argv[2].startswith('--') else None
    group = 16
    for i, a in enumerate(sys.argv):
        if a == '--group':
            group = int(sys.argv[i + 1])
    res = analyze(trace_dir, group)
    print(f"plane {res['plane']}: scan body "
          f"{res['scan_while_ms_per_step']} ms/step")
    for r in res['by_opcode']:
        print(f"  {r['ms_per_step']:8.3f} ms/step x{r['ops_per_step']:<6d} "
              f"{r['pct']:4.1f}%  {r['op']}")
    if out_json:
        with open(out_json, 'w') as f:
            json.dump(res, f, indent=1)
        print('wrote', out_json)


if __name__ == '__main__':
    main()
