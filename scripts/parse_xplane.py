"""Parse a captured jax.profiler xplane.pb and print/write top device ops.

Usage: python scripts/parse_xplane.py TRACE_DIR [OUT_JSON] [--group N]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys


def parse_xplane(trace_dir: str):
    """Aggregate device-plane events by name from the newest xplane.pb."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, '**', '*.xplane.pb'), recursive=True),
        key=os.path.getmtime)
    if not paths:
        return None, 'no xplane.pb found under ' + trace_dir
    raw = open(paths[-1], 'rb').read()
    if raw[:2] == b'\x1f\x8b':
        raw = gzip.decompress(raw)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    space = xplane_pb2.XSpace()
    space.ParseFromString(raw)
    planes = []
    for plane in space.planes:
        nm = plane.name.lower()
        if 'tpu' in nm or 'device' in nm or 'gpu' in nm or 'xla op' in nm:
            planes.append(plane)
    if not planes:
        planes = [p for p in space.planes if 'host' not in p.name.lower()]
    agg = {}
    plane_names = []
    for plane in planes:
        plane_names.append(plane.name)
        emeta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            for ev in line.events:
                name = emeta.get(ev.metadata_id, str(ev.metadata_id))
                d = agg.setdefault(name, [0.0, 0])
                d[0] += ev.duration_ps / 1e9  # ps -> ms
                d[1] += 1
    return {'planes': plane_names, 'ops': agg}, None


def main():
    trace_dir = sys.argv[1]
    out_json = sys.argv[2] if len(sys.argv) > 2 and \
        not sys.argv[2].startswith('--') else None
    group = 16
    for i, a in enumerate(sys.argv):
        if a == '--group':
            group = int(sys.argv[i + 1])
    parsed, err = parse_xplane(trace_dir)
    if err:
        print('ERROR:', err)
        sys.exit(1)
    agg = parsed['ops']
    total = sum(v[0] for v in agg.values())
    print('planes:', parsed['planes'])
    print(f'total device ms: {total:.1f}  per step (group={group}): '
          f'{total / group:.2f}')
    top = sorted(agg.items(), key=lambda kv: -kv[1][0])[:40]
    for k, v in top:
        print(f'{100 * v[0] / total:5.1f}%  {v[0] / group:9.3f} ms/step '
              f'x{v[1]:<6d} {k[:110]}')
    if out_json:
        payload = {
            'planes': parsed['planes'],
            'device_total_ms': round(total, 2),
            'device_ms_per_step': round(total / group, 2),
            'group': group,
            'top_ops': [
                {'name': k, 'total_ms': round(v[0], 3),
                 'ms_per_step': round(v[0] / group, 3), 'count': v[1],
                 'pct': round(100 * v[0] / total, 1)} for k, v in top],
        }
        with open(out_json, 'w') as f:
            json.dump(payload, f, indent=1)
        print('wrote', out_json)


if __name__ == '__main__':
    main()
