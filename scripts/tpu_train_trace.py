"""Device trace of the ACTUAL jitted train step (VERDICT r4 item 2).

Runs the production scan-chained train step (bench.py _measure_training's
exact dispatch shape) on the real device under jax.profiler.trace, parses
the captured .xplane.pb with xprof's protos, and writes
artifacts/train_trace_r05_bs{B}.json with the top ops/fusions by device
time — the observed (not microbenched) accounting of where a step goes.

Usage: python scripts/tpu_train_trace.py [bs] [group] [--net NAME]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from keypointfusion_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def build_scan(bs: int, group: int, net: str):
    from keypointfusion_tpu.config import Config
    from keypointfusion_tpu.data.synthetic import synthetic_batch
    from keypointfusion_tpu.training.train_step import (
        create_train_state, make_train_step_scan)

    cfg = Config(net=net, compute_dtype='mixed', fast_topk=True)
    batches = [synthetic_batch(batch_size=bs, point_num=cfg.point_num,
                               seed=s) for s in range(group)]
    stacked = {k: jnp.asarray(np.stack([b[k] for b in batches]))
               for k in batches[0]}
    batch0 = {k: jnp.asarray(batches[0][k]) for k in batches[0]}
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch0,
                               steps_per_epoch=100)
    scan = make_train_step_scan(cfg)
    rngs = jax.random.split(jax.random.PRNGKey(1), group)
    return scan, state, stacked, rngs


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
    args = [a for a in sys.argv[1:] if not a.startswith('--')]
    bs = int(args[0]) if args else 64
    group = int(args[1]) if len(args) > 1 else 16
    net = 'KPFusion-resnet-18'
    for i, a in enumerate(sys.argv):
        if a == '--net':
            net = sys.argv[i + 1]
    tag = '' if net == 'KPFusion-resnet-18' else '_cnxt'

    dev = jax.devices()[0]
    print(f'device: {dev.device_kind} ({dev.platform}) bs={bs} group={group}'
          f' net={net}', flush=True)
    scan, state, stacked, rngs = build_scan(bs, group, net)
    ep = jnp.zeros((), jnp.int32)

    t0 = time.perf_counter()
    state, m = scan(state, stacked, rngs, ep)   # compile + warm
    jax.device_get(m['loss'])
    print(f'warm (incl. compile): {time.perf_counter() - t0:.1f}s',
          flush=True)

    rngs2 = jax.random.split(jax.random.PRNGKey(2), group)
    t0 = time.perf_counter()
    state, m = scan(state, stacked, rngs2, ep)
    jax.device_get(m['loss'])
    dt_unprofiled = time.perf_counter() - t0
    print(f'unprofiled dispatch: {dt_unprofiled*1e3:.1f} ms '
          f'({dt_unprofiled/group*1e3:.2f} ms/step)', flush=True)

    trace_dir = f'/tmp/kpf_trace_r05_bs{bs}{tag}'
    rngs3 = jax.random.split(jax.random.PRNGKey(3), group)
    with jax.profiler.trace(trace_dir):
        t0 = time.perf_counter()
        state, m = scan(state, stacked, rngs3, ep)
        jax.device_get(m['loss'])
        dt = time.perf_counter() - t0
    print(f'profiled dispatch: {dt*1e3:.1f} ms', flush=True)

    parsed, err = parse_xplane(trace_dir)
    out = {
        'device_kind': dev.device_kind,
        'net': net,
        'batch_size': bs,
        'group': group,
        'wall_ms_per_step_unprofiled': round(dt_unprofiled / group * 1e3, 2),
        'wall_ms_per_step_profiled': round(dt / group * 1e3, 2),
    }
    if err:
        out['error'] = err
        print('TRACE PARSE FAILED:', err, flush=True)
    else:
        agg = parsed['ops']
        total = sum(v[0] for v in agg.values())
        top = sorted(agg.items(), key=lambda kv: -kv[1][0])[:25]
        out['planes'] = parsed['planes']
        out['device_total_ms'] = round(total, 2)
        out['device_ms_per_step'] = round(total / group, 2)
        out['top_ops'] = [
            {'name': k, 'total_ms': round(v[0], 3),
             'ms_per_step': round(v[0] / group, 3), 'count': v[1],
             'pct': round(100 * v[0] / total, 1)}
            for k, v in top]
        for o in out['top_ops'][:15]:
            print(f"  {o['pct']:5.1f}%  {o['ms_per_step']:8.3f} ms/step  "
                  f"x{o['count']:<5d} {o['name'][:90]}", flush=True)
    path = f'artifacts/train_trace_r05_bs{bs}{tag}.json'
    os.makedirs('artifacts', exist_ok=True)
    with open(path, 'w') as f:
        json.dump(out, f, indent=1)
    print('wrote', path, flush=True)


if __name__ == '__main__':
    main()
