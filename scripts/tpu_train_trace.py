"""Device trace of the ACTUAL jitted train step (VERDICT r4 item 2).

Runs the production scan-chained train step (bench.py _measure_training's
exact dispatch shape) on the real device under jax.profiler.trace, parses
the captured .xplane.pb with xprof's protos, and writes
artifacts/train_trace_r05_bs{B}.json with the top ops/fusions by device
time — the observed (not microbenched) accounting of where a step goes.

Usage: python scripts/tpu_train_trace.py [bs] [group] [--net NAME]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # parse_xplane

from keypointfusion_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def build_scan(bs: int, group: int, net: str, flatten_opt: bool = True,
               dtype: str = 'mixed'):
    from keypointfusion_tpu.config import Config
    from keypointfusion_tpu.data.synthetic import synthetic_batch
    from keypointfusion_tpu.training.train_step import (
        create_train_state, make_train_step_scan)

    cfg = Config(net=net, compute_dtype=dtype, fast_topk=True,
                 flatten_opt=flatten_opt)
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


def main():
    args = [a for a in sys.argv[1:] if not a.startswith('--')]
    bs = int(args[0]) if args else 64
    group = int(args[1]) if len(args) > 1 else 16
    net = 'KPFusion-resnet-18'
    for i, a in enumerate(sys.argv):
        if a == '--net':
            net = sys.argv[i + 1]
    flatten_opt = '--no-flatten' not in sys.argv
    dtype = 'mixed'
    for i, a in enumerate(sys.argv):
        if a == '--dtype':
            dtype = sys.argv[i + 1]
    tag = '' if net == 'KPFusion-resnet-18' else '_cnxt'
    if not flatten_opt:
        tag += '_leafopt'
    if dtype != 'mixed':
        tag += f'_{dtype}'

    dev = jax.devices()[0]
    print(f'device: {dev.device_kind} ({dev.platform}) bs={bs} group={group}'
          f' net={net} flatten_opt={flatten_opt} dtype={dtype}', flush=True)
    scan, state, stacked, rngs = build_scan(bs, group, net, flatten_opt,
                                            dtype)
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

    from parse_xplane import analyze
    out = {
        'device_kind': dev.device_kind,
        'net': net,
        'batch_size': bs,
        'group': group,
        'flatten_opt': flatten_opt,
        'compute_dtype': dtype,
        'wall_ms_per_step_unprofiled': round(dt_unprofiled / group * 1e3, 2),
        'wall_ms_per_step_profiled': round(dt / group * 1e3, 2),
    }
    try:
        out.update(analyze(trace_dir, group))
        for r in out['by_opcode'][:15]:
            print(f"  {r['ms_per_step']:8.3f} ms/step x"
                  f"{r['ops_per_step']:<6d} {r['pct']:4.1f}%  {r['op']}",
                  flush=True)
    except Exception as e:
        out['error'] = str(e)
        print('TRACE PARSE FAILED:', e, flush=True)
    path = f'artifacts/train_trace_r05_bs{bs}{tag}.json'
    os.makedirs('artifacts', exist_ok=True)
    with open(path, 'w') as f:
        json.dump(out, f, indent=1)
    print('wrote', path, flush=True)


if __name__ == '__main__':
    main()
