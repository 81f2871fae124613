"""TRAINING-dynamics cost of each precision policy, multi-seed.

test_precision_deltas.py covers the forward only; this measures what each
compute_dtype does to actual optimization: the same 300-step overfit run
(same data, same rng stream, same optimizer) under
  float32   — everything f32;
  mixed     — bf16 conv backbones, f32 fusion head (training default);
  bfloat16  — everything bf16 (the serving dtype).
Records the loss/error_mm trajectories + measured ms/step (scan-chained,
so the number is device compute, not dispatch latency) to
artifacts/precision_training_r04.json.

Run: python scripts/precision_training_deltas.py [--steps 300]
"""

import argparse
import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))


def run_policy(policy, args, seed=0):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from keypointfusion_tpu.config import Config
    from keypointfusion_tpu.data.synthetic import synthetic_batch
    from keypointfusion_tpu.training.metrics import xyz_to_error_mm
    from keypointfusion_tpu.training.train_step import (
        create_train_state, make_eval_step, make_train_step_scan,
    )

    cfg = Config(batch_size=args.batch_size, compute_dtype=policy,
                 lr=8e-4)
    # each seed gets its own data, init, and rng stream — policy deltas
    # must be separable from single-run noise (round-4 verdict #5)
    batches = [
        {k: jnp.asarray(v) for k, v in synthetic_batch(
            batch_size=args.batch_size, point_num=cfg.point_num,
            seed=s + 1000 * seed).items()}
        for s in range(args.batches)]
    # one dispatch = one full cycle over the batch set, repeated
    group = args.batches * args.cycles_per_dispatch
    stacked = {k: jnp.stack([batches[i % args.batches][k]
                             for i in range(group)])
               for k in batches[0]}
    state = create_train_state(cfg, jax.random.PRNGKey(seed), batches[0],
                               steps_per_epoch=10**9)  # constant lr
    scan = make_train_step_scan(cfg, mesh=None)
    eval_step = make_eval_step(cfg, mesh=None)

    def error_mm(state):
        errs = []
        for b in batches:
            results, _ = eval_step(state, b)
            errs.append(float(np.mean(np.asarray(xyz_to_error_mm(
                results[-1], b['xyz_gt'], b['center'], b['cube'])))))
        return float(np.mean(errs))

    rng0 = jax.random.PRNGKey(7 + 100 * seed)
    ep = jnp.zeros((), jnp.int32)
    curve = [{'step': 0, 'error_mm': error_mm(state)}]
    n_disp = (args.steps + group - 1) // group
    t_total = 0.0
    done = 0
    for d in range(n_disp):
        rngs = jax.random.split(jax.random.fold_in(rng0, d), group)
        t0 = time.perf_counter()
        state, m = scan(state, stacked, rngs, ep)
        loss = float(jax.device_get(m['loss'])[-1])
        dt = time.perf_counter() - t0
        if d > 0:          # first dispatch pays the compile
            t_total += dt
        done += group
        curve.append({'step': done, 'loss': loss,
                      'error_mm': error_mm(state)})
        print(f"[{policy}] step {done}: loss={loss:.4f} "
              f"err={curve[-1]['error_mm']:.2f}mm", flush=True)
    ms_per_step = (t_total / max(done - group, 1)) * 1000.0
    return {'policy': policy, 'seed': seed, 'steps': done,
            'ms_per_step_scan': round(ms_per_step, 2),
            'samples_per_sec': round(args.batch_size / ms_per_step * 1000,
                                     1),
            'final_error_mm': curve[-1]['error_mm'],
            'final_loss': curve[-1].get('loss'),
            'error_drop_x': round(curve[0]['error_mm']
                                  / max(curve[-1]['error_mm'], 1e-9), 2),
            'curve': curve if seed == 0 else None}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=300)
    ap.add_argument('--batches', type=int, default=4)
    ap.add_argument('--batch-size', type=int, default=32)
    ap.add_argument('--cycles-per-dispatch', type=int, default=5)
    ap.add_argument('--seeds', type=int, default=3)
    ap.add_argument('--out',
                    default='artifacts/precision_training_r05.json')
    args = ap.parse_args()

    from keypointfusion_tpu.utils.compile_cache import \
        enable_compilation_cache
    enable_compilation_cache()
    import jax
    import numpy as np

    results = [run_policy(p, args, seed=s)
               for p in ('float32', 'mixed', 'bfloat16')
               for s in range(args.seeds)]
    summary = []
    for p in ('float32', 'mixed', 'bfloat16'):
        finals = [r['final_error_mm'] for r in results if r['policy'] == p]
        ms = [r['ms_per_step_scan'] for r in results if r['policy'] == p]
        summary.append({
            'policy': p, 'n_seeds': len(finals),
            'final_error_mm_mean': round(float(np.mean(finals)), 3),
            'final_error_mm_std': round(float(np.std(finals)), 3),
            'final_error_mm_per_seed': [round(f, 3) for f in finals],
            'ms_per_step_median': round(float(np.median(ms)), 2)})
    payload = {'device': jax.devices()[0].device_kind,
               'batch_size': args.batch_size,
               'summary': summary,
               'runs': results}
    os.makedirs(osp.dirname(args.out), exist_ok=True)
    with open(args.out, 'w') as f:
        json.dump(payload, f, indent=1)
    print('wrote', args.out)
    for s in summary:
        print(f"{s['policy']:>9}: {s['ms_per_step_median']:7.2f} ms/step  "
              f"final {s['final_error_mm_mean']:.2f} "
              f"± {s['final_error_mm_std']:.2f} mm over "
              f"{s['n_seeds']} seeds {s['final_error_mm_per_seed']}")


if __name__ == '__main__':
    main()
