"""Training-sanity artifact: overfit a fixed synthetic batch set and record
the joint error trajectory to a committed metrics file.

Run:  python scripts/overfit_sanity.py [--steps 300] [--out PATH]

Writes JSONL records {step, loss, error_mm} to
artifacts/overfit_metrics.jsonl (committed as the reproducible evidence
behind the README's training-sanity claim).
The check: the last-stage mean joint error on the training batches must
drop by >5x over the run — i.e. the full jitted train step (forward, loss
assembly, backward, AdamW, BN updates) actually learns.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=300)
    ap.add_argument('--batches', type=int, default=4)
    ap.add_argument('--batch-size', type=int, default=32)
    ap.add_argument('--out', default='artifacts/overfit_metrics.jsonl')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from keypointfusion_tpu.utils.compile_cache import \
        enable_compilation_cache
    enable_compilation_cache()
    from keypointfusion_tpu.config import Config
    from keypointfusion_tpu.data.synthetic import synthetic_batch
    from keypointfusion_tpu.training.train_step import (
        create_train_state, frame_from_batch, make_train_step,
        make_eval_step,
    )
    from keypointfusion_tpu.training.metrics import xyz_to_error_mm

    cfg = Config(batch_size=args.batch_size, compute_dtype='mixed',
                 lr=8e-4)
    batches = [
        {k: jnp.asarray(v) for k, v in synthetic_batch(
            batch_size=args.batch_size, point_num=cfg.point_num,
            seed=s).items()}
        for s in range(args.batches)]
    state = create_train_state(cfg, jax.random.PRNGKey(0), batches[0],
                               steps_per_epoch=10**9)  # constant lr
    train_step = make_train_step(cfg, mesh=None)
    eval_step = make_eval_step(cfg, mesh=None)

    def error_mm(state, batch):
        results, _ = eval_step(state, batch)
        return float(np.mean(np.asarray(xyz_to_error_mm(
            results[-1], batch['xyz_gt'], batch['center'],
            batch['cube']))))

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    rngs = jax.random.split(jax.random.PRNGKey(1), args.steps)
    t0 = time.time()
    first = last = None
    with open(args.out, 'w') as f:
        for step in range(args.steps):
            batch = batches[step % args.batches]
            state, metrics = train_step(state, batch, rngs[step],
                                        jnp.zeros((), jnp.int32))
            if step % 25 == 0 or step == args.steps - 1:
                err = error_mm(state, batches[0])
                loss = float(jax.device_get(metrics['loss']))
                rec = {'step': step, 'loss': round(loss, 4),
                       'error_mm': round(err, 3),
                       'elapsed_s': round(time.time() - t0, 1)}
                if first is None:
                    first = err
                last = err
                f.write(json.dumps(rec) + '\n')
                f.flush()
                print(rec, flush=True)
    print(f'error: {first:.2f} -> {last:.2f} mm '
          f'({first / max(last, 1e-9):.1f}x)')
    if last >= first / 5:
        raise SystemExit('FAIL: error did not drop 5x')
    print('OK')


if __name__ == '__main__':
    main()
