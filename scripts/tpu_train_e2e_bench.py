"""End-to-end training throughput: real BatchLoader over an on-disk
dataset feeding the jitted scan train step (round-4 verdict #6).

All BENCH train numbers so far timed the step on pre-staged synthetic
device batches; this measures the production path the Trainer actually
runs (trainer.py:288-384): on-disk raw frames -> dataset __getitem__
(crop/normalize/pcl; the C++ core in eval mode, the numpy/cv2 augment
chain in train mode) -> BatchLoader workers -> [G,B,...] stacking ->
device_prefetch (H2D overlapped) -> one scan dispatch per G steps.

Two rows:
  * train_e2e_samples_per_sec_bs64      — native eval-mode samples
    (C++ crop+normalize+pcl, ~0.45 ms/sample on this host);
  * train_e2e_aug_samples_per_sec_bs64  — full train-mode augmentation
    (numpy/cv2 rotate/scale/translate), the reference's actual epoch
    pipeline. On this 1-core box the augment chain is CPU-bound and can't
    hide behind the step; a production host has >=8 real cores
    (reference DataLoader(num_workers=8), train.py:128).

Usage: python scripts/tpu_train_e2e_bench.py [--bs 64] [--group 8]
       [--frames 256] [--steps 24]
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys
import tempfile
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))

from keypointfusion_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import numpy as np


def write_frames(root: str, n: int, seed: int = 0):
    """Raw 480x640 RGB-D frames with a hand-like depth blob + consistent
    labels, stored one .npz per frame (the on-disk dataset)."""
    rng = np.random.RandomState(seed)
    cam = np.array([600.0, 600.0, 320.0, 240.0], np.float32)
    for i in range(n):
        depth = np.zeros((480, 640), np.uint16)
        cx, cy = rng.randint(250, 390), rng.randint(180, 300)
        z0 = rng.randint(550, 700)
        depth[cy - 60:cy + 60, cx - 60:cx + 60] = rng.randint(
            z0 - 40, z0 + 40, (120, 120)).astype(np.uint16)
        rgb = rng.randint(0, 255, (480, 640, 3)).astype(np.uint8)
        center = np.array([(cx - cam[2]) * z0 / cam[0],
                           (cy - cam[3]) * z0 / cam[1], z0], np.float32)
        joints = center[None, :] + rng.uniform(
            -60, 60, (21, 3)).astype(np.float32)
        np.savez(osp.join(root, f'{i:05d}.npz'), depth=depth, rgb=rgb,
                 joints=joints, center=center, cam=cam)


class DiskDataset:
    """On-disk raw frames -> full per-sample pipeline
    (datasets.build_rgbd_sample), train or eval mode."""

    def __init__(self, root: str, n: int, train: bool,
                 sample_num: int = 1024):
        import random
        self.root, self.n, self.train = root, n, train
        self.sample_num = sample_num
        self.py_rng = random.Random(1)
        self.np_rng = np.random.RandomState(1)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        from keypointfusion_tpu.data.datasets import build_rgbd_sample
        z = np.load(osp.join(self.root, f'{int(i):05d}.npz'))
        return build_rgbd_sample(
            z['depth'].astype(np.float32), z['rgb'], z['joints'],
            z['center'], z['cam'], np.array([250.0, 250.0, 250.0]),
            train=self.train, aug_para=(10.0, 0.1, 180.0),
            py_rng=self.py_rng, np_rng=self.np_rng,
            sample_num=self.sample_num)


def measure(ds, bs: int, group: int, steps: int, cfg):
    import jax
    import jax.numpy as jnp
    from keypointfusion_tpu.data.pipeline import BatchLoader, device_prefetch
    from keypointfusion_tpu.training.train_step import (
        create_train_state, make_train_step_scan)

    loader = BatchLoader(ds, bs, shuffle=True, num_workers=8,
                         max_prefetch=2 * group)
    first = next(iter(loader))
    batch0 = {k: jnp.asarray(v) for k, v in first.items()}
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch0,
                               steps_per_epoch=1000)
    scan = make_train_step_scan(cfg)
    ep = jnp.zeros((), jnp.int32)
    rng0 = jax.random.PRNGKey(1)

    def grouped(epoch_it):
        buf = []
        for b in epoch_it:
            buf.append(b)
            if len(buf) == group:
                yield {k: np.stack([x[k] for x in buf]) for k in buf[0]}
                buf = []

    # warm up / compile on one stacked group
    warm_it = grouped(iter(loader))
    stacked0 = {k: jnp.asarray(v) for k, v in next(warm_it).items()}
    rngs = jax.random.split(rng0, group)
    state, m = scan(state, stacked0, rngs, ep)
    jax.device_get(m['loss'])

    # timed: fresh epoch, loader + H2D + step overlapped
    n_groups = max(1, steps // group)
    done = 0
    t0 = time.perf_counter()
    for gi, stacked in enumerate(device_prefetch(grouped(iter(loader)))):
        if gi >= n_groups:
            break
        rngs = jax.random.split(jax.random.fold_in(rng0, gi), group)
        state, m = scan(state, stacked, rngs, ep)
        done += group
    jax.device_get(m['loss'])
    dt = time.perf_counter() - t0
    sps = done * bs / dt
    return sps, dt / done * 1000.0, done


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--bs', type=int, default=64)
    ap.add_argument('--group', type=int, default=8)
    ap.add_argument('--frames', type=int, default=256)
    ap.add_argument('--steps', type=int, default=24)
    ap.add_argument('--out', default='artifacts/train_e2e_r05.json')
    args = ap.parse_args()

    import jax
    from keypointfusion_tpu.config import Config
    cfg = Config(compute_dtype='mixed', fast_topk=True)

    tmp = tempfile.mkdtemp(prefix='kpf_e2e_frames_')
    write_frames(tmp, args.frames)
    out = {'device': jax.devices()[0].device_kind, 'batch_size': args.bs,
           'group': args.group, 'host_cores': os.cpu_count()}
    for label, train in (('native_eval_pipeline', False),
                         ('full_augment_pipeline', True)):
        ds = DiskDataset(tmp, args.frames, train=train)
        t0 = time.perf_counter()
        _ = ds[0]
        per_sample_ms = (time.perf_counter() - t0) * 1000.0
        sps, ms_step, done = measure(ds, args.bs, args.group, args.steps,
                                     cfg)
        out[label] = {'samples_per_sec': round(sps, 1),
                      'ms_per_step': round(ms_step, 2),
                      'steps_timed': done,
                      'getitem_ms_per_sample': round(per_sample_ms, 2)}
        print(f'{label}: {sps:.1f} samples/s ({ms_step:.2f} ms/step, '
              f'getitem {per_sample_ms:.2f} ms/sample)', flush=True)
    os.makedirs(osp.dirname(args.out), exist_ok=True)
    with open(args.out, 'w') as f:
        json.dump(out, f, indent=1)
    print('wrote', args.out)


if __name__ == '__main__':
    main()
