"""Throughput benchmark: batched KPFusion RGB-D inference, frames/sec/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}
Baseline north star: >= 3000 RGB-D frames/sec/chip at bs >= 64 on v5e
(BASELINE.md). Runs in bfloat16 inference mode on the default device at
bs=256 — the throughput-optimal point (bs=64 is partially launch-latency
bound: 62k fps vs 242k at bs=256; both crush the 3k target).
"""

import json
import time

import numpy as np

BASELINE_FPS = 3000.0


def main():
    import jax
    from keypointfusion_tpu.utils.compile_cache import \
        enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    from keypointfusion_tpu.config import Config
    from keypointfusion_tpu.data.synthetic import synthetic_batch
    from keypointfusion_tpu.models.kpfusion import KPFusion
    from keypointfusion_tpu.training.train_step import frame_from_batch

    batch_size = 256
    cfg = Config(compute_dtype='bfloat16')
    np_batch = synthetic_batch(batch_size=batch_size,
                               point_num=cfg.point_num, seed=0)
    batch = {k: jnp.asarray(v) for k, v in np_batch.items()}
    frame = frame_from_batch(batch, cfg)

    model = KPFusion(net=cfg.net, joint_num=cfg.joint_num,
                     dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), batch['rgb'],
                           batch['depth'], batch['pcl'], frame)

    @jax.jit
    def forward(variables, rgb, depth, pcl, frame):
        results, _ = model.apply(variables, rgb, depth, pcl, frame)
        return results[-1]

    args = (variables, batch['rgb'], batch['depth'], batch['pcl'], frame)
    # compile + warmup
    forward(*args)[0].block_until_ready()
    for _ in range(3):
        forward(*args).block_until_ready()

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(*args)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    fps = batch_size * iters / dt

    print(json.dumps({
        "metric": "rgbd_frames_per_sec_per_chip_bs256",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == '__main__':
    main()
