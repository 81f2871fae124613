"""Standalone streaming-engine timing (bench.py's _measure_streaming)."""

import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax

from keypointfusion_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from bench import _measure_streaming
from keypointfusion_tpu.config import Config

print("device:", jax.devices()[0].device_kind, flush=True)
cfg = Config(compute_dtype='bfloat16', fast_topk=True)

# device-side cost of one pipeline dispatch (chained, host-fetch timed) —
# separates device compute from the host submit/fetch overheads
import time

import jax.numpy as jnp
import numpy as np

from keypointfusion_tpu.serving import StreamingEngine

eng = StreamingEngine(cfg, batch_size=64, img_hw=(480, 640),
                      use_pallas_desa=True, use_pallas_sampler=True)
rng = np.random.RandomState(0)
bs = 64
depth_f = np.zeros((bs, 480, 640), np.uint16)
depth_f[:, 160:320, 240:400] = rng.randint(500, 700, (bs, 160, 160)
                                           ).astype(np.uint16)
args = dict(
    depth=jnp.asarray(depth_f),
    rgb=jnp.asarray(rng.randint(0, 255, (bs, 480, 640, 3)
                                ).astype(np.uint8)),
    centers=jnp.asarray(np.tile(np.array([[320, 240, 600]], np.float32),
                                (bs, 1))),
    cube=jnp.asarray(np.full((bs, 3), 250, np.float32)),
    cam=jnp.asarray(np.tile(np.array([[600, 600, 320, 240]], np.float32),
                            (bs, 1))))


def chained(variables, depth_full, rgb, centers, cube, cam, key):
    def step(k, _):
        out = eng._pipeline(variables, depth_full, rgb, centers, cube,
                            cam, k)
        k2 = jax.random.fold_in(k, out[0, 0].astype(jnp.int32))
        return k2, ()
    k, _ = jax.lax.scan(step, key, None, length=20)
    return eng._pipeline(variables, depth_full, rgb, centers, cube, cam,
                         k)


cc = jax.jit(chained).lower(eng.variables, args['depth'], args['rgb'],
                            args['centers'], args['cube'], args['cam'],
                            jax.random.PRNGKey(0)).compile()
jax.device_get(cc(eng.variables, args['depth'], args['rgb'],
                  args['centers'], args['cube'], args['cam'],
                  jax.random.PRNGKey(1)))
t0 = time.perf_counter()
jax.device_get(cc(eng.variables, args['depth'], args['rgb'],
                  args['centers'], args['cube'], args['cam'],
                  jax.random.PRNGKey(2)))
ms = (time.perf_counter() - t0) / 21 * 1000
print(f"pipeline device-side: {ms:.2f} ms/batch "
      f"({bs / ms * 1000:.0f} fps ceiling)", flush=True)

fps = _measure_streaming(cfg)
print(f"streaming_fps_bs64: {fps:.1f}", flush=True)
