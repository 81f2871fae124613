"""Break down the on-device preprocessing cost at bs=64 (chained)."""

import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from keypointfusion_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from keypointfusion_tpu.data.device_preprocess import (
    device_crop, device_preprocess,
)
from keypointfusion_tpu.geometry.pcl import depth_to_pcl_fixed

print("device:", jax.devices()[0].device_kind, flush=True)
bs = 64
rng = np.random.RandomState(0)
depth_f = np.zeros((bs, 480, 640), np.float32)
depth_f[:, 160:320, 240:400] = rng.randint(500, 700, (bs, 160, 160))
args = (jnp.asarray(depth_f),
        jnp.asarray(rng.randint(0, 255, (bs, 480, 640, 3)
                                ).astype(np.float32)),
        jnp.asarray(np.tile(np.array([[320, 240, 600]], np.float32),
                            (bs, 1))),
        jnp.asarray(np.full((bs, 3), 250, np.float32)),
        jnp.asarray(np.tile(np.array([[600, 600, 320, 240]], np.float32),
                            (bs, 1))))


def timed(name, fn, x0, *rest):
    def chained(x0, *rest):
        def step(x, _):
            out = fn(x, *rest)
            # chain on ALL outputs: chaining only the first leaf lets XLA
            # dead-code-eliminate the rest inside the loop (this harness
            # under-measured depth_to_pcl_fixed by 6x that way)
            s = sum(l.sum().astype(jnp.float32)
                    for l in jax.tree_util.tree_leaves(out)
                    if jnp.issubdtype(l.dtype, jnp.floating))
            return x + s.astype(x.dtype) * jnp.asarray(
                1e-24, x.dtype), ()
        final, _ = jax.lax.scan(step, x0, None, length=20)
        out = fn(final, *rest)
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(out)
                   if jnp.issubdtype(l.dtype, jnp.floating))
    cc = jax.jit(chained).lower(x0, *rest).compile()
    warm = x0 + jnp.asarray(7.0, x0.dtype)
    jax.device_get(cc(warm, *rest))
    t0 = time.perf_counter()
    jax.device_get(cc(x0, *rest))
    ms = (time.perf_counter() - t0) / 21 * 1000
    print(f"{name}: {ms:.2f} ms/batch", flush=True)


def crop_only(d, rgb, c, cu, cam):
    dd, rr, fr = device_crop(d, rgb, c, cu, cam)
    return dd, rr


def preproc(d, rgb, c, cu, cam):
    return device_preprocess(d, rgb, c, cu, cam, jax.random.PRNGKey(0))[:3]


def pcl_only(d, rgb, c, cu, cam):
    dd, rr, fr = device_crop(d, rgb, c, cu, cam)
    return depth_to_pcl_fixed(dd, fr, jax.random.PRNGKey(0))


timed("device_crop", crop_only, *args)
timed("crop+pcl", pcl_only, *args)
timed("device_preprocess", preproc, *args)


def preproc_uint(d16, rgb8, c, cu, cam):
    # exactly the pipeline's ingest: compact dtypes cast on device
    return device_preprocess(d16.astype(jnp.float32),
                             rgb8.astype(jnp.float32), c, cu, cam,
                             jax.random.PRNGKey(0))[:3]


d16 = jnp.asarray(depth_f.astype(np.uint16))
rgb8 = jnp.asarray(rng.randint(0, 255, (bs, 480, 640, 3)
                               ).astype(np.uint8))


def timed_u(name, fn, x0, *rest):
    """uint carry: perturb by int increment."""
    def chained(x0, *rest):
        def step(x, _):
            out = fn(x, *rest)
            leaf = jax.tree_util.tree_leaves(out)[0]
            # runtime-zero (sums are non-negative) but NOT foldable — a
            # foldable zero would let XLA collapse the chain to one call
            bump = (leaf.sum().astype(jnp.int32) >> 31).astype(x.dtype)
            return x + bump, ()
        final, _ = jax.lax.scan(step, x0, None, length=20)
        out = fn(final, *rest)
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(out))
    cc = jax.jit(chained).lower(x0, *rest).compile()
    jax.device_get(cc(x0 + jnp.asarray(1, x0.dtype), *rest))
    t0 = time.perf_counter()
    jax.device_get(cc(x0, *rest))
    ms = (time.perf_counter() - t0) / 21 * 1000
    print(f"{name}: {ms:.2f} ms/batch", flush=True)


timed_u("device_preprocess uint ingest", preproc_uint, d16, rgb8,
        args[2], args[3], args[4])


# isolate depth_to_pcl_fixed: perturb the CROP input directly so neither
# the crop nor RNG hoisting confounds the number
from keypointfusion_tpu.training.train_step import frame_from_batch
from keypointfusion_tpu.data.synthetic import synthetic_batch
from keypointfusion_tpu.config import Config

sb = {k: jnp.asarray(v) for k, v in synthetic_batch(
    batch_size=bs, point_num=1024, seed=0).items()}
fr = frame_from_batch(sb, Config())


def pcl_fixed_only(depth_nl):
    return depth_to_pcl_fixed(depth_nl, fr, jax.random.PRNGKey(0))


timed("depth_to_pcl_fixed alone", pcl_fixed_only, sb['depth'])
