"""Timing of the serving forward's non-kernel glue at bs=256 bf16:
offset_to_joint_weight decode, resize, coordinate transforms, and one
FusionBlock minus its DESA call (transformers + KFAM + codec tail) — to
see what the ~2.5 ms full-model remainder is made of."""

import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from keypointfusion_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from keypointfusion_tpu.config import Config
from keypointfusion_tpu.data.synthetic import synthetic_batch
from keypointfusion_tpu.geometry.camera import uvd_nl_to_xyz_nl, \
    xyz_nl_to_uvd_nl
from keypointfusion_tpu.ops.codecs import offset_to_joint_weight
from keypointfusion_tpu.ops.resize import resize_nearest_torch
from keypointfusion_tpu.training.train_step import frame_from_batch

B, J = 256, 21
ITERS = 100
cfg = Config()
print("device:", jax.devices()[0].device_kind, flush=True)

batch = {k: jnp.asarray(v) for k, v in synthetic_batch(
    batch_size=B, point_num=cfg.point_num, seed=0).items()}
frame = frame_from_batch(batch, cfg)
rng = np.random.RandomState(0)


def timed(name, fn, *args):
    def chained(x0, *rest):
        def step(x, _):
            out = fn(x, *rest)
            s = sum(l.sum().astype(jnp.float32)
                    for l in jax.tree_util.tree_leaves(out)
                    if jnp.issubdtype(l.dtype, jnp.floating))
            return x + s.astype(x.dtype) * jnp.asarray(
                1e-24, x.dtype), ()
        final, _ = jax.lax.scan(step, x0, None, length=ITERS)
        out = fn(final, *rest)
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(out))
    cc = jax.jit(chained).lower(*args).compile()
    warm = args[0] + jnp.asarray(7.0, args[0].dtype)
    jax.device_get(cc(warm, *args[1:]))
    t0 = time.perf_counter()
    jax.device_get(cc(*args))
    ms = (time.perf_counter() - t0) / (ITERS + 1) * 1000
    print(f"{name}: {ms:.3f} ms/batch", flush=True)
    return ms


img_offset = jnp.asarray(
    rng.randn(B, 32, 32, 5 * J).astype(np.float32)).astype(jnp.bfloat16)
depth = batch['depth']


def decode(img_offset, depth):
    return offset_to_joint_weight(img_offset, depth, cfg.feature_para[0])


timed("offset_to_joint_weight", decode, img_offset, depth)
timed("resize_nearest_torch 128->32", lambda d: resize_nearest_torch(d, 32),
      depth)

uvd = jnp.asarray(rng.uniform(-1, 1, (B, J, 3)).astype(np.float32))
timed("uvd<->xyz roundtrip", lambda u: xyz_nl_to_uvd_nl(
    uvd_nl_to_xyz_nl(u, frame), frame), uvd)

# FusionBlock minus DESA: time the full block, then its DESA kernel, and
# report the difference (transformers + KFAM + codecs + glue).
from keypointfusion_tpu.models.fusion_block import FusionBlock
from keypointfusion_tpu.models.kpfusion import KPFusion
from keypointfusion_tpu.kernels.desa_dense_pallas import desa_dense_fused

model = KPFusion(net=cfg.net, joint_num=cfg.joint_num, dtype=jnp.bfloat16,
                 fast_topk=True, use_pallas_desa=True,
                 use_pallas_sampler=True)
variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch['rgb'],
                                batch['depth'], batch['pcl'], frame)


def full(rgb):
    results, _ = model.apply(variables, rgb, batch['depth'], batch['pcl'],
                             frame)
    return results[-1]


ms_full = timed("full model", full, batch['rgb'])

desa_vars = {
    'params': variables['params']['block1']['FA'],
    'batch_stats': variables['batch_stats']['block1']['FA'],
}
pcl_feat = jnp.asarray(rng.randn(B, 1024, 128).astype(np.float32)).astype(
    jnp.bfloat16)
node_feat = jnp.asarray(rng.randn(B, J, 128).astype(np.float32)).astype(
    jnp.bfloat16)
ms_desa = timed("desa kernel x1", lambda pf: desa_dense_fused(
    desa_vars['params'], desa_vars['batch_stats'], pf, node_feat,
    batch['pcl'], node_feat[..., :3].astype(jnp.float32)), pcl_feat)
print(f"=> full - 2*desa = {ms_full - 2 * ms_desa:.2f} ms "
      f"(backbones+sampler+glue)", flush=True)
