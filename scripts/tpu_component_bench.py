"""Per-component serving-path timing at bs=256 bf16 (chained methodology).

Breaks the full-forward batch time into: conv backbones, DESA kernel,
sampler kernel, and everything else — to target the next optimization.
"""

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
from keypointfusion_tpu.models.kpfusion import KPFusion
from keypointfusion_tpu.training.train_step import frame_from_batch

B = 256
ITERS = 100  # high count: the single ~25 ms fetch RTT amortizes to ~0.25 ms
cfg = Config()
print("device:", jax.devices()[0].device_kind, flush=True)

batch = {k: jnp.asarray(v) for k, v in synthetic_batch(
    batch_size=B, point_num=cfg.point_num, seed=0).items()}
frame = frame_from_batch(batch, cfg)


def timed(name, fn, *args):
    """Chained scan timing; fn's first arg is perturbed per iteration.
    The fetched value is reduced to a SCALAR on device — fetching a large
    output would time the remote tunnel's transfer, not the chip."""
    def chained(x0, *rest):
        def step(x, _):
            out = fn(x, *rest)
            # chain on ALL outputs — chaining one leaf lets XLA DCE the
            # rest inside the loop (observed: 6x under-measurement)
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
    print(f"{name}: {ms:.2f} ms/batch", flush=True)
    return ms


# ---- full model (both kernels) ----
model = KPFusion(net=cfg.net, joint_num=cfg.joint_num, dtype=jnp.bfloat16,
                 fast_topk=True, use_pallas_desa=True,
                 use_pallas_sampler=True)
variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch['rgb'],
                                batch['depth'], batch['pcl'], frame)


def full(rgb, depth, pcl):
    results, _ = model.apply(variables, rgb, depth, pcl, frame)
    return results[-1]


timed("full model", full, batch['rgb'], batch['depth'], batch['pcl'])

# ---- backbones only ----
from keypointfusion_tpu.models.unet import ResNetUNet

bb_d = ResNetUNet(depth=18, joint_num=21, out_dims=(63, 21, 21),
                  dtype=jnp.bfloat16)
bb_params_d = {'params': variables['params']['backbone_d'],
               'batch_stats': variables['batch_stats']['backbone_d']}
bb_params_rgb = {'params': variables['params']['backbone_rgb'],
                 'batch_stats': variables['batch_stats']['backbone_rgb']}


def both_backbones(depth, rgb):
    o1, f1 = bb_d.apply(bb_params_d, depth.astype(jnp.bfloat16))
    o2, f2 = bb_d.apply(bb_params_rgb, rgb.astype(jnp.bfloat16))
    return f1 + f2


timed("both backbones", both_backbones, batch['depth'], batch['rgb'])

# ---- DESA kernel alone (one call) ----
from keypointfusion_tpu.kernels.desa_dense_pallas import desa_dense_fused

desa_vars = {
    'params': variables['params']['block1']['FA'],
    'batch_stats': variables['batch_stats']['block1']['FA'],
}
rng = np.random.RandomState(0)
pcl_feat = jnp.asarray(rng.randn(B, 1024, 128).astype(np.float32)).astype(
    jnp.bfloat16)
node_feat = jnp.asarray(rng.randn(B, 21, 128).astype(np.float32)).astype(
    jnp.bfloat16)


def desa_once(pcl_feat, node_feat, pcl):
    return desa_dense_fused(desa_vars['params'], desa_vars['batch_stats'],
                            pcl_feat, node_feat, pcl, node_feat[..., :3]
                            .astype(jnp.float32))


timed("desa kernel x1", desa_once, pcl_feat, node_feat, batch['pcl'])

# ---- sampler kernel alone ----
from keypointfusion_tpu.kernels.pixel_sampler_pallas import (
    sample_pixel_features_fused,
)
from keypointfusion_tpu.geometry.grid import img_uvd_points
from keypointfusion_tpu.geometry.camera import uvd_nl_to_xyz_nl
from keypointfusion_tpu.ops.resize import resize_nearest_torch

img_down = resize_nearest_torch(batch['depth'], 32)
img_xyz = uvd_nl_to_xyz_nl(img_uvd_points(img_down), frame)
feat = jnp.asarray(rng.randn(B, 1024, 277).astype(np.float32)).astype(
    jnp.bfloat16)


def sampler_once(feat, pcl, img_xyz):
    return sample_pixel_features_fused(pcl, img_xyz, feat, k=4)


timed("sampler kernel x1", sampler_once, feat, batch['pcl'], img_xyz)
