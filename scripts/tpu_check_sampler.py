"""On-hardware validation + timing of the fused pixel-sampler kernel.

Interpret mode can pass while Mosaic hardware lowering is silently wrong
(two such bugs were found in desa_dense_pallas.py in round 2), so before
benching: compare the kernel against the exact XLA path ON DEVICE, then
time eval-mode forwards with/without the fused sampler via the chained
data-dependent scan (bench.py methodology).
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
from keypointfusion_tpu.geometry.grid import img_uvd_points
from keypointfusion_tpu.geometry.camera import uvd_nl_to_xyz_nl
from keypointfusion_tpu.geometry.pcl import (
    img_to_pcl_index, sample_pixel_features,
)
from keypointfusion_tpu.kernels.pixel_sampler_pallas import (
    sample_pixel_features_fused,
)
from keypointfusion_tpu.models.kpfusion import KPFusion
from keypointfusion_tpu.ops.resize import resize_nearest_torch
from keypointfusion_tpu.training.train_step import frame_from_batch

cfg = Config()
print("device:", jax.devices()[0].device_kind, flush=True)

# ---- numeric check: kernel vs exact XLA path, on device, f32/HIGHEST ----
b, n, c = 4, 1024, 277
batch = {k: jnp.asarray(v) for k, v in synthetic_batch(
    batch_size=b, point_num=n, seed=0).items()}
frame = frame_from_batch(batch, cfg)
img_down = resize_nearest_torch(batch['depth'], 32)
rng = np.random.RandomState(0)
feat = jnp.asarray(rng.randn(b, 1024, c).astype(np.float32))


@jax.jit
def exact(pcl, img_down, feat):
    cl, idx = img_to_pcl_index(pcl, img_down, frame, select_num=4,
                               exact=True)
    return sample_pixel_features(feat, cl, idx, 1024)


@jax.jit
def fused(pcl, img_down, feat):
    img_xyz = uvd_nl_to_xyz_nl(img_uvd_points(img_down), frame)
    return sample_pixel_features_fused(pcl, img_xyz, feat, k=4,
                                       feat_precision='highest')


want = jax.device_get(exact(batch['pcl'], img_down, feat))
got = jax.device_get(fused(batch['pcl'], img_down, feat))
diff = np.abs(got - want)
print(f"sampler on-device max|diff| = {diff.max():.3e}  "
      f"frac>1e-4 = {(diff > 1e-4).mean():.4f}", flush=True)

# Mismatching rows must be explained by k-th-neighbor TIES (the regular
# pixel grid over a flat background plane produces exactly equidistant
# pixel pairs; the kernel's and XLA's HIGHEST-precision d2 accumulate in
# different orders, so tie-group members can swap). A mismatch WITHOUT a
# near-tie at the selection boundary is a real kernel bug.
from keypointfusion_tpu.ops.pairwise import pairwise_sqdist


@jax.jit
def d2_field(pcl, img_down):
    img_xyz = uvd_nl_to_xyz_nl(img_uvd_points(img_down), frame)
    return pairwise_sqdist(pcl, img_xyz)


d2 = jax.device_get(d2_field(batch['pcl'], img_down))
bad = np.argwhere(diff.max(-1) > 1e-3)
unexplained = 0
for bb, nn in bad:
    srt = np.sort(d2[bb, nn])
    # tie window anywhere in the top-5 boundary region
    gaps = np.abs(np.diff(srt[:6])) / np.maximum(srt[1:6], 1e-12)
    if gaps.min() > 1e-4:
        unexplained += 1
print(f"mismatch rows: {len(bad)}  unexplained (no boundary tie): "
      f"{unexplained}", flush=True)
assert unexplained == 0, "HARDWARE MISMATCH beyond tie flips — do not bench"

# ---- timing: eval forward, bf16 serving mode, bs=256 ----
ITERS = 20


def timed_variant(name, **model_kw):
    bsz = 256
    nb = {k: jnp.asarray(v) for k, v in synthetic_batch(
        batch_size=bsz, point_num=cfg.point_num, seed=0).items()}
    fr = frame_from_batch(nb, cfg)
    model = KPFusion(net=cfg.net, joint_num=cfg.joint_num,
                     dtype=jnp.bfloat16, **model_kw)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), nb['rgb'],
                                    nb['depth'], nb['pcl'], fr)

    def single(variables, rgb, depth, pcl, fr):
        results, _ = model.apply(variables, rgb, depth, pcl, fr)
        return results[-1]

    def chained(variables, rgb0, depth, pcl, fr):
        def step(rgb, _):
            out = single(variables, rgb, depth, pcl, fr)
            return rgb + out.sum().astype(rgb.dtype) * jnp.asarray(
                1e-24, rgb.dtype), ()
        final, _ = jax.lax.scan(step, rgb0, None, length=ITERS)
        return single(variables, final, depth, pcl, fr)

    cc = jax.jit(chained).lower(variables, nb['rgb'], nb['depth'],
                                nb['pcl'], fr).compile()
    warm = nb['rgb'] + jnp.asarray(7.0, nb['rgb'].dtype)
    jax.device_get(cc(variables, warm, nb['depth'], nb['pcl'], fr))
    t0 = time.perf_counter()
    jax.device_get(cc(variables, nb['rgb'], nb['depth'], nb['pcl'], fr))
    dt = time.perf_counter() - t0
    ms = dt / (ITERS + 1) * 1000
    print(f"{name}: {ms:.2f} ms/batch  {bsz * (ITERS + 1) / dt:.0f} fps",
          flush=True)


timed_variant("old serving (approx_topk+densify, pallas desa)",
              fast_topk=True, use_pallas_desa=True)
timed_variant("new serving (pallas sampler + pallas desa)",
              fast_topk=True, use_pallas_desa=True,
              use_pallas_sampler=True)
timed_variant("sampler only (no pallas desa)",
              fast_topk=True, use_pallas_sampler=True)
