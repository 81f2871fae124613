"""Component-level timing of the bs=64 'mixed' train step on hardware.

Splits the 52.9 ms/step (bench r3) into: backbone fwd+bwd (bf16), the
point->pixel index + sampling chain, the two FusionBlocks' fwd+bwd (f32),
and the loss/decode tail — each timed with the chained-scan methodology
(carry perturbed by the sum of ALL outputs so nothing is dead-code
eliminated; one scalar fetch stops the clock). Fixed random intermediates
stand in for real activations: every shape is static and no op here makes
data-dependent selections, so timing is value-independent.
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
from keypointfusion_tpu.geometry.pcl import (
    img_to_pcl_index, sample_pixel_features,
)
from keypointfusion_tpu.models.fusion_block import FusionBlock
from keypointfusion_tpu.models.kpfusion import _backbone
from keypointfusion_tpu.ops.resize import resize_nearest_torch
from keypointfusion_tpu.training.train_step import (
    create_train_state, frame_from_batch, make_train_step,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
JSON_OUT = sys.argv[2] if len(sys.argv) > 2 else None
J, C, N, H = 21, 128, 1024, 32
ITERS = 12
cfg = Config(batch_size=B, compute_dtype='mixed', fast_topk=True)
print("device:", jax.devices()[0].device_kind, "bs:", B, flush=True)
RESULTS = {}

batch = {k: jnp.asarray(v) for k, v in synthetic_batch(
    batch_size=B, point_num=cfg.point_num, seed=0).items()}
frame = frame_from_batch(batch, cfg)
rng = np.random.RandomState(0)


def timed(name, fn, *args):
    """Chained-scan timing: fn(x0, *rest) where x0 is a float array; the
    carry folds in the sum of all float outputs (incl. grads)."""
    def chained(x0, *rest):
        def step(x, _):
            out = fn(x, *rest)
            s = sum(l.sum().astype(jnp.float32)
                    for l in jax.tree_util.tree_leaves(out)
                    if jnp.issubdtype(l.dtype, jnp.floating))
            return x + s.astype(x.dtype) * jnp.asarray(1e-24, x.dtype), ()
        final, _ = jax.lax.scan(step, x0, None, length=ITERS)
        out = fn(final, *rest)
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(out)
                   if jnp.issubdtype(l.dtype, jnp.floating))
    cc = jax.jit(chained).lower(*args).compile()
    warm = args[0] + jnp.asarray(7.0, args[0].dtype)
    jax.device_get(cc(warm, *args[1:]))
    t0 = time.perf_counter()
    jax.device_get(cc(*args))
    ms = (time.perf_counter() - t0) / (ITERS + 1) * 1000
    print(f"{name}: {ms:.2f} ms/step-component", flush=True)
    RESULTS[name] = round(ms, 3)
    return ms


# ---- 1. both backbones, bf16, fwd + bwd wrt params (train mode) ----
bb_d = _backbone(cfg.net, J, jnp.bfloat16, 'backbone_d')
bb_rgb = _backbone(cfg.net, J, jnp.bfloat16, 'backbone_rgb')
vars_d = jax.jit(bb_d.init, static_argnums=2)(
    jax.random.PRNGKey(0), batch['depth'].astype(jnp.bfloat16), True)
vars_rgb = jax.jit(bb_rgb.init, static_argnums=2)(
    jax.random.PRNGKey(1), batch['rgb'].astype(jnp.bfloat16), True)


def backbones_grad(depth, rgb, pd, prgb, bsd, bsrgb):
    def loss(ps):
        (o1, f1), _ = bb_d.apply(
            {'params': ps[0], 'batch_stats': bsd}, depth.astype(jnp.bfloat16),
            True, mutable=['batch_stats'])
        (o2, f2), _ = bb_rgb.apply(
            {'params': ps[1], 'batch_stats': bsrgb}, rgb.astype(jnp.bfloat16),
            True, mutable=['batch_stats'])
        return (o1.astype(jnp.float32).sum() + f1.astype(jnp.float32).sum()
                + o2.astype(jnp.float32).sum()
                + f2.astype(jnp.float32).sum())
    return jax.grad(loss)((pd, prgb))


timed("backbones fwd+bwd (bf16)", backbones_grad, batch['depth'],
      batch['rgb'], vars_d['params'], vars_rgb['params'],
      vars_d['batch_stats'], vars_rgb['batch_stats'])

# ---- 2. point->pixel chain: index (fwd only) + sampling fwd+bwd ----
img_down = resize_nearest_torch(batch['depth'], H)
maps = jnp.asarray(rng.randn(B, H * H, 2 * C + J).astype(np.float32))


def index_fwd(depth):
    d = resize_nearest_torch(depth, H)
    cl, ix = img_to_pcl_index(batch['pcl'], d, frame, select_num=4,
                              exact=False)
    return cl


timed("img_to_pcl_index fast (fwd)", index_fwd, batch['depth'])

cl, ix = img_to_pcl_index(batch['pcl'], img_down, frame, select_num=4,
                          exact=False)
cl = jax.lax.stop_gradient(cl)


def sampling_grad(m):
    return jax.grad(
        lambda mm: sample_pixel_features(mm, cl, ix, H * H).sum())(m)


timed("sample_pixel_features fwd+bwd", sampling_grad, maps)

# ---- 3. the two FusionBlocks, f32, fwd + bwd wrt params ----
img_feat = jnp.asarray(rng.randn(B, H, H, C).astype(np.float32))
img_feat_rgb = jnp.asarray(rng.randn(B, H, H, C).astype(np.float32))
sampled = jnp.asarray(rng.randn(B, N, 2 * C + J).astype(np.float32))
weight_map = jnp.asarray(rng.randn(B, H, H, J).astype(np.float32))
joint_xyz = jnp.asarray(
    rng.uniform(-.8, .8, (B, J, 3)).astype(np.float32))
block = FusionBlock(joint_num=J, dim=C, dtype=jnp.float32)
bvars = jax.jit(lambda r: block.init(
    r, img_feat, img_feat_rgb, batch['pcl'], joint_xyz, sampled, weight_map,
    None, frame, img_down, 0.8, True))(
    {'params': jax.random.PRNGKey(2), 'dropout': jax.random.PRNGKey(3)})


def blocks_grad(feat, params, bs):
    def loss(p):
        total = jnp.float32(0)
        upd = None
        jx = joint_xyz
        for _ in range(2):
            (r3, r2, upd, sw), _ = block.apply(
                {'params': p, 'batch_stats': bs}, feat, img_feat_rgb,
                batch['pcl'], jx, sampled, weight_map, upd, frame,
                img_down, 0.8, True, rngs={'dropout': jax.random.PRNGKey(7)},
                mutable=['batch_stats'])
            total = total + r3.sum() + r2.sum() + sw.sum()
            jx = r2
        return total
    return jax.grad(loss)(params)


timed("2x FusionBlock fwd+bwd (f32)", blocks_grad, img_feat,
      bvars['params'], bvars['batch_stats'])

# ---- 4. loss/decode tail fwd+bwd (dense stage decode + 4 loss terms) ----
from keypointfusion_tpu.training.losses import compute_losses

fs = cfg.input_size // 4
dense = jnp.asarray(rng.randn(B, fs, fs, 5 * J).astype(np.float32))
r2a = jnp.asarray(rng.randn(B, J, 3).astype(np.float32) * .3)
sw_small = jnp.asarray(rng.rand(B, fs, fs, J).astype(np.float32))


def loss_tail_grad(d):
    def loss(dd):
        total, _ = compute_losses(
            (dd, dd * 1.01, r2a, r2a, r2a, r2a),
            (sw_small, sw_small), batch['depth'], batch['uvd_gt'],
            batch['xyz_gt'], frame, cfg, jnp.zeros((), jnp.int32))
        return total
    return jax.grad(loss)(d)


timed("loss tail fwd+bwd", loss_tail_grad, dense)

# ---- 5. full train step (reference point) ----
state = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                           steps_per_epoch=100)

# optimizer update alone (flattened AdamW on the full param vector)
grads_like = jax.tree_util.tree_map(
    lambda p: jnp.full(p.shape, 1e-3, p.dtype), state.params)


def opt_update(gs):
    up, _ = state.tx.update(gs, state.opt_state, state.params)
    return up


flat0 = jax.tree_util.tree_leaves(grads_like)[0]
timed("optimizer update (flattened AdamW)",
      lambda x, gs: opt_update(jax.tree_util.tree_map(
          lambda g: g + x.mean().astype(g.dtype) * 0, gs)),
      flat0, grads_like)

step = make_train_step(cfg)
rngs = jax.random.split(jax.random.PRNGKey(1), ITERS + 2)
ep = jnp.zeros((), jnp.int32)
state, m = step(state, batch, rngs[0], ep)
jax.device_get(m['loss'])
t0 = time.perf_counter()
for i in range(ITERS):
    state, m = step(state, batch, rngs[i + 1], ep)
loss = float(jax.device_get(m['loss']))
dt = (time.perf_counter() - t0) / ITERS * 1000
print(f"full train step: {dt:.2f} ms/step (loss={loss:.3f})", flush=True)
RESULTS['full train step'] = round(dt, 3)

if JSON_OUT:
    import json
    payload = {'batch_size': B, 'device': jax.devices()[0].device_kind,
               'compute_dtype': cfg.compute_dtype,
               'components_ms': RESULTS}
    with open(JSON_OUT, 'w') as f:
        json.dump(payload, f, indent=1)
    print('wrote', JSON_OUT, flush=True)
