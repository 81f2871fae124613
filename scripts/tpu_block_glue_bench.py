"""Inside-the-glue timing at bs=256 bf16 serving mode.

The floor-amortized component bench (ITERS=100) puts the serving forward
at 24.6 ms/batch = backbones 3.8 + 2x DESA 10.2 + sampler 4.7 + ~5.9 ms of
"glue". This script splits the glue: one full FusionBlock (minus its DESA
call, by differencing), the transformer stacks, the spatial-gate chunk
(heatmap + GAM + conv + fold), the embedding stack, and the per-model
decode/transform tail.
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
from keypointfusion_tpu.training.train_step import frame_from_batch

B, J, C, N, H = 256, 21, 128, 1024, 32
ITERS = 100
DT = jnp.bfloat16
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
    print(f"{name}: {ms:.3f} ms/batch", flush=True)
    return ms


def bf(*shape):
    return jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(DT)


# ---- full FusionBlock (pallas DESA on) ----
from keypointfusion_tpu.models.fusion_block import FusionBlock
from keypointfusion_tpu.ops.resize import resize_nearest_torch

img_feat = bf(B, H, H, C)
img_feat_rgb = bf(B, H, H, C)
sampled = bf(B, N, 2 * C + J)
weight_map = bf(B, H, H, J)
joint_xyz = jnp.asarray(
    rng.uniform(-.8, .8, (B, J, 3)).astype(np.float32)).astype(DT)
img_down = resize_nearest_torch(batch['depth'], H)
block = FusionBlock(joint_num=J, dim=C, dtype=DT, use_pallas_desa=True)
bvars = jax.jit(block.init, static_argnums=(10, 11))(
    jax.random.PRNGKey(2), img_feat, img_feat_rgb, batch['pcl'], joint_xyz,
    sampled, weight_map, None, frame, img_down, 0.8, False)


def block_fwd(samp):
    # perturb `sampled` — it feeds the DESA/embedding path. (Perturbing
    # img_feat measured 0.31 ms: the block never reads it beyond .shape,
    # so XLA hoisted the whole loop-invariant block out of the scan.)
    return block.apply(bvars, img_feat, img_feat_rgb, batch['pcl'],
                       joint_xyz, samp, weight_map, None, frame, img_down,
                       0.8, False)


timed("FusionBlock x1 (incl DESA)", block_fwd, sampled)

# ---- transformer stacks ----
from keypointfusion_tpu.models.transformer import CrossDecoder, KPInteraction

joint_feat = bf(B, J, C)
kp = KPInteraction(img_dim=C, dtype=DT)
kpv = jax.jit(kp.init)(jax.random.PRNGKey(3), joint_feat)
timed("KPInteraction x1", lambda x: kp.apply(kpv, x), joint_feat)

kp131 = KPInteraction(img_dim=C + 3, dtype=DT)
joint_feat131 = bf(B, J, C + 3)
kpv131 = jax.jit(kp131.init)(jax.random.PRNGKey(4), joint_feat131)
timed("KPInteraction x1 (dim131 final_TR)",
      lambda x: kp131.apply(kpv131, x), joint_feat131)

cd = CrossDecoder(hidden=C, joint_num=J, dtype=DT)
cdv = jax.jit(cd.init)(jax.random.PRNGKey(5), joint_feat, joint_feat)
timed("CrossDecoder x1", lambda x: cd.apply(cdv, x, joint_feat), joint_feat)

# ---- spatial-gate chunk: heatmap + GAM + gate fold ----
from keypointfusion_tpu.geometry.pcl import img_to_anchor_dis
from keypointfusion_tpu.ops.codecs import joint_to_heatmap, \
    pcl_joint_to_offset

timed("joint_to_heatmap", lambda jx: joint_to_heatmap(
    jx[..., :2], 0.8, H, sigma=1.0), joint_xyz)
timed("img_to_anchor_dis (GAM)", lambda jx: img_to_anchor_dis(
    jx, img_down, frame), joint_xyz)
timed("pcl_joint_to_offset", lambda jx: pcl_joint_to_offset(
    jx, batch['pcl'], 0.8), joint_xyz)


# gate fold: gate build + gated_w transpose + big einsum over relu feat
def gate_fold(feat_rgb, gate_flat):
    fc_w = jnp.ones((H * H, 1), DT)
    gated_w = jnp.transpose(gate_flat * fc_w, (0, 2, 1))
    relu_feat = jax.nn.relu(feat_rgb).reshape(B, H * H, C)
    return jnp.einsum('bjm,bmc->bjc', gated_w, relu_feat)


gate_flat = bf(B, H * H, J)
timed("gate fold einsum", gate_fold, img_feat_rgb, gate_flat)

# ---- embed stack (the five _EmbedBN + relus on [B,N,*]) ----
from keypointfusion_tpu.models.fusion_block import _EmbedBN

emb = _EmbedBN(C, DT)
pcl_feat_in = bf(B, N, C)
ev = jax.jit(emb.init, static_argnums=2)(
    jax.random.PRNGKey(6), pcl_feat_in, False)


def embed5(x):
    # five embeds + two relus + adds, shapes as in FusionBlock
    a = emb.apply(ev, x, False)
    b_ = emb.apply(ev, x, False)
    c_ = emb.apply(ev, x, False)
    y = jax.nn.relu(a + b_ + c_)
    d_ = emb.apply(ev, y, False)
    return jax.nn.relu(y + d_)


timed("embed stack (4x EmbedBN [B,N,C])", embed5, pcl_feat_in)
