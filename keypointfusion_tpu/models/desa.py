"""DESA — multi-scale local point-feature aggregation around each joint.

Rebuilds reference model/model.py:129-204 TPU-natively: the CUDA
QueryAndGroup kernels become one pairwise-distance matmul + top-k + gathers
(ops/ball_query.py), the per-group 1x1 Conv2d+BN stacks become Dense+BN over
the group axis, and the group max-pool is masked by ball-query validity
(exact under max-pooling, see ops/ball_query.py docstring).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from keypointfusion_tpu.models.norm import TorchBatchNorm

from keypointfusion_tpu.ops.ball_query import ball_query_group, group_features
from keypointfusion_tpu.ops.pairwise import pairwise_sqdist
from keypointfusion_tpu.models.resnet import conv_init


class DESA(nn.Module):
    in_channel: int = 128
    mlp: Sequence[int] = (128, 128)
    num_samples: Sequence[int] = (64, 64, 64)
    radius: Sequence[float] = (0.1, 0.2, 0.4)
    dtype: Any = jnp.float32
    # inference-path fused Pallas kernel (kernels/desa_pallas.py): BN
    # folded into the Dense weights, whole per-scale chain VMEM-resident.
    # Only taken in eval (training needs live batch statistics).
    use_pallas: bool = False
    pallas_interpret: bool = False   # interpret mode for CPU tests
    # dense eval path: no top_k, no gathers — selection becomes a cumsum
    # rank mask and the per-group MLPs run densely over all support points
    # (the Dense layers are linear, so grouped-input differences split into
    # precomputable per-point terms). Exactly the same first-S-in-ball
    # masked max as the gather path; ~4x faster on TPU at bs=256.
    dense_eval: bool = True

    @nn.compact
    def __call__(self, pcl_feat, node_feat, pcl_xyz, node_xyz,
                 train: bool = False):
        """pcl_feat [B,N,C], node_feat [B,J,C], pcl_xyz [B,N,3],
        node_xyz [B,J,3] → [B,J,C]."""
        if self.use_pallas and not train and not self.is_initializing():
            from keypointfusion_tpu.kernels.desa_pallas import \
                desa_apply_inference
            v = self.variables
            return desa_apply_inference(
                v['params'], v['batch_stats'],
                pcl_feat.astype(self.dtype), node_feat.astype(self.dtype),
                pcl_xyz, node_xyz, radius=tuple(self.radius),
                num_samples=tuple(self.num_samples),
                interpret=self.pallas_interpret).astype(self.dtype)
        norm = lambda name: TorchBatchNorm(use_running_average=not train,
                                         momentum=0.9, epsilon=1e-5,
                                         dtype=self.dtype, name=name)
        support_xyz = jnp.concatenate([pcl_xyz, node_xyz], axis=1)
        support_feat = jnp.concatenate([pcl_feat, node_feat], axis=1)
        # one pairwise-distance matmul shared by all scales
        d2 = pairwise_sqdist(node_xyz, support_xyz)

        dense = self.dense_eval and not train

        scale_outs = []
        for i, (r, s) in enumerate(zip(self.radius, self.num_samples)):
            dense_l = nn.Dense(self.mlp[0], kernel_init=conv_init,
                               dtype=self.dtype, name=f'conv_l0_{i}')
            dense_f = nn.Dense(self.mlp[0], kernel_init=conv_init,
                               dtype=self.dtype, name=f'conv_f0_{i}')
            if dense:
                # first-S-in-ball mask without top_k: exclusive-prefix rank
                in_ball = d2 < (r * r)                          # [B,J,M]
                rank = jnp.cumsum(in_ball.astype(jnp.int32), -1) - 1
                mask = in_ball & (rank < s)
                # closest-point fallback for empty balls
                none_valid = ~jnp.any(in_ball, -1, keepdims=True)
                closest = jnp.argmin(d2, -1)[..., None]
                m_ids = jnp.arange(d2.shape[-1])[None, None, :]
                mask = mask | (none_valid & (m_ids == closest))
                # Dense is linear: Dense((a-b)/r) = (Dense(a)-Dense(b))/r
                # + bias, so the per-pair inputs split into per-point terms
                zl = dense_l(jnp.zeros_like(node_xyz[:, :1]))   # bias [B,1,C]
                ls = dense_l(support_xyz)                       # [B,M,C]
                ln = dense_l(node_xyz)                          # [B,J,C]
                loc = (ls[:, None] - ln[:, :, None]) / r \
                    + zl[:, :, None]                            # [B,J,M,C]
                zf = dense_f(jnp.zeros_like(node_feat[:, :1]))
                fs = dense_f(support_feat)
                fn = dense_f(node_feat)
                feat = fs[:, None] - fn[:, :, None] + zf[:, :, None]
                valid = mask
            else:
                idx, valid, rel_xyz = ball_query_group(
                    support_xyz, node_xyz, r, s, d2=d2)
                grouped_feat = group_features(support_feat, idx)  # [B,J,S,C]
                loc = dense_l(rel_xyz / r)
                feat = dense_f(grouped_feat - node_feat[:, :, None, :])
            loc = norm(f'bn_l0_{i}')(loc)
            feat = norm(f'bn_f0_{i}')(feat)
            h = nn.relu(loc + feat)
            for k, out_ch in enumerate(self.mlp[1:]):
                h = nn.Dense(out_ch, kernel_init=conv_init, dtype=self.dtype,
                             name=f'conv_{i}_{k}')(h)
                h = nn.relu(norm(f'bn_{i}_{k}')(h))
            # masked max over the group axis; slot 0 is always valid
            h = jnp.where(valid[..., None], h, -jnp.inf)
            scale_outs.append(jnp.max(h, axis=2))              # [B,J,mlp-1]

        scale_outs.append(node_feat)
        fused = jnp.concatenate(scale_outs, axis=-1)
        fused = nn.Dense(self.in_channel, kernel_init=conv_init,
                         dtype=self.dtype, name='fusion')(fused)
        fused = norm('fusion_bn')(fused)
        return nn.relu(fused)
