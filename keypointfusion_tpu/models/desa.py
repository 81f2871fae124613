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

from keypointfusion_tpu.ops.ball_query import ball_query_group, group_features
from keypointfusion_tpu.models.resnet import conv_init


class DESA(nn.Module):
    in_channel: int = 128
    mlp: Sequence[int] = (128, 128)
    num_samples: Sequence[int] = (64, 64, 64)
    radius: Sequence[float] = (0.1, 0.2, 0.4)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pcl_feat, node_feat, pcl_xyz, node_xyz,
                 train: bool = False):
        """pcl_feat [B,N,C], node_feat [B,J,C], pcl_xyz [B,N,3],
        node_xyz [B,J,3] → [B,J,C]."""
        norm = lambda name: nn.BatchNorm(use_running_average=not train,
                                         momentum=0.9, epsilon=1e-5,
                                         dtype=self.dtype, name=name)
        support_xyz = jnp.concatenate([pcl_xyz, node_xyz], axis=1)
        support_feat = jnp.concatenate([pcl_feat, node_feat], axis=1)

        scale_outs = []
        for i, (r, s) in enumerate(zip(self.radius, self.num_samples)):
            idx, valid, rel_xyz = ball_query_group(support_xyz, node_xyz,
                                                   r, s)
            grouped_feat = group_features(support_feat, idx)   # [B,J,S,C]
            loc = nn.Dense(self.mlp[0], kernel_init=conv_init,
                           dtype=self.dtype, name=f'conv_l0_{i}')(rel_xyz / r)
            loc = norm(f'bn_l0_{i}')(loc)
            feat = grouped_feat - node_feat[:, :, None, :]
            feat = nn.Dense(self.mlp[0], kernel_init=conv_init,
                            dtype=self.dtype, name=f'conv_f0_{i}')(feat)
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
