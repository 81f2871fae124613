"""DESA — multi-scale local point-feature aggregation around each joint.

Rebuilds reference model/model.py:129-204 TPU-natively. Two formulations,
numerically consistent:

* gather (reference-shaped): pairwise-distance matmul + top-k + gathers
  (ops/ball_query.py), per-group 1x1 Conv2d+BN stacks as Dense+BN over the
  group axis, masked max over ball-query validity.
* dense (default): TPUs have no fast gather, so selection becomes a
  cumsum-rank mask and the per-group MLPs run densely over all support
  points — the Dense layers are linear, so the per-pair inputs split into
  precomputable per-point terms (Dense((a−b)/r) = (Dense(a)−Dense(b))/r +
  Dense(0)). The masked max is over exactly the same first-S-in-ball set.
  In training, BatchNorm statistics are computed over the same multiset the
  gather path's [B,J,S,C] tensor holds (first-S in-ball + out-of-ball fill
  slots, empty-ball slot 0 replaced by the closest point) via per-point
  slot multiplicities (WeightedTorchBatchNorm) — every group contributes
  exactly S weight, so stats match the gather path.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from keypointfusion_tpu.models.norm import WeightedTorchBatchNorm

from keypointfusion_tpu.ops.ball_query import (
    ball_query_group_matmul, exclusive_rank, group_features_matmul,
)
from keypointfusion_tpu.ops.pairwise import pairwise_sqdist
from keypointfusion_tpu.models.resnet import conv_init


def dense_group_masks(d2, radius: float, s: int):
    """Dense-formulation selection for one scale.

    d2 [B,J,M] squared distances. Returns (mask_max [B,J,M] bool — the
    first-S-in-ball points (or the closest point for empty balls) that feed
    the max-pool; weights [B,J,M] f32 — the slot multiplicity of every
    support point in the gather path's [B,J,S] group, summing to exactly S
    per (b,j), for BatchNorm statistics parity). The gather path pads short
    groups by REPEATING the slot-0 point (CUDA semantics,
    ops/ball_query.py), so the first in-ball point carries multiplicity
    1 + (S - k) when the ball holds k < S points."""
    in_ball = d2 < (radius * radius)                       # [B,J,M]
    ib = in_ball.astype(jnp.int32)
    rank_in = exclusive_rank(in_ball)                      # exclusive
    sel_in = in_ball & (rank_in < s)
    k_total = jnp.sum(ib, -1, keepdims=True)
    n_fill = (s - jnp.minimum(k_total, s)).astype(jnp.float32)
    first_in = (in_ball & (rank_in == 0)).astype(jnp.float32)
    w = sel_in.astype(jnp.float32) + n_fill * first_in

    # empty ball: every slot holds the closest point
    empty = (k_total == 0)
    closest_oh = jax.nn.one_hot(jnp.argmin(d2, -1), d2.shape[-1],
                                dtype=jnp.float32)
    w = jnp.where(empty, float(s) * closest_oh, w)
    mask_max = sel_in | (empty & (closest_oh > 0))
    return mask_max, jax.lax.stop_gradient(w)


class DESA(nn.Module):
    in_channel: int = 128
    mlp: Sequence[int] = (128, 128)
    num_samples: Sequence[int] = (64, 64, 64)
    radius: Sequence[float] = (0.1, 0.2, 0.4)
    dtype: Any = jnp.float32
    # inference-path fused Pallas kernel (kernels/desa_dense_pallas.py):
    # BN folded into the Dense weights, the whole dense formulation
    # VMEM-resident. Only taken in eval (training needs live batch
    # statistics).
    use_pallas: bool = False
    pallas_interpret: bool = False   # interpret mode for CPU tests
    # dense formulation (module docstring). Eval-only by default: the
    # dense TRAINING backward materializes [B,J,M,C] intermediates and
    # measured 2x slower than the gather path's backward (164 vs 89
    # ms/step at bs=64), so training keeps the gather formulation; the
    # weighted-BN dense train path remains available for A/B.
    dense_eval: bool = True
    dense_train: bool = False

    @nn.compact
    def __call__(self, pcl_feat, node_feat, pcl_xyz, node_xyz,
                 train: bool = False):
        """pcl_feat [B,N,C], node_feat [B,J,C], pcl_xyz [B,N,3],
        node_xyz [B,J,3] → [B,J,C]."""
        if self.use_pallas and not train and not self.is_initializing():
            # whole-DESA fused kernel (kernels/desa_dense_pallas.py):
            # VMEM-resident dense formulation, 11.9 vs 19.1 ms/batch for
            # the XLA dense path at bs=256 bf16 on v5e
            from keypointfusion_tpu.kernels.desa_dense_pallas import \
                desa_dense_fused
            v = self.variables
            # f32 model dtype asks for the exact MLP matmuls; bf16 serving
            # keeps the 6x-faster default MXU precision
            prec = 'highest' if jnp.dtype(self.dtype) == jnp.float32 \
                else 'default'
            return desa_dense_fused(
                v['params'], v['batch_stats'],
                pcl_feat.astype(self.dtype), node_feat.astype(self.dtype),
                pcl_xyz, node_xyz, radius=tuple(self.radius),
                num_samples=tuple(self.num_samples),
                interpret=self.pallas_interpret,
                mlp_precision=prec).astype(self.dtype)
        norm = lambda name: WeightedTorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        support_xyz = jnp.concatenate([pcl_xyz, node_xyz], axis=1)
        support_feat = jnp.concatenate([pcl_feat, node_feat], axis=1)
        # one pairwise-distance matmul shared by all scales
        d2 = pairwise_sqdist(node_xyz, support_xyz)

        dense = self.dense_train if train else self.dense_eval

        scale_outs = []
        for i, (r, s) in enumerate(zip(self.radius, self.num_samples)):
            dense_l = nn.Dense(self.mlp[0], kernel_init=conv_init,
                               dtype=self.dtype, name=f'conv_l0_{i}')
            dense_f = nn.Dense(self.mlp[0], kernel_init=conv_init,
                               dtype=self.dtype, name=f'conv_f0_{i}')
            if dense:
                valid, bn_w = dense_group_masks(d2, r, s)
                if not train:
                    bn_w = None   # eval BN uses running stats
                # linearity split (module docstring)
                zl = dense_l(jnp.zeros_like(node_xyz[:, :1]))   # bias [B,1,C]
                ls = dense_l(support_xyz)                       # [B,M,C]
                ln = dense_l(node_xyz)                          # [B,J,C]
                loc = (ls[:, None] - ln[:, :, None]) / r \
                    + zl[:, :, None]                            # [B,J,M,C]
                zf = dense_f(jnp.zeros_like(node_feat[:, :1]))
                fs = dense_f(support_feat)
                fn = dense_f(node_feat)
                feat = fs[:, None] - fn[:, :, None] + zf[:, :, None]
            else:
                # one-hot einsum grouping (ops/ball_query.py): top_k
                # lowers to a sort and gathers scatter in the backward —
                # the matmul form measured 2x faster fwd and much faster
                # bwd on TPU at training shapes
                p, valid, rel_xyz = ball_query_group_matmul(
                    support_xyz, node_xyz, r, s, d2=d2)
                grouped_feat = group_features_matmul(support_feat, p)
                loc = dense_l(rel_xyz / r)
                feat = dense_f(grouped_feat - node_feat[:, :, None, :])
                bn_w = None
            loc = norm(f'bn_l0_{i}')(loc, bn_w)
            feat = norm(f'bn_f0_{i}')(feat, bn_w)
            h = nn.relu(loc + feat)
            for k, out_ch in enumerate(self.mlp[1:]):
                h = nn.Dense(out_ch, kernel_init=conv_init, dtype=self.dtype,
                             name=f'conv_{i}_{k}')(h)
                h = nn.relu(norm(f'bn_{i}_{k}')(h, bn_w))
            # masked max over the group axis; slot 0 is always valid
            h = jnp.where(valid[..., None], h, -jnp.inf)
            scale_outs.append(jnp.max(h, axis=2))              # [B,J,mlp-1]

        scale_outs.append(node_feat)
        fused = jnp.concatenate(scale_outs, axis=-1)
        fused = nn.Dense(self.in_channel, kernel_init=conv_init,
                         dtype=self.dtype, name='fusion')(fused)
        fused = norm('fusion_bn')(fused)
        return nn.relu(fused)
