"""Pallas TPU kernel: fused DESA grouped-MLP-max-pool (inference path).

This is the TPU-native replacement for the hot inner loop of the CUDA
pointnet2 pipeline the reference depends on (reference model/model.py:
166-204): per joint, the grouped neighbor features go through
    loc = rel_xyz/r @ Wl + bl
    feat = (grouped - node) @ Wf + bf
    h = relu(loc + feat);  h = relu(h @ W2 + b2);  out = masked-max over S
With XLA this chain writes three [B,J,S,C] intermediates to HBM; the kernel
keeps everything resident in VMEM per batch element — one HBM read of the
grouped block, two MXU matmuls, one write of [J,C].

BatchNorms are folded into the Dense weights (inference running stats), so
this path serves eval/serving; training uses the XLA composition in
models/desa.py (which needs live batch statistics).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from keypointfusion_tpu.ops.ball_query import ball_query_group, group_features


def fold_bn(dense: dict, bn_params: dict, bn_stats: dict,
            eps: float = 1e-5) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold an inference BatchNorm affine into the preceding Dense:
    y = BN(xW + b) == x W' + b'."""
    w = jnp.asarray(dense['kernel'])
    b = jnp.asarray(dense.get('bias', jnp.zeros(w.shape[1], w.dtype)))
    scale = bn_params['scale'] / jnp.sqrt(bn_stats['var'] + eps)
    w2 = w * scale[None, :]
    b2 = (b - bn_stats['mean']) * scale + bn_params['bias']
    return w2, b2


def _kernel(rel_ref, grouped_ref, node_ref,
            wl_ref, bl_ref, wf_ref, bf_ref, w2_ref, b2_ref, out_ref):
    # rel_ref is zero-padded from 3 → 128 lanes (Mosaic last-dim tiling);
    # the zero lanes are inert through the padded Wl matmul.
    j, s, _ = rel_ref.shape
    c = grouped_ref.shape[-1]
    rel = rel_ref[:].reshape(j * s, rel_ref.shape[-1])
    feat3 = grouped_ref[:] - node_ref[:][:, None, :]     # [J,S,C]

    loc = jnp.dot(rel, wl_ref[:], preferred_element_type=jnp.float32)
    loc = loc + bl_ref[:][None, :]
    feat = jnp.dot(feat3.reshape(j * s, c), wf_ref[:],
                   preferred_element_type=jnp.float32)
    feat = feat + bf_ref[:][None, :]
    h = jnp.maximum(loc + feat, 0.0)
    h = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b2_ref[:][None, :], 0.0)

    # in-ball mask recomputed from rel (|rel/r| < 1); slot 0 is always the
    # closest-point fallback and therefore always kept (ops/ball_query.py)
    d2 = jnp.sum(rel * rel, axis=-1).reshape(j, s)
    slot0 = jax.lax.broadcasted_iota(jnp.int32, (j, s), 1) == 0
    keep = jnp.logical_or(d2 < 1.0, slot0)
    h = h.reshape(j, s, c)
    h = jnp.where(keep[..., None], h, -jnp.inf)
    out_ref[:] = jnp.max(h, axis=1)


@functools.partial(jax.jit, static_argnames=('interpret',))
def grouped_mlp_pool(rel_xyz, grouped_feat, node_feat, valid,
                     wl, bl, wf, bf, w2, b2, interpret: bool = False):
    """Fused per-scale DESA aggregation.

    rel_xyz [B,J,S,3] (already divided by radius), grouped_feat [B,J,S,C],
    node_feat [B,J,C], valid [B,J,S] bool; BN-folded weights
    wl [3,C], wf [C,C], w2 [C,C]. Returns [B,J,C]."""
    b, j, s, c = grouped_feat.shape
    del valid  # recomputed in-kernel from rel (see _kernel)
    pad = 128
    rel_pad = jnp.pad(rel_xyz.astype(jnp.float32),
                      ((0, 0), (0, 0), (0, 0), (0, pad - 3)))
    wl_pad = jnp.pad(wl.astype(jnp.float32), ((0, pad - 3), (0, 0)))

    grid = (b,)
    bspec = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    wspec = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    def kernel(rel, grouped, node, wl_, bl_, wf_, bf_, w2_, b2_, out):
        _kernel(rel.at[0], grouped.at[0], node.at[0],
                wl_, bl_, wf_, bf_, w2_, b2_, out.at[0])

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[bspec((j, s, pad)), bspec((j, s, c)), bspec((j, c)),
                  wspec((pad, c)), wspec((c,)), wspec((c, c)), wspec((c,)),
                  wspec((c, c)), wspec((c,))],
        out_specs=bspec((j, c)),
        out_shape=jax.ShapeDtypeStruct((b, j, c), jnp.float32),
        interpret=interpret,
    )(rel_pad, grouped_feat.astype(jnp.float32),
      node_feat.astype(jnp.float32),
      wl_pad, bl.astype(jnp.float32),
      wf.astype(jnp.float32), bf.astype(jnp.float32),
      w2.astype(jnp.float32), b2.astype(jnp.float32))


def desa_apply_inference(params: dict, batch_stats: dict,
                         pcl_feat, node_feat, pcl_xyz, node_xyz,
                         radius=(0.1, 0.2, 0.4), num_samples=(64, 64, 64),
                         interpret: bool = False):
    """Inference-path DESA forward on the fused kernel — numerically equal
    to models.desa.DESA.apply(..., train=False) (see tests).

    params/batch_stats: the DESA module subtrees ('conv_l0_0', 'bn_l0_0',
    ...) as produced by model.init or the torch converter."""
    support_xyz = jnp.concatenate([pcl_xyz, node_xyz], axis=1)
    support_feat = jnp.concatenate([pcl_feat, node_feat], axis=1)
    from keypointfusion_tpu.ops.pairwise import pairwise_sqdist
    d2 = pairwise_sqdist(node_xyz, support_xyz)

    outs = []
    for i, (r, s) in enumerate(zip(radius, num_samples)):
        idx, valid, rel = ball_query_group(support_xyz, node_xyz, r, s,
                                           d2=d2)
        grouped = group_features(support_feat, idx)
        wl, bl = fold_bn(params[f'conv_l0_{i}'], params[f'bn_l0_{i}'],
                         batch_stats[f'bn_l0_{i}'])
        wf, bf = fold_bn(params[f'conv_f0_{i}'], params[f'bn_f0_{i}'],
                         batch_stats[f'bn_f0_{i}'])
        w2, b2 = fold_bn(params['conv_%d_0' % i], params['bn_%d_0' % i],
                         batch_stats['bn_%d_0' % i])
        outs.append(grouped_mlp_pool(rel / r, grouped, node_feat, valid,
                                     wl, bl, wf, bf, w2, b2,
                                     interpret=interpret))
    outs.append(node_feat)
    fused = jnp.concatenate(outs, axis=-1)
    wfu, bfu = fold_bn(params['fusion'], params['fusion_bn'],
                       batch_stats['fusion_bn'])
    return jnp.maximum(fused @ wfu + bfu, 0.0)
