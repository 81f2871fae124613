"""Pallas TPU kernel: whole-DESA dense inference in one VMEM-resident pass.

The XLA dense formulation (models/desa.py) is bandwidth-bound: each scale
writes and re-reads [B,J,M,C] intermediates (~4 GB/batch at bs=256). This
kernel keeps the entire per-batch-element computation in VMEM and writes
only the [J,C] result:

    d2 = pairwise(node, support)                       (MXU, in-kernel)
    mask_i = first-S-in-ball via a CHUNKED triangular-matmul rank
             (+ closest-point fallback for empty balls)
    A_i  = W_f,i @ featT + (W_l,i @ xyzT)/r            (MXU, in-kernel —
             the per-point linear terms of the BN-folded loc/feat layers;
             computing them here instead of XLA removes ~450 MB/batch of
             HBM traffic at bs=256)
    h1_i[j] = relu(A_i - B_i[j])                       (B_i: tiny per-node
                                                        terms, XLA)
    out_i[j] = maskedmax_m relu(W2_i h1 + b2_i)        (MXU per joint)
    out = relu(Wfu [out_0; out_1; out_2; node_feat] + bfu)

Numerically equal to DESA.apply(train=False) with BN running stats (same
masked-max set; the linearity split matches models/desa.py). The J loop is
unrolled (J=21 static), so each grid step issues 63 [C,C]x[C,M] matmuls
plus the d2/rank/A/fusion matmuls — ~2.9 GFLOP per batch element with only
~1.2 MB of HBM traffic.

Rank computation: first-S-in-ball needs an exclusive prefix count per
support point. v1 used one [Mp,Mp] strictly-upper triangular matmul
(340 MFLOP f32 per scale per element — the single most expensive op in
the kernel); v2 ranks hierarchically: per-128-chunk local rank via a
[128,128] triangular matmul plus a running scalar prefix — 9x fewer
FLOPs, identical integers.

Replaces the hot inner loop of the reference's CUDA pointnet2 pipeline
(reference model/model.py:129-204)."""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from keypointfusion_tpu.kernels.desa_pallas import fold_bn

NEG = -1e30


def _pad_to(x, axis, mult):
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _kernel(sup_xyzT_ref, node_rows_ref, supfT_ref, wfT_ref, wlT_ref,
            bt_ref, w2t_ref, b2_ref, nft_ref, wfut_ref, bfu_ref, tri_ref,
            out_ref, *, radii, inv_radii, num_samples, j_real, m_real,
            mlp_precision):
    # NOTE on addressing: every per-joint extraction below uses full-width
    # one-hot reductions / outer-product accumulation rather than 1-lane
    # slices or stores — Mosaic mis-lowers sub-tile lane addressing
    # (observed as silently wrong values on hardware; interpret mode was
    # fine).
    sx = sup_xyzT_ref[0]                                   # [128, Mp]
    nr = node_rows_ref[0]                                  # [Jp, 128]
    s2 = jnp.sum(sx * sx, axis=0, keepdims=True)           # [1, Mp]
    q2 = jnp.sum(nr * nr, axis=1, keepdims=True)           # [Jp, 1]
    # full-width contraction: both operands are zero-padded past the 3
    # coordinate lanes, so the extra lanes contribute exactly 0
    # HIGHEST precision: at default precision the MXU multiplies in bf16
    # and the ~0.8% d2 error flips in-ball membership at r^2 = 0.01
    # (observed on hardware; bit-accurate in interpret mode)
    cross = jax.lax.dot_general(
        nr, sx, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)                # [Jp, Mp]
    d2 = q2 + s2 - 2.0 * cross
    lane = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    d2 = jnp.where(lane < m_real, d2, jnp.float32(1e30))

    jp = out_ref.shape[-1]
    mp = d2.shape[-1]
    jrow = jax.lax.broadcasted_iota(jnp.int32, (1, jp), 1)       # [1, Jp]
    supfT = supfT_ref[0]                                   # [C, Mp]
    # MLP compute dtype: explicit bf16 operands in serving mode guarantee
    # single-pass MXU dots (f32 operands can lower to multi-pass bf16
    # passes depending on backend defaults); f32 in 'highest' parity mode
    cdt = jnp.bfloat16 if mlp_precision == jax.lax.Precision.DEFAULT \
        else jnp.float32

    scale_accs = []
    for i, r in enumerate(radii):
        # f32 masks throughout: Mosaic rejects narrow-bitwidth casts and
        # selects on i1 vectors
        ibf = jnp.where(d2 < jnp.float32(r * r), 1.0, 0.0)  # [Jp, Mp]
        # hierarchical exclusive prefix count: per-128-chunk local rank
        # (tri128[m',m] = 1 iff m' < m) + running chunk-sum prefix
        chunks = []
        prefix = jnp.zeros((d2.shape[0], 1), jnp.float32)
        for q in range(mp // 128):
            blk = ibf[:, q * 128:(q + 1) * 128]
            # bf16 operands are EXACT here (0/1 values, f32 accumulation
            # of counts <= 128) and single-pass on the MXU
            local = jax.lax.dot(blk.astype(jnp.bfloat16),
                                tri_ref[:].astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
            chunks.append(local + prefix)
            prefix = prefix + jnp.sum(blk, axis=1, keepdims=True)
        rank = jnp.concatenate(chunks, axis=1)             # [Jp, Mp]
        mask = ibf * jnp.where(rank < jnp.float32(num_samples[i]),
                               1.0, 0.0)
        cnt = prefix                                        # total in-ball
        dmin = jnp.min(d2, axis=1, keepdims=True)
        closest = jnp.where(d2 <= dmin, 1.0, 0.0)
        maskf = jnp.where(cnt > 0, mask, closest)          # [Jp, Mp] f32

        # per-point linear terms (BN-folded loc+feat layers), in-kernel:
        # A_i = W_f,i @ featT + (W_l,i @ xyzT) / r_i        [C, Mp]
        # (weight cast matches supfT's dtype — bf16 in serving mode)
        a = (jnp.dot(wfT_ref[i].astype(supfT.dtype), supfT,
                     precision=mlp_precision,
                     preferred_element_type=jnp.float32)
             + jnp.dot(wlT_ref[i], sx, precision=mlp_precision,
                       preferred_element_type=jnp.float32)
             * jnp.float32(inv_radii[i]))
        bv = bt_ref[0, i]                                  # [C, Jp]
        w2 = w2t_ref[i].astype(cdt)                        # [C, C]
        # all 128 columns of b2_ref[i] are identical
        b2col = jnp.mean(b2_ref[i], axis=1, keepdims=True)  # [C, 1]
        # NOTE: the h1/h2 VPU chain stays f32 on purpose — a full-bf16
        # variant (casts + bf16 elementwise) measured SLOWER (7.16 vs
        # 6.29 ms/call at bs=256): the v5e VPU does not pack bf16 lanes,
        # so the casts are pure overhead. Only the MXU dot operands are
        # cast down (single-pass matmul).
        acc = jnp.zeros((a.shape[0], jp), jnp.float32)
        for j in range(j_real):                            # static unroll
            oh_row = jnp.where(jrow == j, 1.0, 0.0)        # [1, Jp]
            bj = jnp.sum(bv * oh_row, axis=1, keepdims=True)   # [C, 1]
            h1 = jnp.maximum(a - bj, 0.0)                  # [C, Mp]
            h2 = jnp.dot(w2, h1.astype(cdt), precision=mlp_precision,
                         preferred_element_type=jnp.float32)
            h2 = jnp.maximum(h2 + b2col, 0.0)
            # static SUBLANE row slice (lane slices are the Mosaic
            # hazard, row slices lower fine) instead of a one-hot
            # reduction over the whole [Jp,Mp] mask per joint, and a
            # multiply-mask max instead of a where(NEG): h2 >= 0 after
            # the relu and the closest-point fallback guarantees a
            # non-empty mask row, so max(h2*mask) == maskedmax exactly
            mrow = maskf[j:j + 1, :]                       # [1, Mp]
            col = jnp.max(h2 * mrow, axis=1, keepdims=True)  # [C, 1]
            acc = acc + col * oh_row                       # outer product
        scale_accs.append(acc)

    cat = jnp.concatenate(
        scale_accs + [nft_ref[0].astype(jnp.float32)], axis=0)
    fused = jnp.dot(wfut_ref[:].astype(cdt), cat.astype(cdt),
                    precision=mlp_precision,
                    preferred_element_type=jnp.float32)    # [C, Jp]
    bfucol = jnp.mean(bfu_ref[:], axis=1, keepdims=True)
    out_ref[0] = jnp.maximum(fused + bfucol, 0.0)


@functools.partial(jax.jit, static_argnames=('radius', 'num_samples',
                                             'interpret', 'mlp_precision'))
def desa_dense_fused(params: dict, batch_stats: dict,
                     pcl_feat, node_feat, pcl_xyz, node_xyz,
                     radius=(0.1, 0.2, 0.4), num_samples=(64, 64, 64),
                     interpret: bool = False,
                     mlp_precision: str = 'default'):
    """Fused inference DESA. Args as in models.desa.DESA.__call__;
    params/batch_stats are the DESA module subtrees. Returns [B,J,C].

    mlp_precision: matmul precision for the A/per-joint-MLP/fusion dots
    ('default' = bf16 multiplies — right for the bf16 serving path and 6x
    faster; 'highest' = f32-exact, for parity tests). The d2 matmul is
    always HIGHEST: in-ball membership at r^2=0.01 cannot tolerate bf16
    rounding."""
    b, j, c = node_feat.shape
    sup_xyz = jnp.concatenate([pcl_xyz, node_xyz], axis=1)
    sup_feat = jnp.concatenate([pcl_feat, node_feat],
                               axis=1).astype(jnp.float32)
    m = sup_xyz.shape[1]
    mp = -(-m // 128) * 128
    jp = 128

    wfT_list, wlT_list, b_list, w2_list, b2_list = [], [], [], [], []
    for i, r in enumerate(radius):
        wl, bl = fold_bn(params[f'conv_l0_{i}'], params[f'bn_l0_{i}'],
                         batch_stats[f'bn_l0_{i}'])
        wf, bf = fold_bn(params[f'conv_f0_{i}'], params[f'bn_f0_{i}'],
                         batch_stats[f'bn_f0_{i}'])
        w2, b2 = fold_bn(params[f'conv_{i}_0'], params[f'bn_{i}_0'],
                         batch_stats[f'bn_{i}_0'])
        inv_r = 1.0 / r
        # tiny per-node terms stay in XLA (HIGHEST keeps them exact)
        b_i = (jnp.einsum('bjc,cd->bjd', node_feat.astype(jnp.float32), wf,
                          precision=jax.lax.Precision.HIGHEST)
               + jnp.einsum('bjc,cd->bjd', node_xyz.astype(jnp.float32),
                            wl, precision=jax.lax.Precision.HIGHEST)
               * inv_r - bf - bl)                           # [B,J,C]
        b_list.append(b_i)
        wfT_list.append(wf.T)                               # [C, C]
        # wl is [3, C]; pad the input dim to 128 so the in-kernel dot with
        # the zero-padded [128, Mp] coordinate rows is a full-width
        # contraction (extra rows multiply exact zeros)
        wlT_list.append(jnp.pad(wl.T, ((0, 0), (0, 128 - wl.shape[0]))))
        w2_list.append(w2.T)                                # [C_out, C]
        b2_list.append(jnp.broadcast_to(b2[:, None], (c, 128)))

    bt = _pad_to(jnp.stack(b_list, 1).transpose(0, 1, 3, 2), 3, jp)
    wfT = jnp.stack(wfT_list, 0).astype(jnp.float32)        # [3, C, C]
    wlT = jnp.stack(wlT_list, 0).astype(jnp.float32)        # [3, C, 128]
    w2t = jnp.stack(w2_list, 0).astype(jnp.float32)
    b2b = jnp.stack(b2_list, 0).astype(jnp.float32)

    wfu, bfu = fold_bn(params['fusion'], params['fusion_bn'],
                       batch_stats['fusion_bn'])
    wfut = wfu.T.astype(jnp.float32)                        # [C, 4C]
    bfub = jnp.broadcast_to(bfu[:, None], (c, 128)).astype(jnp.float32)

    sup_xyzT = _pad_to(_pad_to(
        sup_xyz.astype(jnp.float32).transpose(0, 2, 1), 1, 128), 2, 128)
    # serving ships the feature transpose in bf16 (its dot runs at bf16
    # anyway); 'highest' parity mode keeps f32
    supf_dtype = jnp.float32 if mlp_precision == 'highest' \
        else jnp.bfloat16
    supfT = _pad_to(sup_feat.astype(supf_dtype).transpose(0, 2, 1),
                    2, 128)                                 # [B, C, Mp]
    node_rows = _pad_to(_pad_to(
        node_xyz.astype(jnp.float32), 2, 128), 1, 32)
    nft = _pad_to(node_feat.astype(jnp.float32).transpose(0, 2, 1), 2, jp)

    # strictly-upper triangular ones for ONE 128-chunk: tri[m',m]=1 iff
    # m' < m (the chunked hierarchical rank needs only this block)
    tri = jnp.asarray(np.triu(np.ones((128, 128), np.float32), 1))

    jp_rows = node_rows.shape[1]
    prec = {'default': jax.lax.Precision.DEFAULT,
            'highest': jax.lax.Precision.HIGHEST}[mlp_precision]
    kernel = functools.partial(
        _kernel, radii=tuple(radius),
        inv_radii=tuple(1.0 / r for r in radius),
        num_samples=tuple(num_samples), j_real=j, m_real=m,
        mlp_precision=prec)
    bspec = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    wspec = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[bspec((128, mp)), bspec((jp_rows, 128)),
                  bspec((c, mp)),
                  wspec((3, c, c)), wspec((3, c, 128)),
                  bspec((3, c, jp)),
                  wspec((3, c, c)), wspec((3, c, 128)),
                  bspec((c, jp)), wspec((c, 4 * c)), wspec((c, 128)),
                  wspec((128, 128))],
        out_specs=bspec((c, jp)),
        out_shape=jax.ShapeDtypeStruct((b, c, jp), jnp.float32),
        interpret=interpret,
    )(sup_xyzT, node_rows, supfT, wfT, wlT,
      bt.astype(jnp.float32), w2t, b2b, nft, wfut, bfub, tri)
    return out[:, :, :j].transpose(0, 2, 1)
