"""Pallas TPU kernel: fused point→pixel feature sampling for serving.

Replaces the serving path's three-op chain — pairwise d2 (matmul), top-k
neighbor selection (`lax.approx_min_k`, ~12 ms/batch at [256·1024,1024]),
weight densification to [B,N,HW] (~4 ms + 1 GB HBM write) and the dense
sampling matmul — with ONE VMEM-resident pass per batch element
(reference semantics: loader.py:936-967 img2pcl_index "version 1"
weighting + the gathers of model/model.py:297-306):

    d2[n,m]  = ‖pcl_n − img_xyz_m‖²           (MXU, HIGHEST — bf16 MXU
                                               rounding flips selection
                                               comparisons, see
                                               desa_dense_pallas.py)
    sel[n,:] = k smallest entries of d2[n,:]
    w[n,m]   = sel / (d2 + 1e-8),              row-normalized
    out[n,:] = w[n,:] @ flat_feat              (MXU)

The [B,N,HW] weight matrix never exists in HBM: traffic is just the
inputs + the [B,N,C] output. Two modes (feat_precision):
  * 'highest' — f32 traffic, f32-exact dots, exact lax.top_k selection
    incl. lowest-index tie-break (flat-background depth crops produce
    exact d2 ties on the symmetric pixel grid, so tie order matters for
    bit-parity); used by parity tests.
  * 'default' (serving) — bf16 traffic + single-pass MXU dots, and
    threshold selection: every pixel at distance <= the k-th smallest is
    selected, so exact boundary ties admit all tied members (the cheap
    half of the reduction budget; quality-neutral).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30


def _pad_lanes(x, mult: int = 128):
    pad = (-x.shape[-1]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
    return jnp.pad(x, widths)


def _kernel(pcl_ref, img_xyzT_ref, feat_ref, out_ref, *, k, hw_real,
            feat_precision, exact_ties, ones_col=None):
    px = pcl_ref[0]                                         # [N, 128]
    ix = img_xyzT_ref[0]                                    # [128, HW]
    if exact_ties:
        # parity mode must bit-match the XLA exact path's d2, which uses
        # the ||a||^2+||b||^2-2ab expansion (ops/pairwise.py) — tie values
        # round identically only if the arithmetic matches
        pn2 = jnp.sum(px * px, axis=1, keepdims=True)       # [N, 1]
        in2 = jnp.sum(ix * ix, axis=0, keepdims=True)       # [1, HW]
        cross = jax.lax.dot_general(
            px, ix, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)             # [N, HW]
        d2 = pn2 + in2 - 2.0 * cross
    else:
        # serving: d2 directly on the VPU — 3 broadcast-subtract-FMA
        # passes. The MXU alternative is a 128-deep contraction (125
        # padded lanes) needing HIGHEST (6-pass) for f32 accuracy — ~3x
        # the time of the direct form, which is also MORE precise
        # (squared differences, no expansion cancellation). Coordinate
        # rows/columns are extracted by one-hot reductions (sub-tile
        # slices mis-lower).
        n_rows = px.shape[0]
        plane = jax.lax.broadcasted_iota(jnp.int32, (n_rows, 128), 1)
        srow = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
        d2 = jnp.zeros((n_rows, ix.shape[1]), jnp.float32)
        for coord in range(3):
            pc = jnp.sum(jnp.where(plane == coord, px, 0.0), axis=1,
                         keepdims=True)                     # [N, 1]
            xc = jnp.sum(jnp.where(srow == coord, ix, 0.0), axis=0,
                         keepdims=True)                     # [1, HW]
            diff = pc - xc
            d2 = d2 + diff * diff
    lane = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    if hw_real < d2.shape[1]:  # no mask pass when HW is already tile-sized
        d2 = jnp.where(lane < hw_real, d2, jnp.float32(BIG))

    # k smallest per row. Full-row lane reductions are the kernel's real
    # cost (each min over 1024 lanes is a multi-step shuffle cascade), so
    # the two modes trade them differently:
    #  * exact_ties (parity): one-at-a-time min + argmin-mask sweeps —
    #    lowest-index tie-break, matching lax.top_k exactly (2 reductions
    #    per sweep);
    #  * serving: threshold sweeps only (1 reduction per sweep) — all
    #    pixels at distance <= the k-th-smallest are selected, so a tie
    #    AT the boundary admits every tied member (their weights join the
    #    normalization; selection differs from top_k only on exact ties).
    # f32 masks throughout (Mosaic rejects selects on narrow vectors, see
    # desa_dense_pallas.py).
    if exact_ties:
        inv = 1.0 / (d2 + jnp.float32(1e-8))
        lane_f = lane.astype(jnp.float32)
        t = d2
        sel = jnp.zeros_like(d2)
        for _ in range(k):
            m = jnp.min(t, axis=1, keepdims=True)
            is_min = jnp.where(t <= m, 1.0, 0.0)
            idx_min = jnp.min(
                jnp.where(is_min > 0, lane_f, jnp.float32(BIG)),
                axis=1, keepdims=True)
            pick = is_min * jnp.where(lane_f == idx_min, 1.0, 0.0)
            sel = sel + pick
            t = t + pick * jnp.float32(BIG)
        w = sel * inv

        # normalization sum via an MXU ones-matmul instead of another
        # full-row lane reduction; all 128 result columns are identical.
        # Weights are cast to the feat dtype FIRST so the normalizer sums
        # exactly the values the sampling dot multiplies.
        wc = w.astype(feat_ref.dtype)
        ones = jnp.ones((d2.shape[1], 128), feat_ref.dtype)
        sumw = jax.lax.dot_general(
            wc, ones, (((1,), (0,)), ((), ())),
            precision=feat_precision,
            preferred_element_type=jnp.float32)            # [BN, 128]
        denom = jnp.mean(sumw, axis=1, keepdims=True) + jnp.float32(1e-8)
        res = jax.lax.dot_general(
            wc, feat_ref[0], (((1,), (0,)), ((), ())),
            precision=feat_precision,
            preferred_element_type=jnp.float32)
        out_ref[0] = (res / denom).astype(out_ref.dtype)
        return

    # serving: the kernel is bound by full [N,HW] VPU passes, not the
    # MXU, so every sweep recomputes from d2 with the where fused into
    # the min-reduction — nothing but d2 itself is ever materialized.
    # m_{i+1} = min{d2 : d2 > m_i}  (same admit-all-boundary-ties
    # semantics as the masked-update form this replaces).
    thresh = jnp.min(d2, axis=1, keepdims=True)
    for _ in range(k - 1):
        thresh = jnp.min(
            jnp.where(d2 <= thresh, jnp.float32(BIG), d2),
            axis=1, keepdims=True)
    w = jnp.where(d2 <= thresh, 1.0 / (d2 + jnp.float32(1e-8)), 0.0)
    # ONE sampling matmul: the wrapper wrote a 1.0s column into feat's
    # channel-pad region (ones_col), so the normalizer arrives as that
    # column of the product — no second [N,HW]-reading matmul.
    wc = w.astype(feat_ref.dtype)
    res = jax.lax.dot_general(
        wc, feat_ref[0], (((1,), (0,)), ((), ())),
        precision=feat_precision,
        preferred_element_type=jnp.float32)                # [BN, Cp]
    csel = jax.lax.broadcasted_iota(jnp.int32, res.shape, 1)
    denom = jnp.sum(jnp.where(csel == ones_col, res, 0.0), axis=1,
                    keepdims=True) + jnp.float32(1e-8)
    out_ref[0] = (res / denom).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('k', 'interpret',
                                             'feat_precision'))
def sample_pixel_features_fused(pcl_xyz, img_xyz, flat_feat, k: int = 4,
                                interpret: bool = False,
                                feat_precision: str = 'default'):
    """pcl_xyz [B,N,3] normalized xyz; img_xyz [B,HW,3] back-projected
    pixel xyz (geometry.pcl.img_to_pcl_index computes the same field);
    flat_feat [B,HW,C] maps to sample. Returns [B,N,C] (f32 under
    'highest', bf16 under 'default' — serving halves the HBM traffic).

    feat_precision: the w@feat matmul ('default' = bf16 MXU multiplies for
    serving; 'highest' for f32-exact comparisons). The d2 matmul is always
    HIGHEST."""
    b, n, _ = pcl_xyz.shape
    hw = img_xyz.shape[1]
    c = flat_feat.shape[-1]
    exact = feat_precision == 'highest'
    # serving needs one spare channel column for the fused normalizer
    cp = -(-c // 128) * 128 if exact else -(-(c + 1) // 128) * 128
    hwp = -(-hw // 128) * 128

    px = _pad_lanes(pcl_xyz.astype(jnp.float32))            # [B,N,128]
    ixT = _pad_lanes(_pad_lanes(
        img_xyz.astype(jnp.float32)).transpose(0, 2, 1), 128)  # [B,128,HWp]
    # f32 features only for the exact path; the serving dot is bf16 anyway
    feat_dtype = jnp.float32 if exact else jnp.bfloat16
    feat = flat_feat.astype(feat_dtype)
    if not exact:
        # ones column in the pad region: the sampling matmul then emits
        # each row's weight sum at this column (padded HW rows carry 0 so
        # they never contribute — their d2 is BIG, w=0, anyway)
        feat = jnp.concatenate(
            [feat, jnp.ones((b, hw, 1), feat_dtype)], axis=-1)
    feat = _pad_lanes(feat)                                 # [B,HW,Cp]
    if hwp != hw:
        feat = jnp.pad(feat, ((0, 0), (0, hwp - hw), (0, 0)))

    prec = {'default': jax.lax.Precision.DEFAULT,
            'highest': jax.lax.Precision.HIGHEST}[feat_precision]
    kernel = functools.partial(_kernel, k=k, hw_real=hw,
                               feat_precision=prec, exact_ties=exact,
                               ones_col=None if exact else c)
    # block the point axis: a full [N,HW] f32 distance field plus the
    # exact mode's selection temporaries exceeds the 16 MB VMEM budget at
    # N=1024. Serving mode's threshold selection + bf16 features hold few
    # enough temporaries to run unblocked (one grid step per element);
    # the exact mode's extra f32 temporaries need 256-row blocks.
    if feat_precision != 'highest' and n % 512 == 0:
        bn = 1024 if n % 1024 == 0 else 512
    elif n % 256 == 0:
        bn = 256
    else:
        bn = n
    out = pl.pallas_call(
        kernel,
        grid=(b, n // bn),
        in_specs=[
            pl.BlockSpec((1, bn, 128), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128, hwp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hwp, cp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bn, cp), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, cp), feat_dtype),
        interpret=interpret,
    )(px, ixT, feat)
    return out[:, :, :c]
