"""Evaluation metrics: mm joint error, batched Procrustes alignment, and
AUC-of-PCK — all vectorized (the reference runs Procrustes per-sample in a
Python loop on the host, reference train.py:346-357; here it is one batched
SVD under jit).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def xyz_to_error_mm(pred_xyz, gt_xyz, center, cube,
                    nyu_subset: bool = False):
    """Per-joint L2 error in millimeters after denormalizing by the crop
    (reference train.py:470-488). pred/gt [B,J,3] normalized xyz.
    Returns [B,J] (or [B,14] for the NYU 23-joint protocol subset)."""
    center = center[:, None, :]
    half_cube = cube[:, None, :] / 2.0
    pred_mm = pred_xyz * half_cube + center
    gt_mm = gt_xyz * half_cube + center
    err = jnp.sum((pred_mm - gt_mm) ** 2, axis=-1)
    if nyu_subset and pred_xyz.shape[1] == 23:
        calculate = jnp.asarray(
            [0, 2, 4, 6, 8, 10, 12, 14, 16, 17, 18, 21, 22, 20])
        err = err[:, calculate]
    return jnp.sqrt(err)


def rigid_align(A, B):
    """Batched similarity Procrustes: align A to B (scale+rot+trans).

    A, B: [..., N, 3]. Mirrors reference generateFeature.py:681-703 incl.
    the reflection fix via sign of det. Runs batched under jit."""
    n = A.shape[-2]
    cA = jnp.mean(A, axis=-2, keepdims=True)
    cB = jnp.mean(B, axis=-2, keepdims=True)
    H = jnp.einsum('...ni,...nj->...ij', A - cA, B - cB) / n
    U, s, Vh = jnp.linalg.svd(H)
    # reflection handling: flip last singular vector if det < 0
    det = jnp.linalg.det(jnp.einsum('...ji,...kj->...ik', Vh, U))  # det(V U^T)
    sign = jnp.where(det < 0, -1.0, 1.0)
    s = s.at[..., -1].multiply(sign)
    Vh = Vh.at[..., -1, :].multiply(sign[..., None])
    R = jnp.einsum('...ji,...kj->...ik', Vh, U)                    # V U^T
    varP = jnp.sum(jnp.var(A, axis=-2), axis=-1)
    c = jnp.sum(s, axis=-1) / varP
    t = -jnp.einsum('...,...ij,...j->...i', c, R, cA[..., 0, :]) \
        + cB[..., 0, :]
    A2 = jnp.einsum('...,...ij,...nj->...ni', c, R, A) + t[..., None, :]
    return A2


def pa_error_mm(pred_xyz, gt_xyz, center, cube):
    """Procrustes-aligned per-joint error in mm (vectorized replacement for
    the per-sample loop at reference train.py:346-357; alignment happens on
    normalized coords exactly as the reference does)."""
    aligned = rigid_align(pred_xyz, gt_xyz)
    return xyz_to_error_mm(aligned, gt_xyz, center, cube)


def pck_curve(errors_mm: np.ndarray, val_min=0.0, val_max=50.0, steps=20):
    """errors_mm [num_samples, J] → (auc, curve [steps], thresholds).
    Matches reference util/eval_utils.py:38-84 (trapezoid AUC, per-keypoint
    curves averaged over keypoints; thresholds in mm)."""
    thresholds = np.linspace(val_min, val_max, steps)
    norm = np.trapezoid(np.ones_like(thresholds), thresholds)
    # pck per keypoint per threshold
    pck = (errors_mm[None, :, :] <= thresholds[:, None, None]).mean(1)
    auc_per_kp = np.trapezoid(pck, thresholds, axis=0) / norm
    return float(auc_per_kp.mean()), pck.mean(-1), thresholds


def auc_subset(curve: np.ndarray, thresholds: np.ndarray,
               min_mm: float = 20.0):
    """AUC of the 20–50 mm tail (reference eval_utils.py:21-23). The start
    index is derived from the threshold grid rather than hardcoded (the
    reference's index 8 assumes exactly 20 thresholds over 0–50 mm)."""
    start_idx = int(np.searchsorted(thresholds, min_mm))
    x = thresholds[start_idx:]
    y = curve[start_idx:]
    return float(np.trapezoid(y, x) / np.trapezoid(np.ones_like(y), x))
