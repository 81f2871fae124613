"""Differentiable MANO hand layer, pure jnp.

Rebuilds reference manopth/manopth/manolayer.py:110-274 as one jitted
function over dense matmuls (shape blend, pose blend, 3-level kinematic
chain, LBS) — every op maps onto the MXU; the per-finger python loops of
generic SMPL implementations are replaced by [B,5,...] batched composes
exactly like the reference's level-batched formulation.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from keypointfusion_tpu.mano.assets import ManoModel

_HP = jax.lax.Precision.HIGHEST

# finger chain levels (manolayer.py:197-199)
_LEV1 = np.array([1, 4, 7, 10, 13])
_LEV2 = np.array([2, 5, 8, 11, 14])
_LEV3 = np.array([3, 6, 9, 12, 15])
# transform reorder after concatenating [root, lev1, lev2, lev3]
_REORDER = np.array([0, 1, 6, 11, 2, 7, 12, 3, 8, 13, 4, 9, 14, 5, 10, 15])
# MANO joint order → visualization order (manolayer.py:260)
_JOINT_ORDER = np.array([0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18,
                         10, 11, 12, 19, 7, 8, 9, 20])


def quat_to_rotmat(quat: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (w,x,y,z) → [..., 3, 3] (manopth rodrigues_layer.py:15-40)."""
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    w, x, y, z = (quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3])
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    rot = jnp.stack([
        w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
        2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
        2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
    ], axis=-1)
    return rot.reshape(quat.shape[:-1] + (3, 3))


def batch_rodrigues(axisang: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] axis-angle → [..., 3, 3] rotation matrices via quaternions
    (manopth rodrigues_layer.py:43-54, incl. its +1e-8 norm guard)."""
    angle = jnp.linalg.norm(axisang + 1e-8, axis=-1, keepdims=True)
    axis = axisang / angle
    half = angle * 0.5
    quat = jnp.concatenate([jnp.cos(half), jnp.sin(half) * axis], axis=-1)
    return quat_to_rotmat(quat)


def _with_zeros(rot: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] + [..., 3] → [..., 4, 4] homogeneous transforms."""
    top = jnp.concatenate([rot, trans[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0., 0., 0., 1.], rot.dtype), top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def mano_forward(model: ManoModel,
                 pose_coeffs: jnp.ndarray,
                 betas: Optional[jnp.ndarray] = None,
                 trans: Optional[jnp.ndarray] = None,
                 ncomps: int = 45,
                 use_pca: bool = True,
                 flat_hand_mean: bool = True,
                 center_idx: Optional[int] = None,
                 pose_rotmats: Optional[jnp.ndarray] = None):
    """MANO LBS forward.

    Args:
      pose_coeffs: [B, 3 + ncomps] — global axis-angle rot (3) + PCA coeffs
        (use_pca) or per-joint axis-angles (ncomps=45, use_pca=False).
        Ignored if pose_rotmats given.
      betas: [B, 10] shape coefficients (None → model mean shape).
      trans: [B, 3] translation in meters (None/zero → optional centering).
      pose_rotmats: [B, 16, 3, 3] — direct rotation-matrix mode (the path
        mano_regHead uses, reference mano_head.py:207-223).

    Returns (verts [B,778,3], joints [B,21,3]) in millimeters.
    """
    shapedirs = jnp.asarray(model.shapedirs)
    posedirs = jnp.asarray(model.posedirs)
    v_template = jnp.asarray(model.v_template)
    J_regressor = jnp.asarray(model.J_regressor)
    weights = jnp.asarray(model.weights)

    if pose_rotmats is not None:
        batch = pose_rotmats.shape[0]
        root_rot = pose_rotmats[:, 0]
        rot_map = pose_rotmats[:, 1:]                         # [B,15,3,3]
    else:
        batch = pose_coeffs.shape[0]
        hand_coeffs = pose_coeffs[:, 3:3 + ncomps]
        if use_pca:
            comps = jnp.asarray(model.hands_components[:ncomps])
            full_hand_pose = hand_coeffs @ comps              # [B,45]
        else:
            full_hand_pose = hand_coeffs
        if not flat_hand_mean:
            full_hand_pose = full_hand_pose + jnp.asarray(model.hands_mean)
        all_aa = jnp.concatenate([pose_coeffs[:, :3], full_hand_pose],
                                 axis=1).reshape(batch, 16, 3)
        rots = batch_rodrigues(all_aa)                        # [B,16,3,3]
        root_rot = rots[:, 0]
        rot_map = rots[:, 1:]

    pose_map = (rot_map - jnp.eye(3, dtype=rot_map.dtype)).reshape(batch, 135)

    # shape blend + joint regression (manolayer.py:171-184)
    if betas is None:
        v_shaped = jnp.broadcast_to(v_template, (batch, 778, 3))
    else:
        v_shaped = jnp.einsum('vct,bt->bvc', shapedirs, betas, precision=_HP) + v_template
    th_j = jnp.einsum('jv,bvc->bjc', J_regressor, v_shaped, precision=_HP)   # [B,16,3]

    # pose blend (manolayer.py:187-188)
    v_posed = v_shaped + jnp.einsum('vcp,bp->bvc', posedirs, pose_map, precision=_HP)

    # 3-level kinematic chain (manolayer.py:193-229)
    root_j = th_j[:, 0]
    root_t = _with_zeros(root_rot, root_j)                    # [B,4,4]

    lev1_rot = rot_map[:, _LEV1 - 1]
    lev2_rot = rot_map[:, _LEV2 - 1]
    lev3_rot = rot_map[:, _LEV3 - 1]
    lev1_rel = _with_zeros(lev1_rot, th_j[:, _LEV1] - root_j[:, None])
    lev2_rel = _with_zeros(lev2_rot, th_j[:, _LEV2] - th_j[:, _LEV1])
    lev3_rel = _with_zeros(lev3_rot, th_j[:, _LEV3] - th_j[:, _LEV2])

    lev1_t = jnp.einsum('bij,bfjk->bfik', root_t, lev1_rel, precision=_HP)
    lev2_t = jnp.einsum('bfij,bfjk->bfik', lev1_t, lev2_rel, precision=_HP)
    lev3_t = jnp.einsum('bfij,bfjk->bfik', lev2_t, lev3_rel, precision=_HP)
    transforms = jnp.concatenate(
        [root_t[:, None], lev1_t, lev2_t, lev3_t], axis=1)[:, _REORDER]

    # make transforms relative to rest joints (manolayer.py:232-234)
    j_h = jnp.concatenate([th_j, jnp.zeros((batch, 16, 1), th_j.dtype)], -1)
    shifted = jnp.einsum('bjik,bjk->bji', transforms, j_h, precision=_HP)    # [B,16,4]
    rel = transforms - jnp.pad(shifted[..., None],
                               ((0, 0), (0, 0), (0, 0), (3, 0)))

    # LBS skinning (manolayer.py:236-246)
    T = jnp.einsum('bjik,vj->bvik', rel, weights, precision=_HP)             # [B,778,4,4]
    v_h = jnp.concatenate(
        [v_posed, jnp.ones((batch, 778, 1), v_posed.dtype)], -1)
    verts = jnp.einsum('bvik,bvk->bvi', T, v_h, precision=_HP)[..., :3]

    joints = transforms[:, :, :3, 3]                          # [B,16,3]
    tips = verts[:, model.tip_vertex_ids]
    joints = jnp.concatenate([joints, tips], axis=1)[:, _JOINT_ORDER]

    if trans is not None:
        verts = verts + trans[:, None]
        joints = joints + trans[:, None]
    elif center_idx is not None:
        center = joints[:, center_idx:center_idx + 1]
        verts = verts - center
        joints = joints - center

    return verts * 1000.0, joints * 1000.0
