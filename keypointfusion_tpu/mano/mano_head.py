"""MANO regression head + rotation conversions.

Rebuilds reference model/mano_head.py:17-251 (`mano_regHead` — defined in
the reference but never wired into KPFusion; provided here as the same
optional head) and util/mano.py:12-37 (`MANO` wrapper with fingertip
one-hot joint regressor).

TPU note: the reference goes rot6d → rotmat → axis-angle → (rodrigues back
to rotmat inside ManoLayer). Here the rotation matrices feed the LBS layer
directly (mano_forward(pose_rotmats=...)) — mathematically identical,
avoids the NaN-prone mat→aa→mat roundtrip in the gradient path; the
axis-angle form is still returned for API parity.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from keypointfusion_tpu.mano.assets import ManoModel
from keypointfusion_tpu.mano.manolayer import mano_forward

# mano_head.py fingertip vertices (differ from manolayer.py's tips)
FINGERTIP_VERTEX_IDX = [728, 353, 442, 576, 694]
OBMAN2MANO = [0, 5, 6, 7, 9, 10, 11, 17, 18, 19, 13, 14, 15, 1, 2, 3,
              8, 12, 20, 16, 4]


def rot6d_to_mat(x: jnp.ndarray) -> jnp.ndarray:
    """6D rotation representation → 3x3 matrices (Zhou et al.;
    reference mano_head.py:144-154). x [..., 6] → [..., 3, 3]."""
    a1, a2 = x[..., 0:3], x[..., 3:6]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True).clip(1e-8)
    a2p = a2 - jnp.sum(b1 * a2, -1, keepdims=True) * b1
    b2 = a2p / jnp.linalg.norm(a2p, axis=-1, keepdims=True).clip(1e-8)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def mat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices [..., 3, 3] → quaternions (w, x, y, z), branchless
    (numerically-stable variant of reference mano_head.py mat2quat)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # each candidate is the quaternion scaled by 4*q_k for its dominant
    # component k — normalization below removes the scale, so the dominant
    # slot carries the SQUARED term (e.g. 1+tr = 4w^2)
    q0 = jnp.stack([1 + tr, m21 - m12, m02 - m20, m10 - m01], -1)
    q1 = jnp.stack([m21 - m12, 1 + m00 - m11 - m22,
                    m01 + m10, m02 + m20], -1)
    q2 = jnp.stack([m02 - m20, m01 + m10,
                    1 - m00 + m11 - m22, m12 + m21], -1)
    q3 = jnp.stack([m10 - m01, m02 + m20, m12 + m21,
                    1 - m00 - m11 + m22], -1)
    cand = jnp.stack([q0, q1, q2, q3], -2)           # [..., 4, 4]
    scores = jnp.stack([tr, m00, m11, m22], -1)
    best = jnp.argmax(scores, -1)
    q = jnp.take_along_axis(cand, best[..., None, None].repeat(4, -1),
                            -2)[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-8)


def quat_to_aa(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (w,x,y,z) → axis-angle [..., 3]."""
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    xyz = q[..., 1:]
    norm = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(norm[..., 0], w)
    axis = xyz / jnp.maximum(norm, 1e-8)
    return axis * angle[..., None]


def mat_to_aa(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices → axis-angle (reference mano_head.py:156-173)."""
    return quat_to_aa(mat_to_quat(m))


def extended_joint_regressor(model: ManoModel) -> np.ndarray:
    """J_regressor [16,778] + 5 fingertip one-hots → [21,778]
    (reference mano_head.py:181-188, util/mano.py:14-27)."""
    onehots = np.zeros((5, model.J_regressor.shape[1]), np.float32)
    for i, v in enumerate(FINGERTIP_VERTEX_IDX):
        onehots[i, v] = 1.0
    return np.concatenate([model.J_regressor, onehots], 0)


class ManoRegHead(nn.Module):
    """features [B, feature_size] → MANO pose (16x6D) + shape → mesh/joints
    (reference mano_head.py:177-223)."""
    model: ManoModel
    feature_size: int = 1024
    neurons: Sequence[int] = (1024, 512)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features):
        x = features
        for i, n in enumerate(self.neurons):
            x = nn.Dense(n, dtype=self.dtype, name=f'base_{i}')(x)
            x = nn.leaky_relu(x, 0.01)
        pose6d = nn.Dense(16 * 6, dtype=self.dtype, name='pose_reg')(x)
        shape = nn.Dense(10, dtype=self.dtype, name='shape_reg')(x)

        rotmats = rot6d_to_mat(pose6d.reshape(-1, 16, 6))     # [B,16,3,3]
        pose_aa = mat_to_aa(rotmats).reshape(-1, 48)
        verts, joints = mano_forward(self.model, None, betas=shape,
                                     pose_rotmats=rotmats)
        return {
            'verts3d': verts,
            'joints3d': joints[:, OBMAN2MANO, :],
            'mano_shape': shape,
            'mano_pose': rotmats,
            'mano_pose_aa': pose_aa,
        }


def gt_mesh_from_mano_params(model: ManoModel, gt_mano_params, center, cube):
    """GT mesh construction from dataset MANO params
    (reference mano_head.py:225-251): axis-angle pose (48) + shape (10) +
    trans (3) → normalized crop coords via the [1,-1,-1] camera flip."""
    pose = gt_mano_params[:, :48]
    shape = gt_mano_params[:, 48:58]
    trans = gt_mano_params[:, 58:61]
    verts, joints = mano_forward(model, pose, betas=shape, trans=trans,
                                 use_pca=False, ncomps=45)
    cam_extr = jnp.asarray(np.diag([1., -1., -1.]).astype(np.float32))
    joints = joints @ cam_extr
    verts = verts @ cam_extr
    joints = (joints - center[:, None]) / cube[:, None] * 2
    verts = (verts - center[:, None]) / cube[:, None] * 2
    return {'verts3d': verts, 'joints3d': joints[:, OBMAN2MANO, :],
            'mano_shape': shape}
