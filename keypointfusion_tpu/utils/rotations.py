"""Rotation-representation conversions and batched camera helpers.

Rebuilds the conversion toolbox of reference util/object_transform.py
(axis-angle / quaternion / rotation-matrix / euler / rot6d converters and
batch_xyz2uvd / batch_uvd2xyz, object_transform.py:473-548) on the shared
jnp primitives from the MANO stack.
"""

from __future__ import annotations

import jax.numpy as jnp

from keypointfusion_tpu.mano.manolayer import batch_rodrigues, quat_to_rotmat
from keypointfusion_tpu.mano.mano_head import (
    rot6d_to_mat, mat_to_quat, quat_to_aa, mat_to_aa,
)

__all__ = [
    'axis_angle_to_matrix', 'matrix_to_axis_angle', 'quaternion_to_matrix',
    'matrix_to_quaternion', 'quaternion_to_axis_angle',
    'axis_angle_to_quaternion', 'rot6d_to_matrix', 'matrix_to_rot6d',
    'euler_to_matrix', 'matrix_to_euler', 'batch_xyz_to_uvd',
    'batch_uvd_to_xyz',
]

axis_angle_to_matrix = batch_rodrigues
matrix_to_axis_angle = mat_to_aa
quaternion_to_matrix = quat_to_rotmat
matrix_to_quaternion = mat_to_quat
quaternion_to_axis_angle = quat_to_aa
rot6d_to_matrix = rot6d_to_mat


def axis_angle_to_quaternion(aa):
    angle = jnp.linalg.norm(aa + 1e-8, axis=-1, keepdims=True)
    axis = aa / angle
    half = angle * 0.5
    return jnp.concatenate([jnp.cos(half), jnp.sin(half) * axis], axis=-1)


def matrix_to_rot6d(m):
    """First two COLUMNS flattened (inverse of rot6d_to_mat, which stacks
    b1/b2/b3 as columns)."""
    return jnp.concatenate([m[..., :, 0], m[..., :, 1]], axis=-1)


def euler_to_matrix(euler):
    """XYZ-intrinsic euler angles [..., 3] → rotation matrices."""
    x, y, z = euler[..., 0], euler[..., 1], euler[..., 2]
    cx, sx = jnp.cos(x), jnp.sin(x)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cz, sz = jnp.cos(z), jnp.sin(z)
    rx = jnp.stack([jnp.ones_like(cx), 0 * cx, 0 * cx,
                    0 * cx, cx, -sx,
                    0 * cx, sx, cx], -1).reshape(euler.shape[:-1] + (3, 3))
    ry = jnp.stack([cy, 0 * cy, sy,
                    0 * cy, jnp.ones_like(cy), 0 * cy,
                    -sy, 0 * cy, cy], -1).reshape(euler.shape[:-1] + (3, 3))
    rz = jnp.stack([cz, -sz, 0 * cz,
                    sz, cz, 0 * cz,
                    0 * cz, 0 * cz, jnp.ones_like(cz)],
                   -1).reshape(euler.shape[:-1] + (3, 3))
    return rz @ ry @ rx


def matrix_to_euler(m):
    """Inverse of euler_to_matrix (XYZ intrinsic, gimbal-safe clamp)."""
    sy = -m[..., 2, 0]
    sy = jnp.clip(sy, -1.0, 1.0)
    y = jnp.arcsin(sy)
    x = jnp.arctan2(m[..., 2, 1], m[..., 2, 2])
    z = jnp.arctan2(m[..., 1, 0], m[..., 0, 0])
    return jnp.stack([x, y, z], axis=-1)


def batch_xyz_to_uvd(xyz, cam_para, flip: float = 1.0):
    """Camera-space mm → pixel uvd (object_transform.py:473-510 analogue).
    xyz [B,N,3]; cam_para [B,4]."""
    from keypointfusion_tpu.geometry.camera import points_3d_to_img
    return points_3d_to_img(xyz, cam_para[:, 0], cam_para[:, 1],
                            cam_para[:, 2], cam_para[:, 3], flip)


def batch_uvd_to_xyz(uvd, cam_para, flip: float = 1.0):
    from keypointfusion_tpu.geometry.camera import points_img_to_3d
    return points_img_to_3d(uvd, cam_para[:, 0], cam_para[:, 1],
                            cam_para[:, 2], cam_para[:, 3], flip)


class Compose:
    """Sequential transform composition (reference
    util/object_transform.py `Compose`)."""

    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x
