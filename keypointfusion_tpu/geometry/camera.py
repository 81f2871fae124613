"""Camera model and crop-frame coordinate transforms (pure jnp, batched).

This module replaces the reference's "dataset object doubles as an on-device
coordinate-transform service" pattern (reference dataloader/loader.py:219-341,
760-841) with an explicit `CropFrame` pytree that the model takes as an
argument. All transforms are shape-static, fully batched, and differentiable,
so they fuse into the jitted forward pass on TPU.

Conventions (identical to the reference):
  * `uvd` — image-space points: u = column (x) pixel coord, v = row (y),
    d = depth in mm.
  * normalized uvd ("uvd_nl") — uv in [-1, 1] over the crop (img_size px),
    d in [-1, 1] over the crop cube depth around the crop center.
  * normalized xyz ("xyz_nl") — camera-space mm coords, centered at the crop
    center and scaled by cube/2.
  * `M` — the 3x3 affine crop transform from original image pixels to crop
    pixels (reference loader.py:303-338).
  * `flip` — the dataset's y-axis convention (+1 for DexYCB/HO3D/STB, -1 for
    NYU); static per dataset.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class CropFrame:
    """Per-sample camera intrinsics plus crop metadata.

    Shapes: fx/fy/fu/fv [B]; center [B,3] (crop center in camera mm, "com3D");
    M [B,3,3]; cube [B,3] (crop extent in mm).
    """
    fx: jnp.ndarray
    fy: jnp.ndarray
    fu: jnp.ndarray
    fv: jnp.ndarray
    center: jnp.ndarray
    M: jnp.ndarray
    cube: jnp.ndarray
    flip: float = struct.field(pytree_node=False, default=1.0)
    img_size: int = struct.field(pytree_node=False, default=128)

    @classmethod
    def from_batch(cls, cam_para, center, M, cube, flip=1.0, img_size=128):
        """cam_para: [B,4] (fx, fy, fu, fv) — the 9-tuple element the
        reference dataloaders emit (reference loader.py:1202)."""
        cam_para = jnp.asarray(cam_para)
        return cls(
            fx=cam_para[:, 0], fy=cam_para[:, 1],
            fu=cam_para[:, 2], fv=cam_para[:, 3],
            center=jnp.asarray(center), M=jnp.asarray(M),
            cube=jnp.asarray(cube), flip=float(flip), img_size=int(img_size),
        )

    @property
    def batch(self) -> int:
        return self.M.shape[0]


def inv3x3(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form batched 3x3 inverse (adjugate/det). Faster and more
    TPU-friendly than an LU solve for the tiny crop matrices."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    co_a = e * i - f * h
    co_b = -(d * i - f * g)
    co_c = d * h - e * g
    det = a * co_a + b * co_b + c * co_c
    adj = jnp.stack([
        jnp.stack([co_a, -(b * i - c * h), b * f - c * e], axis=-1),
        jnp.stack([co_b, a * i - c * g, -(a * f - c * d)], axis=-1),
        jnp.stack([co_c, -(a * h - b * g), a * e - b * d], axis=-1),
    ], axis=-2)
    return adj / det[..., None, None]


def points_img_to_3d(uvd, fx, fy, fu, fv, flip=1.0):
    """uvd [B,N,3] → camera xyz [B,N,3] (reference loader.py:265-275)."""
    fx = fx[:, None]
    fy = fy[:, None]
    fu = fu[:, None]
    fv = fv[:, None]
    x = (uvd[..., 0] - fu) * uvd[..., 2] / fx
    y = flip * (uvd[..., 1] - fv) * uvd[..., 2] / fy
    return jnp.stack([x, y, uvd[..., 2]], axis=-1)


def points_3d_to_img(xyz, fx, fy, fu, fv, flip=1.0):
    """camera xyz [B,N,3] → uvd [B,N,3] (reference loader.py:277-288; the
    asymmetric 1e-8 guard on u's division matches the reference exactly)."""
    fx = fx[:, None]
    fy = fy[:, None]
    fu = fu[:, None]
    fv = fv[:, None]
    u = xyz[..., 0] * fx / (xyz[..., 2] + 1e-8) + fu
    v = flip * xyz[..., 1] * fy / xyz[..., 2] + fv
    return jnp.stack([u, v, xyz[..., 2]], axis=-1)


def transform_points_2d(uvd, M):
    """Apply the 3x3 affine M to the uv part, keep d (loader.py:836-841).

    uvd [B,N,3], M [B,3,3] (or [B,N,3,3])."""
    # elementwise affine (full f32 on the VPU — a dot_general here would run
    # at default bf16 matmul precision and cost ~1px of error)
    if M.ndim == 3:
        M = M[:, None]  # [B,1,3,3]
    u, v = uvd[..., 0], uvd[..., 1]
    u2 = M[..., 0, 0] * u + M[..., 0, 1] * v + M[..., 0, 2]
    v2 = M[..., 1, 0] * u + M[..., 1, 1] * v + M[..., 1, 2]
    return jnp.stack([u2, v2, uvd[..., 2]], axis=-1)


def _unnormalize_uvd(uvd, frame: CropFrame):
    cube_z = frame.cube[:, None, 2:]
    center_z = frame.center[:, None, 2:]
    uv = (uvd[..., :2] + 1.0) * (frame.img_size / 2.0)
    d = uvd[..., 2:] * (cube_z / 2.0) + center_z
    return jnp.concatenate([uv, d], axis=-1)


def uvd_nl_to_xyz(uvd, frame: CropFrame):
    """Normalized crop uvd → un-normalized camera xyz (loader.py:760-773)."""
    uvd_unnormal = _unnormalize_uvd(uvd, frame)
    uvd_world = transform_points_2d(uvd_unnormal, inv3x3(frame.M))
    return points_img_to_3d(uvd_world, frame.fx, frame.fy, frame.fu, frame.fv,
                            frame.flip)


def uvd_nl_to_xyz_nl(uvd, frame: CropFrame):
    """Normalized crop uvd → normalized xyz (loader.py:775-789)."""
    xyz = uvd_nl_to_xyz(uvd, frame)
    center = frame.center[:, None, :]
    half_cube = frame.cube[:, None, :] / 2.0
    return (xyz - center) / half_cube


def xyz_nl_to_uvd_nl(xyz, frame: CropFrame):
    """Normalized xyz → normalized crop uvd (loader.py:821-834)."""
    center = frame.center[:, None, :]
    half_cube = frame.cube[:, None, :] / 2.0
    xyz_mm = xyz * half_cube + center
    uvd = points_3d_to_img(xyz_mm, frame.fx, frame.fy, frame.fu, frame.fv,
                           frame.flip)
    uvd = transform_points_2d(uvd, frame.M)
    uv = uvd[..., :2] / frame.img_size * 2.0 - 1.0
    d = (uvd[..., 2:] - center[..., 2:]) / (half_cube[..., 2:])
    return jnp.concatenate([uv, d], axis=-1)
