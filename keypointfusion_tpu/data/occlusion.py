"""Occlusion / visibility utilities from the demo preprocessing
(reference dataloader/processing_depth.py:1097-1131), jnp-native and
static-shape (the random mask count becomes a fixed max with per-mask
enables so the op stays jittable)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from keypointfusion_tpu.geometry.grid import uv_grid


def joint_visibility(pcl, joint, joint_kernel, min_support: int = 10):
    """A joint is visible when >min_support cloud points fall inside its
    kernel radius (processing_depth.py:1097-1104).

    pcl [B,N,3], joint [B,J,3], joint_kernel scalar or [J] → bool [B,J]."""
    offset = joint[:, :, None, :] - pcl[:, None, :, :]
    dis = jnp.sqrt(jnp.sum(offset ** 2, -1) + 1e-8)
    k = jnp.broadcast_to(jnp.asarray(joint_kernel, jnp.float32),
                         (joint.shape[1],))[None, :, None]
    heatmap = (k - dis) / k
    return jnp.sum(heatmap > 0, axis=-1) > min_support


def offset_map_visibility(offset_map, joint_num: int = 21,
                          min_support: int = 10):
    """Visibility from a dense 5J map's heatmap channels
    (processing_depth.py:1106-1109). offset_map [B,H,W,5J] NHWC."""
    heat = offset_map[..., joint_num * 3:joint_num * 4]
    return jnp.sum(heat > 0, axis=(1, 2)) > min_support


def mask_image(depth, joint_uvd, key, mask_offset: float = 0.2,
               mask_para: float = 0.3, num_masks: int = 6):
    """Random spherical occlusion augmentation: drop depth pixels near
    jittered joint locations (processing_depth.py:1111-1131).

    depth [B,H,W,1] normalized crop; joint_uvd [B,J,3]. Static-shape
    variant: always `num_masks` spheres (the reference samples 3..10)."""
    b, h, w, _ = depth.shape
    j = joint_uvd.shape[1]
    k1, k2, k3 = jax.random.split(key, 3)
    # choose joints with replacement (static shape; distribution difference
    # from the reference's no-replacement draw is negligible)
    joint_id = jax.random.randint(k1, (b, num_masks), 0, j)
    centers = jnp.take_along_axis(joint_uvd, joint_id[..., None], axis=1)
    centers = centers + (jax.random.uniform(k2, centers.shape) - 0.5) \
        * mask_offset * 2
    radius = jax.random.uniform(k3, (b, num_masks)) * mask_para

    grid = uv_grid(h).reshape(1, h * w, 2)
    mesh = jnp.concatenate(
        [jnp.broadcast_to(grid, (b, h * w, 2)), depth.reshape(b, h * w, 1)],
        axis=-1)
    dis = jnp.sqrt(jnp.sum(
        (mesh[:, None, :, :] - centers[:, :, None, :]) ** 2, -1))
    hit = jnp.sum(dis < radius[..., None], axis=1) > 0     # [B,HW]
    keep = ~hit
    return jnp.where(keep.reshape(b, h, w, 1), depth,
                     jnp.ones_like(depth))
