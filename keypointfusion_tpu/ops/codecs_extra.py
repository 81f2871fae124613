"""Legacy/auxiliary dense codecs — the rest of the reference GFM family
(reference util/generateFeature.py), plus the feature-type dispatch used by
the trainer (joint2feature / feature2joint, generateFeature.py:398-462).

The main path only uses the 'weight_offset' codec (ops/codecs.py); these
variants keep the reference's full configuration space available
(feature_type in config.py:74).  All NHWC, all jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from keypointfusion_tpu.geometry.grid import uv_grid
from keypointfusion_tpu.ops.resize import resize_nearest_torch
from keypointfusion_tpu.ops.codecs import (
    _kernel_arr, joint_to_offset, offset_to_joint_weight,
    offset_to_joint_softmax, joint_to_heatmap,
)


def _coords(depth_ds):
    b, h, w, _ = depth_ds.shape
    grid = jnp.broadcast_to(uv_grid(h)[None], (b, h, w, 2))
    return jnp.concatenate([grid, depth_ds], axis=-1)


def offset_to_joint_topk(offset_map, depth, kernel_size, topk: int = 30):
    """'offset' decode via top-k heatmap voting (generateFeature.py:87-113).

    offset_map [B,H,W,4J]."""
    b, h, w, c = offset_map.shape
    j = c // 4
    depth_ds = resize_nearest_torch(depth, h)
    coords = _coords(depth_ds).reshape(b, h * w, 1, 3)
    offset_unit = offset_map[..., :3 * j].reshape(b, h * w, j, 3)
    heatmap = offset_map[..., 3 * j:].reshape(b, h * w, j)

    value, idx = jax.lax.top_k(jnp.transpose(heatmap, (0, 2, 1)), topk)
    # gather [B,J,K] pixels
    off_sel = jnp.take_along_axis(
        jnp.transpose(offset_unit, (0, 2, 1, 3)), idx[..., None], axis=2)
    coords_sel = jnp.take_along_axis(
        jnp.broadcast_to(jnp.transpose(coords, (0, 2, 1, 3)),
                         (b, j, h * w, 3)), idx[..., None], axis=2)
    k = _kernel_arr(kernel_size, j)[..., None]
    dist = k - value * k
    joint = jnp.sum((off_sel * dist[..., None] + coords_sel)
                    * value[..., None], axis=2)
    return joint / (jnp.sum(value, -1, keepdims=True) + 1e-8)


def offset_to_joint_weight_nosoftmax(offset_map, depth, kernel_size):
    """'weight_offset_nosoftmax' decode (generateFeature.py:233-254)."""
    b, h, w, c = offset_map.shape
    j = c // 5
    depth_ds = resize_nearest_torch(depth, h)
    coords = _coords(depth_ds).reshape(b, h * w, 1, 3)
    offset_unit = offset_map[..., :3 * j].reshape(b, h * w, j, 3)
    heatmap = offset_map[..., 3 * j:4 * j].reshape(b, h * w, j)
    weight = offset_map[..., 4 * j:].reshape(b, h * w, j)
    mask = (depth_ds.reshape(b, h * w, 1) < 0.99).astype(offset_map.dtype)
    offset_m = offset_unit * mask[..., None]
    heat_m = heatmap * mask
    weight_m = weight * mask
    k = _kernel_arr(kernel_size, j)[:, None, :]
    dist = k - heat_m * k
    num = jnp.sum((offset_m * dist[..., None] + coords)
                  * weight_m[..., None], axis=1)
    return num / (jnp.sum(weight_m, 1)[..., None] + 0.0)


def heatmap_to_joint_softmax(heatmap, scale: float = 30.0):
    """2D heatmap argmax-by-softmax decode (generateFeature.py:256-270).

    heatmap [B,H,W,J] → joints [B,J,2] normalized uv."""
    b, h, w, j = heatmap.shape
    grid = uv_grid(h).reshape(h * w, 2)
    nh = jax.nn.softmax(heatmap.reshape(b, h * w, j) * scale, axis=1)
    return jnp.einsum('bmj,mc->bjc', nh, grid)


def joint_to_plain_offset(joint, depth, kernel_size, feature_size):
    """2D unit-offset + heatmap encode (generateFeature.py:29-47).
    Returns ([B,fs,fs,3J], mask [B,fs,fs,J])."""
    b, j, _ = joint.shape
    fs = int(feature_size)
    depth_ds = resize_nearest_torch(depth, fs)
    # NOTE the reference uses the (fs-1)-denominator mesh here
    r = 2.0 * jnp.arange(fs, dtype=jnp.float32) / (fs - 1.0) - 1.0
    u = jnp.broadcast_to(r[None, :], (fs, fs))
    v = jnp.broadcast_to(r[:, None], (fs, fs))
    grid = jnp.stack([u, v], -1)
    offset = joint[:, None, None, :, :2] - grid[None, :, :, None, :]
    dist = jnp.sqrt(jnp.sum(offset ** 2, -1) + 1e-8)
    offset_norm = offset / dist[..., None]
    k = _kernel_arr(kernel_size, j)[:, None, None, :]
    heatmap = (k - dist) / k
    mask = (heatmap >= 0).astype(jnp.float32) * \
        (depth_ds < 0.99).astype(jnp.float32)
    out = jnp.concatenate(
        [(offset_norm * mask[..., None]).reshape(b, fs, fs, 2 * j),
         heatmap * mask], -1)
    return out, mask


def joint_to_depth_offset(joint, depth, mask, feature_size):
    """Per-joint depth-offset maps (generateFeature.py:49-57)."""
    b, j, _ = joint.shape
    fs = int(feature_size)
    depth_ds = resize_nearest_torch(depth, fs)
    offset = joint[:, None, None, :, 2] - depth_ds
    return offset * mask


def joint_to_gaussian_heatmap(joint, depth, std, heatmap_size):
    """joint2heatmap2d with the validity mask (generateFeature.py:12-27)."""
    b, j, _ = joint.shape
    hm = joint_to_heatmap(joint[..., :2], std, heatmap_size,
                          sigma=1.0 / jnp.sqrt(2.0))
    depth_ds = resize_nearest_torch(depth, heatmap_size)
    mask = (hm >= 0.01).astype(jnp.float32) * \
        (depth_ds < 0.99).astype(jnp.float32)
    return hm, mask


def plain_offset_to_joint_softmax(offset, weight, kernel_size,
                                  scale: float = 30.0):
    """2D decode (generateFeature.py:276-290). offset [B,H,W,2J],
    weight [B,H,W,J] → [B,J,2]."""
    b, h, w, c = offset.shape
    j = c // 2
    grid = uv_grid(h).reshape(h * w, 2)
    off = offset.reshape(b, h * w, j, 2)
    wgt = weight.reshape(b, h * w, j)
    k = _kernel_arr(kernel_size, j)[:, None, :]
    dist = k - wgt * k
    nw = jax.nn.softmax(scale * wgt, axis=1)
    return jnp.sum((off * dist[..., None] + grid[None, :, None, :])
                   * nw[..., None], axis=1)


def depth_to_map(depth_nl, heatmap_size: int = 32):
    """Broadcast per-joint depths to constant maps
    (generateFeature.py:392-395). depth_nl [B,J] → [B,S,S,J]."""
    b, j = depth_nl.shape
    m = ((depth_nl + 1.0) / 2.0)[:, None, None, :]
    return jnp.broadcast_to(m, (b, heatmap_size, heatmap_size, j))


def joint_to_pc(joint, key, sample_point: int = 1024, radius: float = 0.08,
                cloud_per_joint: int = 100):
    """Joints → typed synthetic point cloud (generateFeature.py:372-389).
    Returns [B, sample_point, 4] (xyz + 1-based joint type)."""
    b, j, _ = joint.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    n = cloud_per_joint
    r = jax.random.uniform(k1, (b, j, n)) * radius
    theta = jax.random.uniform(k2, (b, j, n)) * jnp.pi
    phi = jax.random.uniform(k3, (b, j, n)) * jnp.pi
    x = r * jnp.sin(phi) * jnp.cos(theta)
    y = r * jnp.sin(phi) * jnp.sin(theta)
    z = r * jnp.cos(phi)
    pts = joint[:, :, None, :] + jnp.stack([x, y, z], -1)
    types = jnp.broadcast_to(
        jnp.arange(1, j + 1, dtype=jnp.float32)[None, :, None, None],
        (b, j, n, 1))
    cloud = jnp.concatenate([pts, types], -1).reshape(b, j * n, 4)
    sel = jax.random.choice(k4, j * n, (sample_point,), replace=False)
    return cloud[:, sel, :]


# ------------------------------------------------ feature-type dispatch ---

def joint_to_feature(joint, depth, feature_paras, feature_size,
                     feature_types):
    """GT encoding dispatch (generateFeature.py:398-431)."""
    feats = []
    for para, ftype in zip(feature_paras, feature_types):
        if ftype == 'heatmap':
            hm, _ = joint_to_gaussian_heatmap(joint, depth, para,
                                              feature_size)
            feats.append(hm)
        elif ftype == 'heatmap_depth':
            hm, mask = joint_to_gaussian_heatmap(joint, depth, para,
                                                 feature_size)
            d = jnp.broadcast_to(joint[:, None, None, :, 2], hm.shape)
            feats.append(jnp.concatenate(
                [hm, jnp.where(mask > 0, d, -1.0)], -1))
        elif ftype == 'heatmap_depthoffset':
            hm, mask = joint_to_gaussian_heatmap(joint, depth, para,
                                                 feature_size)
            feats.append(jnp.concatenate(
                [hm, joint_to_depth_offset(joint, depth, mask,
                                           feature_size)], -1))
        elif ftype == 'plainoffset_depth':
            po, _ = joint_to_plain_offset(joint, depth, para, feature_size)
            d = jnp.broadcast_to(
                joint[:, None, None, :, 2],
                (joint.shape[0], feature_size, feature_size,
                 joint.shape[1]))
            feats.append(jnp.concatenate([po, d], -1))
        elif ftype == 'plainoffset_depthoffset':
            po, mask = joint_to_plain_offset(joint, depth, para,
                                             feature_size)
            feats.append(jnp.concatenate(
                [po, joint_to_depth_offset(joint, depth, mask,
                                           feature_size)], -1))
        elif ftype in ('offset', 'weight_offset',
                       'weight_offset_nosoftmax'):
            feats.append(joint_to_offset(joint, depth, para, feature_size))
        elif ftype == 'weight_pos':
            b, j, _ = joint.shape
            f = jnp.broadcast_to(joint[:, None, None],
                                 (b, feature_size, feature_size, j, 3))
            feats.append(f.reshape(b, feature_size, feature_size, 3 * j))
        else:
            raise NotImplementedError(ftype)
    return jnp.concatenate(feats, axis=-1)


def feature_to_joint(depth, pixel_pd, feature_types, feature_paras,
                     joint_num=None):
    """Prediction decode dispatch (generateFeature.py:434-462).

    joint_num slices the dense map to the channels the decode consumes —
    the KPFusion backbone always emits 5J channels (3J offsets + J heatmap
    + J weight), but e.g. the 'offset' decode reads 4J. (The reference
    crashes here: offset2joint_softmax infers joint_num = 5J//4
    from the full map, generateFeature.py:119-120.)"""
    ftype = feature_types[0]
    para = feature_paras[0]
    j = joint_num
    if ftype == 'weight_offset':
        return offset_to_joint_weight(pixel_pd, depth, para)
    if ftype == 'weight_offset_nosoftmax':
        return offset_to_joint_weight_nosoftmax(pixel_pd, depth, para)
    if ftype == 'offset':
        if j is not None:
            pixel_pd = pixel_pd[..., :4 * j]
        return offset_to_joint_softmax(pixel_pd, depth, para)
    if ftype == 'heatmap':
        if j is not None:
            pixel_pd = pixel_pd[..., :j]
        uv = heatmap_to_joint_softmax(pixel_pd)
        return jnp.concatenate(
            [uv, jnp.zeros(uv.shape[:2] + (1,), uv.dtype)], -1)
    raise NotImplementedError(ftype)
