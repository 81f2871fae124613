"""Point sampling / orientation utilities (reference loader.py:61-78
calculateCoM, :855-872 farthest_point_sample, :895-905 pca_point,
:907-934 img2pcl_index_softmax, :969-991 pcl2img_index)."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from keypointfusion_tpu.geometry.camera import CropFrame, xyz_nl_to_uvd_nl
from keypointfusion_tpu.geometry.grid import img_uvd_points
from keypointfusion_tpu.geometry.pcl import uvd_nl_to_xyz_nl
from keypointfusion_tpu.ops.pairwise import pairwise_sqdist


def calculate_com(depth: np.ndarray, min_depth: float, max_depth: float
                  ) -> np.ndarray:
    """Depth-image center of mass within a depth band (loader.py:61-78);
    fallback (300, 300, 500) when empty."""
    dc = depth.copy()
    dc[(dc < min_depth) | (dc > max_depth)] = 0
    num = np.count_nonzero(dc)
    if num == 0:
        return np.array((300., 300., 500.))
    ys, xs = np.nonzero(dc > 0)
    return np.array([xs.mean(), ys.mean(), dc.sum() / num])


def farthest_point_sample(xyz: np.ndarray, npoint: int,
                          rng: Optional[np.random.RandomState] = None
                          ) -> np.ndarray:
    """Host-side FPS (loader.py:855-872; returns unique indices like the
    reference)."""
    rng = rng or np.random
    n = xyz.shape[0]
    if n < npoint:
        extra = rng.choice(np.arange(n), size=npoint - n, replace=False) \
            if npoint - n <= n else rng.choice(np.arange(n),
                                               size=npoint - n)
        return np.unique(np.append(np.arange(n), extra))
    centroids = np.zeros(npoint, np.int64)
    distance = np.full(n, 1e10)
    farthest = rng.randint(0, npoint)
    for i in range(npoint):
        centroids[i] = farthest
        d = np.sum((xyz - xyz[farthest]) ** 2, -1)
        distance = np.minimum(distance, d)
        farthest = int(distance.argmax())
    return np.unique(centroids)


def farthest_point_sample_jax(xyz: jnp.ndarray, npoint: int,
                              key) -> jnp.ndarray:
    """On-device batched FPS via lax.scan (static shape; duplicates are
    kept instead of the reference's np.unique — downstream gathers are
    invariant). xyz [B,N,3] → idx [B,npoint]."""
    b, n, _ = xyz.shape
    start = jax.random.randint(key, (b,), 0, n)

    def step(carry, _):
        distance, farthest = carry
        centroid = jnp.take_along_axis(
            xyz, farthest[:, None, None].repeat(3, -1), axis=1)
        d = jnp.sum((xyz - centroid) ** 2, -1)
        distance = jnp.minimum(distance, d)
        nxt = jnp.argmax(distance, -1)
        return (distance, nxt), farthest

    (_, _), idx = jax.lax.scan(step, (jnp.full((b, n), 1e10), start),
                               None, length=npoint)
    return jnp.transpose(idx, (1, 0))


def pca_orient(pcl: np.ndarray, joint: np.ndarray
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """PCA canonical orientation (loader.py:895-905): rotate the cloud and
    joints into the principal frame, with the second axis recomputed as
    cross(third, first) for a right-handed basis."""
    centered = pcl - pcl.mean(0, keepdims=True)
    u, _, vh = np.linalg.svd(centered, full_matrices=False)
    # sklearn-style deterministic sign (svd_flip): largest-|u| row positive
    signs = np.sign(u[np.abs(u).argmax(axis=0), range(u.shape[1])])
    vh = vh * signs[:, None]
    coeff = vh.T                                   # columns = components
    coeff[:, 1] = np.cross(coeff[:, 2], coeff[:, 0])
    return pcl @ coeff, joint @ coeff, coeff


def img_to_pcl_index_softmax(pcl, depth, frame: CropFrame,
                             select_num: int = 64, scale: float = 30.0):
    """Softmax-weighted nearest-pixel correspondence — the 'version 2'
    weighting (loader.py:907-934). Returns (closeness [B,N,K], idx)."""
    img_xyz = uvd_nl_to_xyz_nl(img_uvd_points(depth), frame)
    d2 = pairwise_sqdist(pcl, img_xyz)
    neg_val, idx = jax.lax.top_k(-d2, select_num)
    dist = jnp.sqrt(-neg_val + 1e-8)
    dist = dist - jnp.min(dist, -1, keepdims=True)
    closeness = 1.0 - dist / jnp.max(dist, -1, keepdims=True)
    return jax.nn.softmax(closeness * scale, axis=-1), idx


def pcl_to_img_index(pcl, img_size: int, frame: CropFrame,
                     select_num: int = 9):
    """Inverse correspondence: nearest image pixels for each cloud point in
    PIXEL space (loader.py:969-991)."""
    b, n, _ = pcl.shape
    pcl_uv = (xyz_nl_to_uvd_nl(pcl, frame)[..., :2] + 1) / 2 * img_size
    px = (jnp.arange(img_size, dtype=jnp.float32) + 0.5)
    u = jnp.broadcast_to(px[None, :], (img_size, img_size)).reshape(-1)
    v = jnp.broadcast_to(px[:, None], (img_size, img_size)).reshape(-1)
    coords = jnp.stack([u, v], -1)[None]
    d2 = pairwise_sqdist(pcl_uv, jnp.broadcast_to(
        coords, (b, img_size * img_size, 2)).astype(jnp.float32))
    neg_val, idx = jax.lax.top_k(-d2, select_num)
    dist = jnp.sqrt(-neg_val + 1e-8)
    closeness = 1.0 / (dist + 1e-8)
    return closeness / (jnp.sum(closeness, -1, keepdims=True) + 1e-8), idx
