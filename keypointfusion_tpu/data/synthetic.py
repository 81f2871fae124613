"""Geometrically consistent synthetic RGB-D batches.

Used by tests, the compile-check entry point and the throughput benchmark so
the full model + loss path runs with realistic structure (joints, depth
blobs, point cloud, crop transforms all mutually consistent) without any
dataset on disk. The reference has no equivalent — its smoke tests feed
torch.randn (e.g. model/resnetUnet.py:1078-1083).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

FX, FY, FU, FV = 600.0, 600.0, 320.0, 240.0


def synthetic_batch(batch_size: int = 8, joint_num: int = 21,
                    img_size: int = 128, point_num: int = 1024,
                    cube_mm: float = 250.0, seed: int = 0
                    ) -> Dict[str, np.ndarray]:
    """Returns the training batch dict (all float32 numpy, NHWC images):
    rgb, depth, pcl, xyz_gt, uvd_gt, center, M, cube, cam_para."""
    rng = np.random.RandomState(seed)
    b, j, s = batch_size, joint_num, img_size

    center = np.stack([rng.uniform(-30, 30, b), rng.uniform(-30, 30, b),
                       rng.uniform(550, 750, b)], -1).astype(np.float32)
    cube = np.full((b, 3), cube_mm, np.float32)
    cam_para = np.tile(np.array([[FX, FY, FU, FV]], np.float32), (b, 1))

    # crop transform M: center the com, scale the cube extent to img_size px
    # (structure of reference loader.py:303-338 comToTransform)
    center_u = center[:, 0] * FX / center[:, 2] + FU
    center_v = center[:, 1] * FY / center[:, 2] + FV
    scale = img_size / (cube_mm * FX / center[:, 2])
    M = np.zeros((b, 3, 3), np.float32)
    M[:, 0, 0] = scale
    M[:, 1, 1] = scale
    M[:, 2, 2] = 1.0
    M[:, 0, 2] = s / 2.0 - scale * center_u
    M[:, 1, 2] = s / 2.0 - scale * center_v

    # joints: random hand-ish cluster inside the cube (normalized xyz)
    xyz_gt = rng.uniform(-0.55, 0.55, (b, j, 3)).astype(np.float32)

    # project to normalized uvd through the exact crop transform
    xyz_mm = xyz_gt * cube[:, None] / 2.0 + center[:, None]
    u = xyz_mm[..., 0] * FX / xyz_mm[..., 2] + FU
    v = xyz_mm[..., 1] * FY / xyz_mm[..., 2] + FV
    uc = M[:, 0, 0, None] * u + M[:, 0, 2, None]
    vc = M[:, 1, 1, None] * v + M[:, 1, 2, None]
    uvd_gt = np.stack(
        [uc / (s / 2.0) - 1.0, vc / (s / 2.0) - 1.0,
         (xyz_mm[..., 2] - center[:, None, 2]) / (cube_mm / 2.0)],
        -1).astype(np.float32)

    # depth: background 1.0, square patches of joint depth at projections
    depth = np.ones((b, s, s, 1), np.float32)
    half = 6
    for bi in range(b):
        order = np.argsort(-uvd_gt[bi, :, 2])   # far joints first
        for ji in order:
            cx = int((uvd_gt[bi, ji, 0] + 1) / 2 * s)
            cy = int((uvd_gt[bi, ji, 1] + 1) / 2 * s)
            x0, x1 = max(cx - half, 0), min(cx + half, s)
            y0, y1 = max(cy - half, 0), min(cy + half, s)
            if x0 < x1 and y0 < y1:
                depth[bi, y0:y1, x0:x1, 0] = uvd_gt[bi, ji, 2]

    rgb = np.broadcast_to((1.0 - depth) * 0.5, (b, s, s, 3)).copy()
    rgb += rng.uniform(0, 0.05, rgb.shape).astype(np.float32)

    # point cloud from the rendered depth (host-side mirror of getpcl)
    pcl = np.zeros((b, point_num, 3), np.float32)
    ys, xs = np.mgrid[0:s, 0:s]
    for bi in range(b):
        mask = depth[bi, :, :, 0] < 0.99
        idx = np.flatnonzero(mask)
        if idx.size == 0:
            continue
        pick = rng.choice(idx, point_num, replace=idx.size < point_num)
        pu = xs.ravel()[pick] + 0.5
        pv = ys.ravel()[pick] + 0.5
        d_mm = depth[bi].ravel()[pick] * cube_mm / 2.0 + center[bi, 2]
        Minv = np.linalg.inv(M[bi])
        uo = Minv[0, 0] * pu + Minv[0, 2]
        vo = Minv[1, 1] * pv + Minv[1, 2]
        x = (uo - FU) / FX * d_mm
        y = (vo - FV) / FY * d_mm
        xyz = np.stack([x, y, d_mm], -1)
        pcl[bi] = (xyz - center[bi]) / (cube_mm / 2.0)

    return {
        'rgb': rgb.astype(np.float32), 'depth': depth, 'pcl': pcl,
        'xyz_gt': xyz_gt, 'uvd_gt': uvd_gt, 'center': center, 'M': M,
        'cube': cube, 'cam_para': cam_para,
    }
