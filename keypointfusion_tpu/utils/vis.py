"""Pose visualization overlays (reference util/vis_tool.py:74-510,
compacted: MANO-ordered hand skeleton with per-finger colors, plus the NYU
variants)."""

from __future__ import annotations

import cv2
import numpy as np

# MANO visualization order skeleton (vis_tool.py:76-83)
HAND_SKELETON = [
    [0, 13], [13, 14], [14, 15], [15, 20],
    [0, 1], [1, 2], [2, 3], [3, 16],
    [0, 4], [4, 5], [5, 6], [6, 17],
    [0, 10], [10, 11], [11, 12], [12, 19],
    [0, 7], [7, 8], [8, 9], [9, 18],
]
NYU_SKELETON = [[0, 1], [2, 3], [4, 5], [6, 7], [8, 9], [9, 10], [1, 13],
                [3, 13], [5, 13], [7, 13], [10, 13], [11, 13], [12, 13]]

# BGR finger colors (vis_tool.py Finger_color)
THUMB, INDEX, MIDDLE = (0, 0, 255), (75, 255, 66), (255, 0, 0)
RING, LITTLE, WRIST = (17, 240, 244), (255, 255, 0), (255, 0, 255)
_BONE_COLORS = ([THUMB] * 4 + [INDEX] * 4 + [MIDDLE] * 4 + [RING] * 4
                + [LITTLE] * 4)
_JOINT_COLORS = ([WRIST] + [INDEX] * 3 + [MIDDLE] * 3 + [LITTLE] * 3
                 + [RING] * 3 + [THUMB] * 3
                 + [INDEX, MIDDLE, LITTLE, RING, THUMB])


def get_skeleton(dataset: str):
    if dataset == 'nyu':
        return NYU_SKELETON
    return HAND_SKELETON


def draw_pose(dataset: str, img: np.ndarray, joint_uvd: np.ndarray
              ) -> np.ndarray:
    """Draw a skeleton over an HxWx3 uint8/float image; joint_uvd in pixel
    coords [J,3]."""
    img = np.ascontiguousarray(img)
    bones = get_skeleton(dataset)
    for i, (a, b) in enumerate(bones):
        color = _BONE_COLORS[i % len(_BONE_COLORS)]
        pa = tuple(np.round(joint_uvd[a, :2]).astype(int))
        pb = tuple(np.round(joint_uvd[b, :2]).astype(int))
        cv2.line(img, pa, pb, color, 1)
    for j in range(joint_uvd.shape[0]):
        color = _JOINT_COLORS[j % len(_JOINT_COLORS)]
        cv2.circle(img, tuple(np.round(joint_uvd[j, :2]).astype(int)), 2,
                   color, -1)
    return img


def draw_2d_pose(depth_hw1: np.ndarray, joint_uvd_nl: np.ndarray,
                 dataset: str = 'dexycb') -> np.ndarray:
    """Depth crop [S,S,1] in [-1,1] + normalized uvd → BGR overlay
    (vis_tool.py:487-492)."""
    s = depth_hw1.shape[0]
    joints = (np.asarray(joint_uvd_nl) + 1) / 2 * s
    gray = ((np.asarray(depth_hw1)[..., 0] + 1) / 2 * 255).astype(np.uint8)
    return draw_pose(dataset, cv2.cvtColor(gray, cv2.COLOR_GRAY2BGR), joints)


def draw_2d_pose_rgb(rgb_hw3: np.ndarray, joint_uvd_nl: np.ndarray,
                     dataset: str = 'dexycb') -> np.ndarray:
    """RGB crop [S,S,3] in [0,1] + normalized uvd → overlay
    (vis_tool.py:502-510)."""
    s = rgb_hw3.shape[0]
    joints = (np.asarray(joint_uvd_nl) + 1) / 2 * s
    img = (np.asarray(rgb_hw3) * 255).astype(np.uint8)
    return draw_pose(dataset, img, joints)


def draw_heatmap(depth_hw1, heatmap_hw, alpha: float = 0.5) -> np.ndarray:
    """Overlay a per-joint heatmap on a depth crop (debug renderer,
    vis_tool.py heatmap debug family)."""
    s = depth_hw1.shape[0]
    gray = ((np.asarray(depth_hw1)[..., 0] + 1) / 2 * 255).astype(np.uint8)
    base = cv2.cvtColor(gray, cv2.COLOR_GRAY2BGR)
    hm = np.asarray(heatmap_hw)
    hm = hm / (hm.max() + 1e-8)
    hm_img = cv2.applyColorMap((hm * 255).astype(np.uint8),
                               cv2.COLORMAP_JET)
    if hm_img.shape[:2] != (s, s):
        hm_img = cv2.resize(hm_img, (s, s), interpolation=cv2.INTER_NEAREST)
    return cv2.addWeighted(base, 1 - alpha, hm_img, alpha, 0)


def draw_offset_field(depth_hw1, offset_map, joint_id: int = 0,
                      stride: int = 4) -> np.ndarray:
    """Arrow rendering of a joint's dense unit-offset field (debug
    renderer). offset_map [H,W,4J+] with joint-major 3J offsets."""
    s = depth_hw1.shape[0]
    gray = ((np.asarray(depth_hw1)[..., 0] + 1) / 2 * 255).astype(np.uint8)
    img = cv2.cvtColor(gray, cv2.COLOR_GRAY2BGR)
    off = np.asarray(offset_map)
    h, w = off.shape[:2]
    scale = s / h
    for y in range(0, h, stride):
        for x in range(0, w, stride):
            du = off[y, x, joint_id * 3 + 0]
            dv = off[y, x, joint_id * 3 + 1]
            if du == 0 and dv == 0:
                continue
            p0 = (int(x * scale), int(y * scale))
            p1 = (int(x * scale + du * 8), int(y * scale + dv * 8))
            cv2.arrowedLine(img, p0, p1, (0, 255, 0), 1, tipLength=0.3)
    return img


def draw_pcl(pcl, size: int = 256) -> np.ndarray:
    """Top-down scatter of a normalized point cloud (debug renderer)."""
    img = np.zeros((size, size, 3), np.uint8)
    pts = np.asarray(pcl)
    uv = ((pts[:, :2] + 1) / 2 * size).astype(int)
    keep = (uv[:, 0] >= 0) & (uv[:, 0] < size) & (uv[:, 1] >= 0) & \
        (uv[:, 1] < size)
    depth_color = ((pts[keep, 2] + 1) / 2 * 255).astype(np.uint8)
    for (u, v), c in zip(uv[keep], depth_color):
        cv2.circle(img, (u, v), 1, (int(c), 128, 255 - int(c)), -1)
    return img
