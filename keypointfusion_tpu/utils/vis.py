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
