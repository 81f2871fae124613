"""Fixture-based tests for the HO3D, NYU and STB loaders (fabricated
on-disk trees; no real datasets in this environment)."""

import json
import os

import cv2
import numpy as np
import pytest

from keypointfusion_tpu.data.datasets import HO3D, NYUDataset, STBDataset
from keypointfusion_tpu.data import preprocessing as pp

FX, FY, FU, FV = 600.0, 600.0, 320.0, 240.0


def _encode_ho3d_depth(depth_mm):
    """Inverse of HO3D.read_depth_img: mm → BGR png channels."""
    scale = 0.00012498664727900177 * 1000
    raw = np.round(depth_mm / scale).astype(np.int32)
    img = np.zeros(depth_mm.shape + (3,), np.uint8)
    img[..., 2] = raw % 256
    img[..., 1] = raw // 256
    return img


@pytest.fixture(scope="module")
def ho3d_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('ho3d'))
    base = f'{root}/HO3D_v2'
    os.makedirs(f'{base}/annotations', exist_ok=True)
    os.makedirs(f'{base}/imgs', exist_ok=True)
    rng = np.random.RandomState(0)
    images, annotations, centers = [], [], []
    n = 4
    for i in range(n):
        depth = np.zeros((480, 640), np.float32)
        cx, cy = 320, 240
        depth[cy - 40:cy + 40, cx - 40:cx + 40] = rng.uniform(
            560, 660, (80, 80))
        cv2.imwrite(f'{base}/imgs/depth_{i:04d}.png',
                    _encode_ho3d_depth(depth))
        rgb = rng.randint(0, 255, (480, 640, 3)).astype(np.uint8)
        cv2.imwrite(f'{base}/imgs/rgb_{i:04d}.png', rgb)
        center = np.array([(cx - FU) * 600 / FX, (cy - FV) * 600 / FY,
                           600.], np.float32)
        joints = (center[None] + rng.uniform(-60, 60, (21, 3))) / 1000.0
        centers.append(center)
        images.append({'id': i, 'file_name': f'imgs/rgb_{i:04d}.png',
                       'height': 480, 'width': 640})
        annotations.append({
            'id': i, 'image_id': i,
            'joints_coord_cam': joints.tolist(),
            'cam_param': {'focal': [FX, FY], 'princpt': [FU, FV]},
            'mano_param': {'pose': [0.0] * 48, 'shape': [0.0] * 10,
                           'trans': [0.0] * 3},
        })
    for split in ('train', 'test'):
        with open(f'{base}/annotations/HO3D_{split}_data.json', 'w') as f:
            json.dump({'images': images, 'annotations': annotations}, f)
        np.savetxt(f'{base}/annotations/{split}_refine_center_xyz.txt',
                   np.asarray(centers))
    return root


def test_ho3d_loader(ho3d_root):
    ds = HO3D('test', ho3d_root, version='v2', sample_num=128)
    assert len(ds) == 4
    s = ds[0]
    assert s['depth'].shape == (128, 128, 1)
    assert s['pcl'].shape == (128, 3)
    assert np.abs(s['pcl']).max() <= 1.0     # HO3D clamps
    assert np.isfinite(s['xyz_gt']).all()
    # train path with augmentation + color scale
    dtr = HO3D('train', ho3d_root, version='v2', sample_num=128)
    st = dtr[1]
    assert st['rgb'].shape == (128, 128, 3)


def test_ho3d_depth_decode_roundtrip(ho3d_root):
    depth = np.zeros((8, 8), np.float32)
    depth[2, 3] = 600.0
    enc = _encode_ho3d_depth(depth)
    cv2.imwrite('/tmp/kpf_ho3d_d.png', enc)
    dec = HO3D.read_depth_img('/tmp/kpf_ho3d_d.png')
    assert abs(dec[2, 3] - 600.0) < 0.2


@pytest.fixture(scope="module")
def nyu_root(tmp_path_factory):
    import scipy.io as sio
    root = str(tmp_path_factory.mktemp('nyu'))
    os.makedirs(f'{root}/test', exist_ok=True)
    rng = np.random.RandomState(1)
    n = 3
    paras = (588.03, 587.07, 320., 240.)
    # 36-joint raw labels; the loader selects 23
    joint_uvd = np.zeros((1, n, 36, 3))
    joint_xyz = np.zeros((1, n, 36, 3))
    centers = []
    for i in range(n):
        depth = np.zeros((480, 640), np.float32)
        depth[200:280, 280:360] = rng.uniform(600, 700, (80, 80))
        # NYU depth encoding: b + g*256
        img = np.zeros((480, 640, 3), np.uint8)
        raw = depth.astype(np.int32)
        img[..., 0] = raw % 256
        img[..., 1] = raw // 256
        cv2.imwrite(f'{root}/test/depth_1_{i + 1:07d}.png', img)
        cv2.imwrite(f'{root}/test/rgb_1_{i + 1:07d}.png',
                    rng.randint(0, 255, (480, 640, 3)).astype(np.uint8))
        center = np.array([(320 - paras[2]) * 650 / paras[0],
                           -(240 - paras[3]) * 650 / paras[1], 650.0])
        xyz = center[None] + rng.uniform(-60, 60, (36, 3))
        joint_xyz[0, i] = xyz
        # stored uvd/xyz use the flipped-y convention
        joint_uvd[0, i] = pp.joint_3d_to_img(xyz, paras, flip=-1)
        centers.append(center)
    sio.savemat(f'{root}/test/joint_data.mat',
                {'joint_uvd': joint_uvd, 'joint_xyz': joint_xyz})
    # refined centers stored in the flipped convention too
    centers = np.asarray(centers)
    np.savetxt(f'{root}/test/center_test_refined.txt', centers)
    return root


def test_nyu_loader(nyu_root):
    ds = NYUDataset(nyu_root, 'test', sample_num=64)
    assert len(ds) == 3
    s = ds[0]
    assert s['xyz_gt'].shape == (23, 3)
    assert s['uvd_gt'].shape == (23, 3)
    assert s['depth'].shape == (128, 128, 1)
    assert np.isfinite(s['pcl']).all()
    assert ds.joint_kernel.shape == (23,)


@pytest.fixture(scope="module")
def stb_root(tmp_path_factory):
    import scipy.io as sio
    root = str(tmp_path_factory.mktemp('stb'))
    os.makedirs(f'{root}/STB/labels', exist_ok=True)
    os.makedirs(f'{root}/STB/B1Counting', exist_ok=True)
    rng = np.random.RandomState(2)
    fx, fy, tx, ty = STBDataset.cam_para
    hand = np.zeros((3, 21, 1500))
    for i in range(2):  # only first frames get images; len check uses 1500
        center = np.array([(320 - tx) * 600 / fx, (240 - ty) * 600 / fy,
                           600.0])
        hand[:, :, i] = (center[None] + rng.uniform(-50, 50, (21, 3))).T
        depth = np.zeros((480, 640), np.float32)
        depth[200:280, 280:360] = rng.uniform(560, 660, (80, 80))
        img = np.zeros((480, 640, 3), np.uint8)
        raw = depth.astype(np.int32)
        img[..., 2] = raw % 256
        img[..., 1] = raw // 256
        cv2.imwrite(f'{root}/STB/B1Counting/SK_depth_{i}.png', img)
        cv2.imwrite(f'{root}/STB/B1Counting/SK_color_{i}.png',
                    rng.randint(0, 255, (480, 640, 3)).astype(np.uint8))
    sio.savemat(f'{root}/STB/labels/B1Counting_SK.mat',
                {'handPara': hand})
    return root


def test_stb_loader(stb_root):
    ds = STBDataset('test', stb_root, sample_num=64)
    assert len(ds) == 1500
    s = ds[0]
    assert s['xyz_gt'].shape == (21, 3)
    assert s['depth'].shape == (128, 128, 1)
    assert np.isfinite(s['uvd_gt']).all()
