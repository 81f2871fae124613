"""Dataset + pipeline tests on fabricated on-disk fixtures (tiny DexYCB-
format tree) — no real datasets in this environment."""

import json
import os

import cv2
import numpy as np
import pytest

from keypointfusion_tpu.config import Config
from keypointfusion_tpu.data.datasets import (
    DexYCBDataset, build_rgbd_sample, load_coco_index,
)
from keypointfusion_tpu.data.pipeline import BatchLoader, collate

FX, FY, FU, FV = 600.0, 600.0, 320.0, 240.0


def _write_fake_dexycb(root, n=6):
    os.makedirs(f'{root}/DexYCB/annotations', exist_ok=True)
    os.makedirs(f'{root}/DexYCB/imgs', exist_ok=True)
    rng = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(n):
        color = f'imgs/color_{i:06d}.jpg'
        depth_file = f'{root}/DexYCB/imgs/aligned_depth_to_color_{i:06d}.png'
        # a blob of depth ~600mm at image center-ish
        depth = np.zeros((480, 640), np.uint16)
        cx, cy = 320 + i * 3, 240 - i * 2
        depth[cy - 40:cy + 40, cx - 40:cx + 40] = rng.randint(
            560, 660, (80, 80)).astype(np.uint16)
        cv2.imwrite(depth_file, depth)
        rgbimg = rng.randint(0, 255, (480, 640, 3)).astype(np.uint8)
        cv2.imwrite(f'{root}/DexYCB/{color}', rgbimg)

        # joints around the blob center in camera mm
        center = np.array([(cx - FU) * 600 / FX, (cy - FV) * 600 / FY, 600.])
        joints = center[None] + rng.uniform(-60, 60, (21, 3))
        images.append({'id': i, 'color_file_name': color,
                       'height': 480, 'width': 640})
        annotations.append({
            'id': i, 'image_id': i,
            'joints_coord_cam': (joints).tolist(),   # mm→ /1000 in loader
            'cam_param': {'focal': [FX, FY], 'princpt': [FU, FV]},
            'hand_type': 'right' if i % 2 == 0 else 'left',
            'mano_param': {'pose': [0.0] * 48, 'shape': [0.0] * 10,
                           'trans': [0.0] * 3},
        })
    with open(f'{root}/DexYCB/annotations/DEX_YCB_s0_test_data.json',
              'w') as f:
        json.dump({'images': images, 'annotations': annotations}, f)
    with open(f'{root}/DexYCB/annotations/DEX_YCB_s0_train_data.json',
              'w') as f:
        json.dump({'images': images, 'annotations': annotations}, f)


@pytest.fixture(scope="module")
def dexycb_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('data'))
    _write_fake_dexycb(root)
    return root


def test_coco_index(dexycb_root):
    idx = load_coco_index(
        f'{dexycb_root}/DexYCB/annotations/DEX_YCB_s0_test_data.json')
    assert len(idx) == 6 and 'image' in idx[0]


@pytest.mark.parametrize("split", ["test", "train"])
def test_dexycb_sample_contract(dexycb_root, split):
    ds = DexYCBDataset('s0', split, dexycb_root, sample_num=256)
    assert len(ds) == 6
    s = ds[0]
    assert s['rgb'].shape == (128, 128, 3)
    assert s['depth'].shape == (128, 128, 1)
    assert s['pcl'].shape == (256, 3)
    assert s['xyz_gt'].shape == (21, 3) and s['uvd_gt'].shape == (21, 3)
    assert s['M'].shape == (3, 3) and s['cam_para'].shape == (4,)
    assert np.isfinite(s['depth']).all() and s['depth'].max() <= 1.0
    # normalized gt within the crop cube
    assert np.abs(s['xyz_gt']).max() < 1.5
    assert np.abs(s['uvd_gt'][:, :2]).max() < 1.5


def test_dexycb_uvd_xyz_consistency(dexycb_root):
    """uvd_gt must map back to xyz_gt through the CropFrame transforms —
    ties the host pipeline to the on-device geometry."""
    import jax.numpy as jnp
    from keypointfusion_tpu.geometry import CropFrame, uvd_nl_to_xyz_nl
    ds = DexYCBDataset('s0', 'test', dexycb_root, sample_num=64)
    s = collate([ds[i] for i in range(3)])
    frame = CropFrame.from_batch(s['cam_para'], s['center'], s['M'],
                                 s['cube'])
    xyz = uvd_nl_to_xyz_nl(jnp.asarray(s['uvd_gt']), frame)
    np.testing.assert_allclose(np.asarray(xyz), s['xyz_gt'], atol=2e-3)


def test_left_hand_flip(dexycb_root):
    ds = DexYCBDataset('s0', 'test', dexycb_root, sample_num=64)
    s = ds[1]   # odd index = left hand
    assert np.isfinite(s['xyz_gt']).all()


def test_batch_loader(dexycb_root):
    ds = DexYCBDataset('s0', 'test', dexycb_root, sample_num=64)
    loader = BatchLoader(ds, batch_size=2, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]['rgb'].shape == (2, 128, 128, 3)
    assert batches[0]['pcl'].shape == (2, 64, 3)


def test_batch_loader_process_sharding(dexycb_root):
    """Multi-host sharding: disjoint per-process slices covering the set."""
    ds = DexYCBDataset('s0', 'test', dexycb_root, sample_num=64)
    seen = []
    for pi in range(2):
        loader = BatchLoader(ds, batch_size=1, shuffle=True, num_workers=1,
                             seed=7, process_index=pi, process_count=2)
        assert len(loader) == 3
        for b in loader:
            seen.append(b['center'][0].tobytes())
    assert len(set(seen)) == 6  # disjoint coverage of all 6 samples
