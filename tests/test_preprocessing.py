"""Host preprocessing parity vs the reference loader methods (imported
read-only with pycocotools stubbed)."""

import sys
import types

import numpy as np
import pytest

from keypointfusion_tpu.data import preprocessing as pp

PARAS = (600.0, 600.0, 320.0, 240.0)
CUBE = [250., 250., 250.]


@pytest.fixture(scope="module")
def ref_loader():
    """Instance of the reference `loader` base class as an oracle."""
    import os
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference not mounted")
    from tests.conftest import make_stub_module
    if 'pycocotools' not in sys.modules:
        m = make_stub_module('pycocotools')
        mc = make_stub_module('pycocotools.coco')
        mc.COCO = object
        m.coco = mc
        sys.modules['pycocotools'] = m
        sys.modules['pycocotools.coco'] = mc
    if 'torchvision' not in sys.modules:
        tv = make_stub_module('torchvision')
        tvt = make_stub_module('torchvision.transforms')
        tvt.ToTensor = object
        tv.transforms = tvt
        sys.modules['torchvision'] = tv
        sys.modules['torchvision.transforms'] = tvt
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        from dataloader.loader import loader  # type: ignore
    except Exception as e:
        pytest.skip(f"reference loader unimportable: {e}")
    obj = loader('/tmp', 'test', 128, 'refine', 'dexycb')
    obj.flip = 1
    obj.paras = PARAS
    obj.cube_size = CUBE
    obj.aug_modes = ['rot', 'com', 'sc', 'none']
    return obj


@pytest.fixture(scope="module")
def depth_image():
    """A synthetic raw depth image with a hand-like blob at ~600mm."""
    rng = np.random.RandomState(0)
    depth = np.zeros((480, 640), np.float32)
    depth[200:280, 280:360] = rng.uniform(560, 640, (80, 80)).astype(
        np.float32)
    return depth


def test_com_to_transform_golden(ref_loader):
    com = np.array([315.0, 250.0, 612.0])
    got = pp.com_to_transform(com, CUBE, (128, 128), PARAS)
    want = ref_loader.comToTransform(com, CUBE, (128, 128), PARAS)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_crop_area_3d_golden(ref_loader, depth_image):
    com = np.array([320.0, 240.0, 600.0])
    got_crop, got_M = pp.crop_area_3d(depth_image, com, CUBE, (128, 128),
                                      PARAS)
    want_crop, want_M = ref_loader.Crop_Image_deep_pp(
        depth_image.copy(), com, CUBE, (128, 128), PARAS)
    np.testing.assert_allclose(got_M, want_M, rtol=1e-6)
    np.testing.assert_allclose(got_crop, want_crop, atol=1e-4)


def test_normalize_img_golden(ref_loader, depth_image):
    com = np.array([320.0, 240.0, 600.0])
    crop, _ = pp.crop_area_3d(depth_image, com, CUBE, (128, 128), PARAS)
    com3d = pp.joint_img_to_3d(com, PARAS)
    got = pp.normalize_img(crop.max(), crop, com3d, CUBE)
    want = ref_loader.normalize_img(crop.max(), crop.copy(), com3d, CUBE)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert got.min() >= -1.0001 and got.max() <= 1.0001


def test_get_pcl_golden(ref_loader, depth_image):
    com = np.array([320.0, 240.0, 600.0])
    crop, M = pp.crop_area_3d(depth_image, com, CUBE, (128, 128), PARAS)
    com3d = pp.joint_img_to_3d(com, PARAS)
    norm = pp.normalize_img(crop.max(), crop, com3d, CUBE)
    got = pp.get_pcl(norm.copy(), com3d, np.asarray(CUBE), M, PARAS)
    want = ref_loader.getpcl(norm.copy(), com3d, np.asarray(CUBE), M, PARAS)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_rotate_hand_golden(ref_loader, depth_image):
    com = np.array([320.0, 240.0, 600.0])
    crop, M = pp.crop_area_3d(depth_image, com, CUBE, (128, 128), PARAS)
    joints = np.random.RandomState(1).uniform(-80, 80, (21, 3)).astype(
        np.float32)
    got_img, got_j, got_rot = pp.rotate_hand(crop, CUBE, com, 37.0,
                                             joints.copy(), PARAS)
    want_img, want_j, want_rot = ref_loader.rotateHand(
        crop.copy(), CUBE, com, 37.0, joints.copy(), PARAS)
    np.testing.assert_allclose(got_img, want_img, atol=1e-4)
    np.testing.assert_allclose(got_j, want_j, rtol=1e-4, atol=1e-3)


def test_scale_hand_golden(ref_loader, depth_image):
    com = np.array([320.0, 240.0, 600.0])
    crop, M = pp.crop_area_3d(depth_image, com, CUBE, (128, 128), PARAS)
    joints = np.random.RandomState(2).uniform(-80, 80, (21, 3)).astype(
        np.float32)
    got = pp.scale_hand(crop, CUBE, com, 1.1, joints.copy(), M, PARAS)
    want = ref_loader.scaleHand(crop.copy(), CUBE, com, 1.1, joints.copy(),
                                M, PARAS)
    np.testing.assert_allclose(got[0], want[0], atol=1e-4)
    np.testing.assert_allclose(got[2], want[2])
    np.testing.assert_allclose(got[3], want[3], rtol=1e-6)


def test_move_com_golden(ref_loader, depth_image):
    com = np.array([320.0, 240.0, 600.0])
    crop, M = pp.crop_area_3d(depth_image, com, CUBE, (128, 128), PARAS)
    joints = np.random.RandomState(3).uniform(-80, 80, (21, 3)).astype(
        np.float32)
    off = np.array([8.0, -5.0, 12.0])
    got = pp.move_com(crop, CUBE, com, off, joints.copy(), M, PARAS)
    want = ref_loader.moveCoM(crop.copy(), CUBE, com, off, joints.copy(), M,
                              PARAS)
    np.testing.assert_allclose(got[0], want[0], atol=1e-4)
    np.testing.assert_allclose(got[1], want[1], rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(got[2], want[2], rtol=1e-5)
    np.testing.assert_allclose(got[3], want[3], rtol=1e-5)


def test_transform_points_vectorized(ref_loader):
    sys.path.insert(0, "/root/reference")
    from dataloader.loader import transformPoints2D  # type: ignore
    rng = np.random.RandomState(4)
    pts = rng.uniform(0, 640, (21, 3)).astype(np.float32)
    M = pp.com_to_transform(np.array([320., 240., 600.]), CUBE, (128, 128),
                            PARAS)
    got = pp.transform_points_2d(pts, M)
    want = transformPoints2D(pts, M)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)
