"""Native C++ preprocessing core: bit-parity with the numpy/cv2 host path
and integration into the eval sample builder."""

import numpy as np
import pytest

from keypointfusion_tpu.data import preprocessing as pp

native = pytest.importorskip("keypointfusion_tpu.native")

PARAS = (600., 600., 320., 240.)
CUBE = np.array([250., 250., 250.], np.float32)


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("no native toolchain")


def _frame(t, rng):
    depth = np.zeros((480, 640), np.float32)
    cx, cy = 300 + t * 13, 250 - t * 9
    depth[cy - 45:cy + 45, cx - 45:cx + 45] = rng.uniform(
        540, 680, (90, 90)).astype(np.float32)
    center = np.array([cx + 1.5, cy - 0.5, 600.0], np.float32)
    return depth, center


def test_crop_normalize_parity():
    rng = np.random.RandomState(0)
    for t in range(8):
        depth, center = _frame(t, rng)
        crop, M = pp.crop_area_3d(depth, center, CUBE, (128, 128), PARAS)
        com3d = pp.joint_img_to_3d(center, PARAS)
        want = pp.normalize_img(crop.max(), crop.copy(), com3d, CUBE)
        got, Mn = native.crop_normalize(depth, center, CUBE,
                                        np.asarray(PARAS, np.float32), 128)
        np.testing.assert_allclose(Mn, M, rtol=1e-5)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_depth_to_pcl_parity():
    rng = np.random.RandomState(1)
    depth, center = _frame(2, rng)
    com3d = pp.joint_img_to_3d(center, PARAS)
    got_crop, M = native.crop_normalize(depth, center, CUBE,
                                        np.asarray(PARAS, np.float32), 128)
    want_pcl = pp.get_pcl(got_crop.copy(), com3d, CUBE, M, PARAS)
    got_pcl = native.depth_to_pcl(got_crop, M, np.asarray(PARAS, np.float32),
                                  com3d.astype(np.float32), CUBE)
    assert got_pcl.shape == want_pcl.shape
    np.testing.assert_allclose(got_pcl, want_pcl, atol=1e-3)


def test_eval_sample_builder_native_vs_numpy():
    from keypointfusion_tpu.data.datasets import build_rgbd_sample
    rng = np.random.RandomState(2)
    depth, center = _frame(3, rng)
    rgb = rng.randint(0, 255, (480, 640, 3)).astype(np.uint8)
    joints = (pp.joint_img_to_3d(center, PARAS)[None]
              + rng.uniform(-60, 60, (21, 3))).astype(np.float32)
    com3d = pp.joint_img_to_3d(center, PARAS)
    import random
    kwargs = dict(depth=depth, rgb=rgb, joint_xyz_mm=joints,
                  center_xyz=com3d, cam_para=PARAS, cube_size=CUBE,
                  train=False, aug_para=(10, 0.2, 180),
                  py_rng=random.Random(0), img_size=128, sample_num=128)
    a = build_rgbd_sample(np_rng=np.random.RandomState(5), use_native=True,
                          **kwargs)
    b = build_rgbd_sample(np_rng=np.random.RandomState(5), use_native=False,
                          **kwargs)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=1e-3, err_msg=k)
