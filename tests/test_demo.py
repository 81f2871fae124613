"""Demo API smoke test: synthetic frame through the full inference path."""

import numpy as np

from keypointfusion_tpu.config import Config
from keypointfusion_tpu.demo import ModelRGBD, get_center_from_bbox


def test_center_from_bbox():
    depth = np.zeros((480, 640), np.float32)
    depth[200:260, 300:360] = 500.0
    c = get_center_from_bbox(depth, [290, 190, 80, 80])
    assert 290 < c[0] < 370 and 190 < c[1] < 270
    assert abs(c[2] - 500.0) < 1.0
    # empty bbox → fallback center
    c2 = get_center_from_bbox(depth, [0, 0, 50, 50])
    assert c2[2] == 300.0


def test_variables_swap_takes_effect():
    """demo.py passes variables as a jit ARGUMENT: assigning
    model.variables after construction must change the next result (a
    closure capture would silently keep serving trace-time weights)."""
    import jax
    rng = np.random.RandomState(0)
    depth = np.zeros((480, 640), np.float32)
    depth[200:300, 280:380] = rng.uniform(400, 600, (100, 100))
    rgb = rng.randint(0, 255, (480, 640, 3)).astype(np.uint8)
    inp = [{'rgb': rgb, 'depth': depth, 'bbox': [280, 200, 100, 100],
            'hand_type': 'right'}]
    cfg = Config(phase='test', point_num=256)
    model = ModelRGBD(cfg, cam_para=(600., 600., 320., 240.))
    _, out1 = model.estimate_pose_rgbd(inp)
    model.variables = jax.tree_util.tree_map(
        lambda x: x * 1.01, model.variables)
    _, out2 = model.estimate_pose_rgbd(inp)
    assert not np.allclose(out1[0]['joint_xyz'], out2[0]['joint_xyz'])


def test_estimate_pose_rgbd_contract():
    rng = np.random.RandomState(0)
    depth = np.zeros((480, 640), np.float32)
    depth[200:300, 280:380] = rng.uniform(400, 600, (100, 100))
    rgb = rng.randint(0, 255, (480, 640, 3)).astype(np.uint8)
    cfg = Config(phase='test', point_num=256)
    model = ModelRGBD(cfg, cam_para=(600., 600., 320., 240.))
    meta, out = model.estimate_pose_rgbd(
        [{'rgb': rgb, 'depth': depth, 'bbox': [280, 200, 100, 100],
          'hand_type': 'right'}])
    assert len(meta) == 1 and len(out) == 1
    assert out[0]['joint_xyz'].shape == (21, 3)
    assert out[0]['joint_uvd'].shape == (21, 3)
    assert meta[0]['pose_d'].shape == (128, 128, 3)
    assert meta[0]['pose_rgb'].shape == (128, 128, 3)
    assert np.isfinite(out[0]['joint_xyz']).all()
