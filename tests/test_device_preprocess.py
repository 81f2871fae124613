"""On-device fused preprocessing vs the host cv2 path."""

import numpy as np
import jax
import jax.numpy as jnp

from keypointfusion_tpu.data import preprocessing as pp
from keypointfusion_tpu.data.device_preprocess import (
    device_crop, device_preprocess,
)

PARAS = (600.0, 600.0, 320.0, 240.0)
CUBE = np.array([250., 250., 250.])


def make_frame_batch(b=3, seed=0):
    rng = np.random.RandomState(seed)
    depth = np.zeros((b, 480, 640), np.float32)
    centers = []
    for i in range(b):
        cx, cy = 320 + i * 11, 240 - i * 7
        depth[i, cy - 45:cy + 45, cx - 45:cx + 45] = rng.uniform(
            560, 660, (90, 90))
        z = float(depth[i, cy, cx])
        centers.append([cx, cy, 600.0])
    rgb = rng.randint(0, 255, (b, 480, 640, 3)).astype(np.float32)
    return depth, rgb, np.asarray(centers, np.float32)


def test_device_crop_matches_host():
    depth, rgb, centers = make_frame_batch()
    b = depth.shape[0]
    cube = np.tile(CUBE[None], (b, 1)).astype(np.float32)
    cam = np.tile(np.asarray(PARAS, np.float32)[None], (b, 1))

    d_nl, rgb_crop, frame = jax.jit(device_crop, static_argnums=(5,))(
        jnp.asarray(depth), jnp.asarray(rgb), jnp.asarray(centers),
        jnp.asarray(cube), jnp.asarray(cam), 128)

    for i in range(b):
        crop, M = pp.crop_area_3d(depth[i], centers[i], CUBE, (128, 128),
                                  PARAS)
        com3d = pp.joint_img_to_3d(centers[i], PARAS)
        want = pp.normalize_img(crop.max(), crop, com3d, CUBE)
        got = np.asarray(d_nl)[i, :, :, 0]
        # identical warp index math → near-exact agreement
        frac_equal = np.mean(np.abs(got - want) < 1e-4)
        assert frac_equal > 0.995, f"sample {i}: only {frac_equal:.3f} equal"
        np.testing.assert_allclose(np.asarray(frame.M)[i], M, rtol=1e-5)


def test_device_preprocess_pipeline():
    depth, rgb, centers = make_frame_batch(seed=1)
    b = depth.shape[0]
    cube = np.tile(CUBE[None], (b, 1)).astype(np.float32)
    cam = np.tile(np.asarray(PARAS, np.float32)[None], (b, 1))
    rgb_c, d_nl, pcl, frame = jax.jit(
        device_preprocess, static_argnums=(6, 7))(
        jnp.asarray(depth), jnp.asarray(rgb), jnp.asarray(centers),
        jnp.asarray(cube), jnp.asarray(cam), jax.random.PRNGKey(0),
        128, 256)
    assert rgb_c.shape == (b, 128, 128, 3)
    assert d_nl.shape == (b, 128, 128, 1)
    assert pcl.shape == (b, 256, 3)
    assert float(jnp.abs(pcl).max()) <= 1.0
    assert float(rgb_c.max()) <= 1.0
    # valid pixels must exist and map inside the cube
    assert float((d_nl < 0.99).mean()) > 0.05
