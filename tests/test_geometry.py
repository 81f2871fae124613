"""Geometry core tests: round trips, closed-form inverse, and golden parity
against a straight numpy transliteration of the reference formulas
(reference dataloader/loader.py:219-341, 760-841)."""

import numpy as np
import jax.numpy as jnp
import pytest

from keypointfusion_tpu.geometry import (
    CropFrame, inv3x3, uvd_nl_to_xyz_nl, uvd_nl_to_xyz, xyz_nl_to_uvd_nl,
    points_img_to_3d, points_3d_to_img, transform_points_2d,
)


def make_frame(rng, b=3, img_size=128, flip=1.0):
    fx = rng.uniform(400, 700, b).astype(np.float32)
    fy = rng.uniform(400, 700, b).astype(np.float32)
    fu = rng.uniform(300, 340, b).astype(np.float32)
    fv = rng.uniform(220, 260, b).astype(np.float32)
    center = np.stack([rng.uniform(-50, 50, b), rng.uniform(-50, 50, b),
                       rng.uniform(500, 800, b)], -1).astype(np.float32)
    # crop affine: scale + translation, like comToTransform output
    s = rng.uniform(0.3, 0.7, b).astype(np.float32)
    M = np.zeros((b, 3, 3), np.float32)
    M[:, 0, 0] = s
    M[:, 1, 1] = s
    M[:, 2, 2] = 1
    M[:, 0, 2] = rng.uniform(-100, -50, b)
    M[:, 1, 2] = rng.uniform(-100, -50, b)
    cube = np.tile(np.array([[250., 250., 250.]], np.float32), (b, 1))
    cam = np.stack([fx, fy, fu, fv], -1)
    return CropFrame.from_batch(cam, center, M, cube, flip=flip,
                                img_size=img_size)


def test_inv3x3_matches_numpy(rng):
    m = rng.randn(5, 3, 3).astype(np.float32)
    m += 3 * np.eye(3)  # well-conditioned
    got = np.asarray(inv3x3(jnp.asarray(m)))
    want = np.linalg.inv(m)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_img3d_roundtrip(rng):
    frame = make_frame(rng)
    uvd = np.stack([rng.uniform(0, 640, (3, 20)), rng.uniform(0, 480, (3, 20)),
                    rng.uniform(400, 900, (3, 20))], -1).astype(np.float32)
    xyz = points_img_to_3d(jnp.asarray(uvd), frame.fx, frame.fy, frame.fu,
                           frame.fv, frame.flip)
    back = points_3d_to_img(xyz, frame.fx, frame.fy, frame.fu, frame.fv,
                            frame.flip)
    np.testing.assert_allclose(np.asarray(back), uvd, rtol=1e-4, atol=1e-2)


@pytest.mark.parametrize("flip", [1.0, -1.0])
def test_uvd_xyz_roundtrip(rng, flip):
    frame = make_frame(rng, flip=flip)
    uvd = rng.uniform(-0.9, 0.9, (3, 21, 3)).astype(np.float32)
    xyz = uvd_nl_to_xyz_nl(jnp.asarray(uvd), frame)
    back = xyz_nl_to_uvd_nl(xyz, frame)
    np.testing.assert_allclose(np.asarray(back), uvd, rtol=1e-3, atol=1e-3)


def numpy_uvd_nl2xyznl(uvd, frame):
    """Transliteration of reference loader.py:775-789 as an oracle."""
    b, n, _ = uvd.shape
    M = np.asarray(frame.M)
    cube = np.asarray(frame.cube)
    center = np.asarray(frame.center)
    out = np.zeros_like(uvd)
    for i in range(b):
        Minv = np.linalg.inv(M[i])
        uv = (uvd[i, :, :2] + 1) * (frame.img_size / 2)
        d = uvd[i, :, 2:] * (cube[i, 2] / 2.0) + center[i, 2]
        ones = np.ones((n, 1), np.float32)
        world = (Minv @ np.concatenate([uv, ones], -1).T).T
        u, v = world[:, 0], world[:, 1]
        fx, fy = np.asarray(frame.fx)[i], np.asarray(frame.fy)[i]
        fu, fv_ = np.asarray(frame.fu)[i], np.asarray(frame.fv)[i]
        x = (u - fu) * d[:, 0] / fx
        y = frame.flip * (v - fv_) * d[:, 0] / fy
        xyz = np.stack([x, y, d[:, 0]], -1)
        out[i] = (xyz - center[i]) / (cube[i] / 2.0)
    return out


def test_uvd_nl2xyznl_golden(rng):
    frame = make_frame(rng)
    uvd = rng.uniform(-0.9, 0.9, (3, 21, 3)).astype(np.float32)
    got = np.asarray(uvd_nl_to_xyz_nl(jnp.asarray(uvd), frame))
    want = numpy_uvd_nl2xyznl(uvd, frame)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_transform_points_identity(rng):
    uvd = rng.randn(2, 7, 3).astype(np.float32)
    M = np.tile(np.eye(3, dtype=np.float32)[None], (2, 1, 1))
    out = transform_points_2d(jnp.asarray(uvd), jnp.asarray(M))
    np.testing.assert_allclose(np.asarray(out), uvd, rtol=1e-6)
