"""Sampling/orientation utilities: properties + golden vs the reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from keypointfusion_tpu.geometry.sampling import (
    calculate_com, farthest_point_sample, farthest_point_sample_jax,
    pca_orient, img_to_pcl_index_softmax, pcl_to_img_index,
)
from tests.test_geometry import make_frame


def test_calculate_com():
    depth = np.zeros((480, 640), np.float32)
    depth[100:120, 200:220] = 600.0
    com = calculate_com(depth, 171, 1500)
    assert 200 <= com[0] <= 220 and 100 <= com[1] <= 120
    assert abs(com[2] - 600) < 1
    assert np.allclose(calculate_com(np.zeros((4, 4)), 171, 1500),
                       [300, 300, 500])


def test_fps_spreads_points():
    rng = np.random.RandomState(0)
    # two clusters; FPS must pick from both
    a = rng.randn(100, 3) * 0.01
    b = rng.randn(100, 3) * 0.01 + 5.0
    xyz = np.concatenate([a, b])
    idx = farthest_point_sample(xyz, 10, rng)
    picked = xyz[idx]
    assert (picked[:, 0] < 2).any() and (picked[:, 0] > 3).any()

    jidx = farthest_point_sample_jax(jnp.asarray(xyz)[None], 10,
                                     jax.random.PRNGKey(0))[0]
    jp = xyz[np.asarray(jidx)]
    assert (jp[:, 0] < 2).any() and (jp[:, 0] > 3).any()


def test_pca_orient_properties():
    rng = np.random.RandomState(1)
    pcl = rng.randn(200, 3) * np.array([3.0, 1.0, 0.3])
    joint = rng.randn(21, 3)
    pts, jts, coeff = pca_orient(pcl.copy(), joint.copy())
    # orthonormal right-handed basis
    np.testing.assert_allclose(coeff.T @ coeff, np.eye(3), atol=1e-6)
    assert np.linalg.det(coeff) > 0
    # principal axis carries the largest variance
    var = pts.var(0)
    assert var[0] >= var[1] - 1e-6


def test_pca_orient_vs_sklearn_reference():
    """The reference uses sklearn PCA (loader.py:895-905); compare."""
    sklearn = pytest.importorskip("sklearn.decomposition")
    rng = np.random.RandomState(2)
    pcl = rng.randn(300, 3) * np.array([2.5, 1.2, 0.4]) + 1.0
    joint = rng.randn(21, 3)
    pca = sklearn.PCA(n_components=3)
    pca.fit(pcl)
    coeff_ref = pca.components_.T
    coeff_ref[:, 1] = np.cross(coeff_ref[:, 2], coeff_ref[:, 0])
    want_pts = pcl @ coeff_ref
    got_pts, _, _ = pca_orient(pcl.copy(), joint.copy())
    np.testing.assert_allclose(got_pts, want_pts, atol=1e-6)


def test_pcl_img_index_variants(rng):
    frame = make_frame(rng, b=2)
    pcl = jnp.asarray(rng.uniform(-0.8, 0.8, (2, 64, 3)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 1)).astype(
        np.float32))
    cl, idx = img_to_pcl_index_softmax(pcl, depth, frame, select_num=8)
    assert cl.shape == (2, 64, 8)
    np.testing.assert_allclose(np.asarray(cl.sum(-1)), 1.0, atol=1e-4)

    cl2, idx2 = pcl_to_img_index(pcl, 32, frame, select_num=4)
    assert cl2.shape == (2, 64, 4)
    np.testing.assert_allclose(np.asarray(cl2.sum(-1)), 1.0, atol=1e-4)
    assert int(idx2.max()) < 32 * 32
