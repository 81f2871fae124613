"""MANO regression head tests: rotation conversion roundtrips and the
forward contract."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from keypointfusion_tpu.mano.assets import load_mano_model, \
    synthetic_mano_model
from keypointfusion_tpu.mano.mano_head import (
    ManoRegHead, rot6d_to_mat, mat_to_aa, extended_joint_regressor,
    gt_mesh_from_mano_params,
)
from keypointfusion_tpu.mano.manolayer import batch_rodrigues

MANO_PKL = "/root/reference/MANO/MANO_RIGHT.pkl"


@pytest.fixture(scope="module")
def model():
    if os.path.exists(MANO_PKL):
        return load_mano_model(MANO_PKL)
    return synthetic_mano_model()


def test_rot6d_to_mat_orthonormal():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(32, 6).astype(np.float32))
    m = rot6d_to_mat(x)
    eye = jnp.einsum('bij,bkj->bik', m, m)
    np.testing.assert_allclose(np.asarray(eye),
                               np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
    det = np.linalg.det(np.asarray(m))
    np.testing.assert_allclose(det, 1.0, atol=1e-5)


def test_mat_aa_roundtrip():
    rng = np.random.RandomState(1)
    aa = jnp.asarray((rng.randn(64, 3) * 0.8).astype(np.float32))
    m = batch_rodrigues(aa)
    aa2 = mat_to_aa(m)
    m2 = batch_rodrigues(aa2)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m), atol=1e-4)


def test_extended_regressor(model):
    reg = extended_joint_regressor(model)
    assert reg.shape == (21, 778)
    assert reg[16:].sum() == 5.0   # one-hots


def test_mano_reg_head_forward(model):
    head = ManoRegHead(model=model, feature_size=1024)
    feats = jnp.asarray(np.random.RandomState(2).randn(2, 1024)
                        .astype(np.float32))
    variables = head.init(jax.random.PRNGKey(0), feats)
    out = jax.jit(lambda v, f: head.apply(v, f))(variables, feats)
    assert out['verts3d'].shape == (2, 778, 3)
    assert out['joints3d'].shape == (2, 21, 3)
    assert out['mano_pose'].shape == (2, 16, 3, 3)
    assert out['mano_pose_aa'].shape == (2, 48)
    for v in out.values():
        assert bool(jnp.isfinite(v).all())


def test_gt_mesh(model):
    rng = np.random.RandomState(3)
    params = jnp.asarray(np.concatenate(
        [rng.randn(2, 48) * 0.3, rng.randn(2, 10), rng.randn(2, 3) * 0.1],
        -1).astype(np.float32))
    center = jnp.asarray(rng.randn(2, 3).astype(np.float32) * 10)
    cube = jnp.full((2, 3), 250.0)
    out = gt_mesh_from_mano_params(model, params, center, cube)
    assert out['verts3d'].shape == (2, 778, 3)
    assert out['joints3d'].shape == (2, 21, 3)
