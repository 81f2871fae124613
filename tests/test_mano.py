"""MANO layer tests: asset loading, invariances, and golden parity against
the reference torch ManoLayer (imported with chumpy stubbed out)."""

import os
import sys
import types

import numpy as np
import jax.numpy as jnp
import pytest

from keypointfusion_tpu.mano import (
    ManoModel, load_mano_model, mano_forward, batch_rodrigues,
)
from keypointfusion_tpu.mano.assets import synthetic_mano_model

MANO_PKL = "/root/reference/MANO/MANO_RIGHT.pkl"


@pytest.fixture(scope="module")
def model():
    if os.path.exists(MANO_PKL):
        return load_mano_model(MANO_PKL)
    return synthetic_mano_model()


def test_asset_shapes(model):
    assert model.v_template.shape == (778, 3)
    assert model.shapedirs.shape == (778, 3, 10)
    assert model.posedirs.shape == (778, 3, 135)
    assert model.J_regressor.shape == (16, 778)
    assert model.weights.shape == (778, 16)


def test_rodrigues_golden(model):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference/manopth")
    from manopth import rodrigues_layer  # type: ignore
    rng = np.random.RandomState(0)
    aa = rng.randn(32, 3).astype(np.float32)
    got = np.asarray(batch_rodrigues(jnp.asarray(aa))).reshape(32, 9)
    with torch.no_grad():
        want = rodrigues_layer.batch_rodrigues(torch.from_numpy(aa)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_zero_pose_shapes_and_finiteness(model):
    pose = jnp.zeros((3, 48))   # 3 global + 45
    verts, joints = mano_forward(model, pose)
    assert verts.shape == (3, 778, 3)
    assert joints.shape == (3, 21, 3)
    assert bool(jnp.isfinite(verts).all()) and bool(jnp.isfinite(joints).all())


def test_global_rotation_equivariance(model):
    """With only a global rotation, outputs are the zero-pose outputs rigidly
    rotated about the rest root joint."""
    rng = np.random.RandomState(1)
    aa = rng.randn(1, 3).astype(np.float32) * 0.8
    pose_rot = np.zeros((1, 48), np.float32)
    pose_rot[:, :3] = aa
    v0, j0 = mano_forward(model, jnp.zeros((1, 48)))
    v1, j1 = mano_forward(model, jnp.asarray(pose_rot))
    R = np.asarray(batch_rodrigues(jnp.asarray(aa)))[0]
    root = np.asarray(j0)[0, 0]  # wrist (joint order puts root at 0)
    want_j = (np.asarray(j0)[0] - root) @ R.T + root
    np.testing.assert_allclose(np.asarray(j1)[0], want_j, rtol=1e-3, atol=0.2)
    want_v = (np.asarray(v0)[0] - root) @ R.T + root
    np.testing.assert_allclose(np.asarray(v1)[0], want_v, rtol=1e-3, atol=0.2)


@pytest.fixture(scope="module")
def ref_mano_layer(model):
    """Reference ManoLayer with ready_arguments stubbed (no chumpy)."""
    if not os.path.exists(MANO_PKL):
        pytest.skip("MANO pkl not available")
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference/manopth")

    class _R:
        def __init__(self, x):
            self.r = x

    smpl_data = {
        'betas': _R(np.zeros(10, np.float32)),
        'shapedirs': _R(model.shapedirs.astype(np.float64)),
        'posedirs': _R(model.posedirs.astype(np.float64)),
        'v_template': _R(model.v_template.astype(np.float64)),
        'weights': _R(model.weights.astype(np.float64)),
        'f': model.faces,
        'hands_components': model.hands_components.astype(np.float64),
        'hands_mean': model.hands_mean.astype(np.float64),
        'kintree_table': np.stack([model.kintree_parents,
                                   np.arange(16)]),
    }

    class _Sparse:
        def __init__(self, x):
            self._x = x

        def toarray(self):
            return self._x

    smpl_data['J_regressor'] = _Sparse(model.J_regressor.astype(np.float64))

    stub = types.ModuleType(
        'manopth.mano.webuser.smpl_handpca_wrapper_HAND_only')
    stub.ready_arguments = lambda path: smpl_data
    for name in ('manopth.mano', 'manopth.mano.webuser'):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules[
        'manopth.mano.webuser.smpl_handpca_wrapper_HAND_only'] = stub

    from manopth.manolayer import ManoLayer  # type: ignore
    return ManoLayer(mano_root='unused', use_pca=True, ncomps=45,
                     flat_hand_mean=True, side='right')


def test_mano_forward_golden(model, ref_mano_layer):
    import torch
    rng = np.random.RandomState(2)
    pose = (rng.randn(4, 48) * 0.5).astype(np.float32)
    betas = (rng.randn(4, 10) * 1.0).astype(np.float32)

    verts, joints = mano_forward(model, jnp.asarray(pose),
                                 jnp.asarray(betas), ncomps=45)
    with torch.no_grad():
        want_v, want_j = ref_mano_layer(torch.from_numpy(pose),
                                        torch.from_numpy(betas))
    np.testing.assert_allclose(np.asarray(joints), want_j.numpy(),
                               rtol=1e-3, atol=0.05)   # mm
    np.testing.assert_allclose(np.asarray(verts), want_v.numpy(),
                               rtol=1e-3, atol=0.05)


def test_mano_forward_golden_meanshape_trans(model, ref_mano_layer):
    import torch
    rng = np.random.RandomState(3)
    pose = (rng.randn(2, 48) * 0.3).astype(np.float32)
    trans = rng.randn(2, 3).astype(np.float32) * 0.1
    verts, joints = mano_forward(model, jnp.asarray(pose), None,
                                 jnp.asarray(trans), ncomps=45)
    with torch.no_grad():
        want_v, want_j = ref_mano_layer(
            torch.from_numpy(pose), th_trans=torch.from_numpy(trans))
    np.testing.assert_allclose(np.asarray(joints), want_j.numpy(),
                               rtol=1e-3, atol=0.05)
    np.testing.assert_allclose(np.asarray(verts), want_v.numpy(),
                               rtol=1e-3, atol=0.05)
