"""Smoke/contract tests for the optional component families: hourglass
PoseNet, CBAM, CenterNet regressor, RGBD fusion stack, DETR-style image
attention, rotations, graph utils, occlusion utils."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from keypointfusion_tpu.models.legacy import (
    PoseNet, CBAM, CenterNetRegressor, Hourglass,
)
from keypointfusion_tpu.models.rgbd_fusion import (
    FSP, RGBDFusion, ACFusion, RGBDResNet, RGBDResNetUNet,
)
from keypointfusion_tpu.models.transformer_extra import (
    detr_sine_position_embedding, DetrDecoder, SpatialAggregateTR,
)
from keypointfusion_tpu.utils import rotations as R
from keypointfusion_tpu.utils.graph import hand_adjacency
from keypointfusion_tpu.data.occlusion import (
    joint_visibility, mask_image, offset_map_visibility,
)


def test_posenet_contract():
    x = jnp.zeros((1, 128, 128, 1))
    model = PoseNet(nstack=2, joint_num=21)
    v = model.init(jax.random.PRNGKey(0), x)
    preds, feature = model.apply(v, x)
    assert preds.shape == (1, 32, 32, 105)
    assert feature.shape == (1, 32, 32, 256)


def test_cbam_and_centernet():
    x = jnp.ones((2, 16, 16, 64))
    cbam = CBAM(gate_channels=64)
    v = cbam.init(jax.random.PRNGKey(0), x)
    out = cbam.apply(v, x)
    assert out.shape == x.shape

    img = jnp.zeros((2, 128, 128, 1))
    reg = CenterNetRegressor(joint_num=21)
    v = reg.init(jax.random.PRNGKey(0), img)
    out = reg.apply(v, img)
    assert out.shape == (2, 21, 3)


def test_rgbd_fusion_stack():
    rgb = jnp.ones((1, 8, 8, 32))
    d = jnp.ones((1, 8, 8, 32)) * 0.5
    for cls in (RGBDFusion, ACFusion):
        m = cls(planes=32)
        v = m.init(jax.random.PRNGKey(0), rgb, d)
        (r, dd), merge = m.apply(v, rgb, d)
        assert r.shape == rgb.shape and merge.shape == rgb.shape

    fsp = FSP(out_planes=32)
    v = fsp.init(jax.random.PRNGKey(0), rgb, d)
    assert fsp.apply(v, rgb, d).shape == rgb.shape


def test_rgbd_resnet_unet():
    rgb = jnp.zeros((1, 128, 128, 3))
    d = jnp.zeros((1, 128, 128, 1))
    model = RGBDResNetUNet(depth=18, joint_num=21)
    v = model.init(jax.random.PRNGKey(0), rgb, d)
    result, feature = model.apply(v, rgb, d)
    assert result.shape == (1, 32, 32, 105)
    assert feature.shape == (1, 32, 32, 128)


def test_detr_attention_variants():
    anchors = jnp.ones((2, 21, 128))
    img = jnp.ones((2, 8, 8, 128))
    pos = detr_sine_position_embedding(8, 8, 64)
    assert pos.shape == (8, 8, 128)

    dec = DetrDecoder(layers=1)
    v = dec.init(jax.random.PRNGKey(0), anchors, img)
    assert dec.apply(v, anchors, img).shape == (2, 21, 128)

    agg = SpatialAggregateTR(layers=1)
    v = agg.init(jax.random.PRNGKey(0), img, anchors)
    assert agg.apply(v, img, anchors).shape == (2, 64, 128)


def test_rotation_roundtrips():
    rng = np.random.RandomState(0)
    aa = jnp.asarray((rng.randn(16, 3) * 0.7).astype(np.float32))
    m = R.axis_angle_to_matrix(aa)
    # euler roundtrip
    e = R.matrix_to_euler(m)
    m2 = R.euler_to_matrix(e)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m), atol=1e-4)
    # rot6d roundtrip
    six = R.matrix_to_rot6d(m)
    m3 = R.rot6d_to_matrix(six)
    np.testing.assert_allclose(np.asarray(m3), np.asarray(m), atol=1e-4)
    # quaternion roundtrip
    q = R.axis_angle_to_quaternion(aa)
    m4 = R.quaternion_to_matrix(q)
    np.testing.assert_allclose(np.asarray(m4), np.asarray(m), atol=1e-4)


def test_graph_adjacency():
    a = hand_adjacency()
    assert a.shape == (21, 21)
    np.testing.assert_allclose(a, a.T, atol=1e-6)
    assert (np.diag(a) > 0).all()


def test_occlusion_utils():
    rng = np.random.RandomState(0)
    depth = jnp.asarray(rng.uniform(-1, 0.5, (2, 64, 64, 1)).astype(
        np.float32))
    joints = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 21, 3)).astype(
        np.float32))
    pcl = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 256, 3)).astype(
        np.float32))
    vis = joint_visibility(pcl, joints, 0.4)
    assert vis.shape == (2, 21)

    masked = mask_image(depth, joints, jax.random.PRNGKey(0))
    assert masked.shape == depth.shape
    assert float(jnp.sum(masked == 1.0)) > float(jnp.sum(depth == 1.0))

    omap = jnp.asarray(rng.randn(2, 32, 32, 105).astype(np.float32))
    assert offset_map_visibility(omap).shape == (2, 21)
