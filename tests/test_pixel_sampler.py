"""Fused pixel-sampler Pallas kernel vs the exact XLA sampling path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keypointfusion_tpu.config import Config
from keypointfusion_tpu.data.synthetic import synthetic_batch
from keypointfusion_tpu.geometry.grid import img_uvd_points
from keypointfusion_tpu.geometry.camera import uvd_nl_to_xyz_nl
from keypointfusion_tpu.geometry.pcl import (
    img_to_pcl_index, sample_pixel_features,
)
from keypointfusion_tpu.kernels.pixel_sampler_pallas import (
    sample_pixel_features_fused,
)
from keypointfusion_tpu.training.train_step import frame_from_batch


def _setup(b=2, n=256, hw_side=32, c=37, seed=0):
    cfg = Config()
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(
        batch_size=b, point_num=n, seed=seed).items()}
    frame = frame_from_batch(batch, cfg)
    rng = np.random.RandomState(seed)
    from keypointfusion_tpu.ops.resize import resize_nearest_torch
    img_down = resize_nearest_torch(batch['depth'], hw_side)
    feat = jnp.asarray(
        rng.randn(b, hw_side * hw_side, c).astype(np.float32))
    return batch['pcl'], img_down, frame, feat


def test_fused_sampler_matches_exact_path():
    pcl, img_down, frame, feat = _setup()
    hw = img_down.shape[1] * img_down.shape[2]

    closeness, index = img_to_pcl_index(pcl, img_down, frame,
                                        select_num=4, exact=True)
    want = sample_pixel_features(feat, closeness, index, hw)

    img_xyz = uvd_nl_to_xyz_nl(img_uvd_points(img_down), frame)
    got = sample_pixel_features_fused(pcl, img_xyz, feat, k=4,
                                      interpret=True,
                                      feat_precision='highest')
    assert got.shape == want.shape
    # identical selection sets (no ties in synthetic data) -> tight match
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_sampler_in_kpfusion_eval():
    """use_pallas_sampler end-to-end: same joints as the exact eval path
    (f32, interpret mode)."""
    from keypointfusion_tpu.models.kpfusion import KPFusion
    cfg = Config()
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(
        batch_size=2, point_num=256, seed=3).items()}
    frame = frame_from_batch(batch, cfg)
    model = KPFusion(net=cfg.net, joint_num=cfg.joint_num)
    variables = model.init(jax.random.PRNGKey(0), batch['rgb'],
                           batch['depth'], batch['pcl'], frame)
    ref, _ = model.apply(variables, batch['rgb'], batch['depth'],
                         batch['pcl'], frame)
    fast = KPFusion(net=cfg.net, joint_num=cfg.joint_num,
                    use_pallas_sampler=True, pallas_interpret=True)
    got, _ = fast.apply(variables, batch['rgb'], batch['depth'],
                        batch['pcl'], frame)
    for r, g in zip(ref[2:], got[2:]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-4)
