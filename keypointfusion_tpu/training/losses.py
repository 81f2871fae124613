"""Per-stage loss assembly (reference train.py:211-261).

stage_type semantics (reference config.py:77):
  1 — dense pixel stage: smooth-L1 on the first 4J channels of the dense map
      against the GT encoding (deconv_weight) + smooth-L1 on the decoded
      joints vs uvd GT (coord_weight);
  2/3 — KFAM joint stages: smooth-L1 on xyz joints vs xyz GT (coord_weight).
Spatial-weight maps are supervised with max-normalized gaussians, sigma 3
for block 1 and sigma 2 for block 2, gated by epoch <= spatial_epoch.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from keypointfusion_tpu.config import Config
from keypointfusion_tpu.geometry.camera import CropFrame, uvd_nl_to_xyz_nl
from keypointfusion_tpu.ops.codecs import joint_to_heatmap
from keypointfusion_tpu.ops.codecs_extra import (
    feature_to_joint, joint_to_feature,
)
from keypointfusion_tpu.ops.loss import smooth_l1_loss


def elementwise_loss(cfg: Config):
    """loss_type dispatch (config.py:63; reference config.py:56). The
    reference always binds SmoothL1 in its loop (train.py:93,220-240) —
    'Mse' is honored here as torch MSELoss; 'GHM' has no implementation
    anywhere in the reference and is rejected explicitly."""
    if cfg.loss_type == 'L1Loss':
        return smooth_l1_loss
    if cfg.loss_type == 'Mse':
        return lambda pred, gt: jnp.mean((pred - gt) ** 2)
    raise NotImplementedError(
        f"loss_type={cfg.loss_type!r} (the reference defines no GHM loss)")


def _stage_error_mm(pred_xyz, xyz_gt, frame: CropFrame) -> jnp.ndarray:
    """Decoded per-stage train error in mm (reference train.py:228-249
    xyz2error → writer.add_scalar('error_{index}')): mean over batch and
    joints of the euclidean distance after cube/2 denormalization (the
    center offset cancels in the difference). Telemetry only — gradients
    are cut so this adds no backward cost."""
    d = jax.lax.stop_gradient(pred_xyz - xyz_gt) \
        * (frame.cube[:, None, :] / 2.0)
    return jnp.mean(jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12))


def compute_losses(results: Sequence[jnp.ndarray],
                   spatial_weights: Sequence[jnp.ndarray],
                   depth: jnp.ndarray,
                   uvd_gt: jnp.ndarray,
                   xyz_gt: jnp.ndarray,
                   frame: CropFrame,
                   cfg: Config,
                   epoch) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    kernel = cfg.feature_para[0]
    total = 0.0
    metrics: Dict[str, jnp.ndarray] = {}
    feature_size = results[0].shape[1]
    loss_fn = elementwise_loss(cfg)

    pixel_gt = None
    for index, stage in enumerate(cfg.stage_type):
        if stage == 1:
            pixel_pd = results[index]                       # [B,fs,fs,5J]
            if pixel_gt is None:
                # feature_type dispatch (reference train.py:216-219 →
                # GFM.joint2feature/feature2joint, generateFeature.py:
                # 398-462); default ('weight_offset',) encodes the 4J
                # offset+heatmap map
                pixel_gt = joint_to_feature(uvd_gt, depth, cfg.feature_para,
                                            feature_size, cfg.feature_type)
            joint_uvd = feature_to_joint(depth, pixel_pd, cfg.feature_type,
                                         cfg.feature_para,
                                         joint_num=uvd_gt.shape[1])
            # reference slices the prediction to the GT's channel count
            # (train.py:220: pixel_pd[:, :pixel_gt.size(1)])
            loss_pixel = loss_fn(
                pixel_pd[..., :pixel_gt.shape[-1]],
                pixel_gt) * cfg.deconv_weight
            loss_coord = loss_fn(joint_uvd, uvd_gt) * cfg.coord_weight
            total = total + loss_pixel + loss_coord
            metrics[f'loss_pixel_{index}'] = loss_pixel
            metrics[f'loss_coord_{index}'] = loss_coord
            metrics[f'error_{index}'] = _stage_error_mm(
                uvd_nl_to_xyz_nl(joint_uvd, frame), xyz_gt, frame)
        elif stage in (2, 3):  # KFAM xyz refinement
            joint_xyz = results[index]
            loss_coord = loss_fn(joint_xyz, xyz_gt) * cfg.coord_weight
            total = total + loss_coord
            metrics[f'loss_coord_{index}'] = loss_coord
            metrics[f'error_{index}'] = _stage_error_mm(joint_xyz, xyz_gt,
                                                        frame)
        # stage 0 (raw uvd output) gets NO loss, like the reference train
        # loop (train.py:213-240 has no branch for it)

    for index, sw in enumerate(spatial_weights):
        sigma = 3.0 if index == 0 else 2.0
        hm_gt = joint_to_heatmap(uvd_gt[..., :2], kernel, feature_size,
                                 sigma=sigma)
        sw_gt = hm_gt / jnp.max(hm_gt)                      # global max
        loss_sw = loss_fn(sw, sw_gt) * cfg.spatial_weight[index]
        gate = (epoch <= cfg.spatial_epoch[index]).astype(jnp.float32) \
            if hasattr(epoch, 'astype') else float(
                epoch <= cfg.spatial_epoch[index])
        loss_sw = loss_sw * gate
        total = total + loss_sw
        metrics[f'loss_spatial_{index}'] = loss_sw

    metrics['loss'] = total
    return total, metrics
