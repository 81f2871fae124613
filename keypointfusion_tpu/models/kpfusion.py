"""KPFusion — the flagship dual-backbone RGB-D keypoint fusion model.

Rebuilds reference model/model.py:354-426 as a pure Flax module over NHWC
inputs and an explicit CropFrame (instead of the dataset object the reference
threads through forward). Outputs match the reference `result` list layout
[img_offset, img_offset_rgb, b1_3d, b1_2d, b2_3d, b2_2d] aligned with
config.stage_type = (1,1,2,3,2,3).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from keypointfusion_tpu.geometry.camera import CropFrame, uvd_nl_to_xyz_nl
from keypointfusion_tpu.geometry.pcl import (
    img_to_pcl_index, sample_pixel_features,
)
from keypointfusion_tpu.ops.codecs import offset_to_joint_weight
from keypointfusion_tpu.ops.resize import resize_nearest_torch
from keypointfusion_tpu.models.unet import ResNetUNet
from keypointfusion_tpu.models.fusion_block import FusionBlock


def _backbone(net: str, joint_num: int, dtype, name: str):
    if 'convnext' in net:
        from keypointfusion_tpu.models.convnext import ConvNeXtUNet
        size = net.split('-')[-1]
        return ConvNeXtUNet(size=size, joint_num=joint_num, deconv_dim=128,
                            out_dims=(joint_num * 3, joint_num, joint_num),
                            dtype=dtype, name=name)
    depth = int(net.split('-')[-1])
    return ResNetUNet(depth=depth, joint_num=joint_num, deconv_dim=128,
                      out_dims=(joint_num * 3, joint_num, joint_num),
                      dtype=dtype, name=name)


class KPFusion(nn.Module):
    """Precision policy: `dtype` is the fusion-head compute dtype and
    `backbone_dtype` the CNN compute dtype (params stay f32). On TPU the
    backward of the fusion head's gathers/scatters is pathologically slow
    in bf16 (measured 6.7x), while the conv backbones hold ~all the FLOPs —
    so the fast training config is backbone_dtype=bf16 + dtype=f32
    ("mixed"); full-bf16 is for inference/serving."""
    net: str = 'KPFusion-resnet-18'
    joint_num: int = 21
    num_stages: int = 2
    dim: int = 128
    dtype: Any = jnp.float32
    backbone_dtype: Any = None
    use_pallas_desa: bool = False   # fused DESA kernel on the eval path
    # fused point->pixel sampler kernel on the eval path
    # (kernels/pixel_sampler_pallas.py): d2 + top-k threshold + weights +
    # sampling matmul in one VMEM pass, no [B,N,HW] HBM tensor
    use_pallas_sampler: bool = False
    pallas_interpret: bool = False
    # approx_min_k neighbor selection (see geometry.pcl.img_to_pcl_index);
    # default off so parity runs are exact — serving/bench enable it
    fast_topk: bool = False
    # transformer dropout rate (reference config/config.json)
    dropout: float = 0.1

    @nn.compact
    def __call__(self, rgb, depth, pcl, frame: CropFrame,
                 kernel: float = 0.8, train: bool = False):
        """rgb [B,S,S,3], depth [B,S,S,1] (normalized crop, background=1),
        pcl [B,N,3] normalized xyz.

        Returns (results, spatial_weights):
          results = (img_offset [B,32,32,5J], img_offset_rgb [B,32,32,5J],
                     b1_3d [B,J,3], b1_2d, b2_3d, b2_2d)
          spatial_weights = tuple of [B,32,32,J] per stage.
        """
        j = self.joint_num
        bb_dtype = self.backbone_dtype or self.dtype
        backbone_d = _backbone(self.net, j, bb_dtype, 'backbone_d')
        backbone_rgb = _backbone(self.net, j, bb_dtype, 'backbone_rgb')

        img_offset, img_feat = backbone_d(depth.astype(bb_dtype), train)
        img_offset_rgb, img_feat_rgb = backbone_rgb(rgb.astype(bb_dtype),
                                                    train)
        img_offset = img_offset.astype(self.dtype)
        img_feat = img_feat.astype(self.dtype)
        img_offset_rgb = img_offset_rgb.astype(self.dtype)
        img_feat_rgb = img_feat_rgb.astype(self.dtype)
        h = img_feat.shape[1]

        joint_uvd = jax.lax.stop_gradient(
            offset_to_joint_weight(img_offset, depth, kernel))
        img_offset_sg = jax.lax.stop_gradient(img_offset)
        weight_map = img_offset_sg[..., 4 * j:5 * j]           # [B,H,W,J]

        img_down = resize_nearest_torch(depth, h)
        joint_xyz = uvd_nl_to_xyz_nl(joint_uvd, frame)

        # point->pixel feature sampling, hoisted OUT of the fusion blocks:
        # the sampled maps (backbone features + weight channels) don't
        # change between stages, so one sampling pass serves both blocks
        # (the reference re-gathers per block, model/model.py:297-306)
        maps = jnp.concatenate(
            [img_feat, img_feat_rgb, weight_map.astype(img_feat.dtype)],
            axis=-1)
        if self.use_pallas_sampler and not train \
                and not self.is_initializing():
            from keypointfusion_tpu.geometry.grid import img_uvd_points
            from keypointfusion_tpu.kernels.pixel_sampler_pallas import \
                sample_pixel_features_fused
            img_xyz = uvd_nl_to_xyz_nl(img_uvd_points(img_down), frame)
            # f32 model dtype asks for the exact sampling matmul; bf16
            # serving keeps the fast default MXU precision + bf16 traffic
            prec = 'highest' if jnp.dtype(self.dtype) == jnp.float32 \
                else 'default'
            sampled = sample_pixel_features_fused(
                pcl, img_xyz, maps.reshape(maps.shape[0], h * h, -1),
                k=4, interpret=self.pallas_interpret, feat_precision=prec)
        else:
            pcl_closeness, pcl_index = img_to_pcl_index(
                pcl, img_down, frame, select_num=4,
                exact=not self.fast_topk)
            # no gradient flows through the pixel weights (the reference
            # computes them on the host, loader.py:936-967) and the
            # sampler recomputes its dense [B,N,HW] form in the backward
            # (geometry.pcl.sample_pixel_features). Precision follows the
            # dtype of the maps being sampled: a bf16 backbone's values
            # are bf16-exact, so the single-pass MXU product is enough
            # (see sample_pixel_features docstring).
            samp_prec = 'highest' \
                if jnp.dtype(bb_dtype) == jnp.float32 else 'default'
            sampled = sample_pixel_features(
                maps.reshape(maps.shape[0], h * h, -1),
                jax.lax.stop_gradient(pcl_closeness), pcl_index, h * h,
                samp_prec)

        results = [img_offset, img_offset_rgb]
        spatial_weights = []
        updated_2d_feature: Optional[jnp.ndarray] = None
        for i in range(self.num_stages):
            refined_3d, refined_2d, updated_2d_feature, sw = FusionBlock(
                joint_num=j, dim=self.dim, dtype=self.dtype,
                use_pallas_desa=self.use_pallas_desa,
                pallas_interpret=self.pallas_interpret,
                dropout=self.dropout,
                name=f'block{i + 1}')(
                img_feat, img_feat_rgb, pcl, joint_xyz, sampled,
                weight_map, updated_2d_feature, frame, img_down,
                kernel, train)
            results.append(refined_3d)
            results.append(refined_2d)
            spatial_weights.append(sw)
            joint_xyz = refined_2d

        return tuple(results), tuple(spatial_weights)
