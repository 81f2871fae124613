"""Alternative single-backbone RGB-D encoder family: channel-filter fusion
layers + dual-path ResNet + UNet head.

Rebuilds reference model/fusion_layer.py (FilterLayer/FSP/RGBDFusion/
ACFusion) and model/resnet.py:256-502 (RGBD_BasicBlock / RGBD_ResNet) plus
model/resnetUnet.py:659-751 (OfficialResNetUnet_RGBD). Not used by the
flagship KPFusion (SURVEY.md §2 #36) — provided for parity as an optional
family. Reference quirk preserved: the dual-path block shares ONE
downsample projection between the RGB and depth streams
(model/resnet.py:277-278).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from keypointfusion_tpu.models.norm import TorchBatchNorm

from keypointfusion_tpu.models.resnet import conv_init, STAGES
from keypointfusion_tpu.models.unet import Residual, final_init
from keypointfusion_tpu.ops.resize import upsample_bilinear_x2


class FilterLayer(nn.Module):
    """SE-style global channel filter (fusion_layer.py:6-22)."""
    out_planes: int
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2))
        y = nn.Dense(self.out_planes // self.reduction, dtype=self.dtype,
                     name='fc1')(y)
        y = nn.relu(y)
        y = nn.Dense(self.out_planes, dtype=self.dtype, name='fc2')(y)
        return nn.sigmoid(y)[:, None, None, :]


class FSP(nn.Module):
    """Feature Separation Part (fusion_layer.py:28-37)."""
    out_planes: int
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, guide_path, main_path):
        combined = jnp.concatenate([guide_path, main_path], axis=-1)
        w = FilterLayer(self.out_planes, self.reduction, self.dtype,
                        name='filter')(combined)
        return main_path + w * guide_path


class RGBDFusion(nn.Module):
    """Softmax-gated two-stream merge (fusion_layer.py:40-83)."""
    planes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rgb, depth):
        cat = jnp.concatenate([rgb, depth], axis=-1)
        a_l = nn.Conv(1, (1, 1), use_bias=True, dtype=self.dtype,
                      name='gate_rgb')(cat)
        a_r = nn.Conv(1, (1, 1), use_bias=True, dtype=self.dtype,
                      name='gate_depth')(cat)
        att = nn.softmax(jnp.concatenate([a_l, a_r], axis=-1), axis=-1)
        merge = rgb * att[..., 0:1] + depth * att[..., 1:2]
        rgb_out = nn.relu((rgb + merge) / 2)
        depth_out = nn.relu((depth + merge) / 2)
        return (rgb_out, depth_out), merge


class ACFusion(nn.Module):
    """Sigmoid channel-attention merge (fusion_layer.py:87-116)."""
    planes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rgb, depth):
        w_rgb = nn.sigmoid(nn.Conv(self.planes, (1, 1), use_bias=True,
                                   dtype=self.dtype, name='cam_rgb')(
            jnp.mean(rgb, (1, 2), keepdims=True)))
        w_d = nn.sigmoid(nn.Conv(self.planes, (1, 1), use_bias=True,
                                 dtype=self.dtype, name='cam_depth')(
            jnp.mean(depth, (1, 2), keepdims=True)))
        merge = w_rgb * rgb + w_d * depth
        return (nn.relu((rgb + merge) / 2), nn.relu((depth + merge) / 2)), \
            merge


class RGBDBasicBlock(nn.Module):
    """Dual-path basic block with a SHARED downsample projection
    (model/resnet.py:256-318)."""
    planes: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, streams, train: bool = False):
        x1, x2 = streams
        norm = lambda name: TorchBatchNorm(use_running_average=not train,
                                         momentum=0.9, epsilon=1e-5,
                                         dtype=self.dtype, name=name)
        need_ds = self.stride != 1 or x1.shape[-1] != self.planes
        ds_conv = nn.Conv(self.planes, (1, 1), (self.stride, self.stride),
                          use_bias=False, kernel_init=conv_init,
                          dtype=self.dtype, name='downsample_conv') \
            if need_ds else None
        ds_bn = norm('downsample_bn') if need_ds else None

        outs = []
        for tag, x in (('', x1), ('depth_', x2)):
            y = nn.Conv(self.planes, (3, 3), (self.stride, self.stride),
                        padding=1, use_bias=False, kernel_init=conv_init,
                        dtype=self.dtype, name=f'{tag}conv1')(x)
            y = nn.relu(norm(f'{tag}bn1')(y))
            y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                        kernel_init=conv_init, dtype=self.dtype,
                        name=f'{tag}conv2')(y)
            y = norm(f'{tag}bn2')(y)
            residual = ds_bn(ds_conv(x)) if need_ds else x
            outs.append(nn.relu(y + residual))
        return tuple(outs)


class RGBDResNet(nn.Module):
    """Dual-path ResNet with per-stage RGBDFusion
    (model/resnet.py:405-502). Returns (blocks, merges) per stage."""
    depth: int = 18
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rgb, depth_img, train: bool = False):
        _, sizes = STAGES[self.depth]
        norm = lambda name: TorchBatchNorm(use_running_average=not train,
                                         momentum=0.9, epsilon=1e-5,
                                         dtype=self.dtype, name=name)
        streams = []
        for tag, x in (('', rgb), ('depth_', depth_img)):
            y = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                        kernel_init=conv_init, dtype=self.dtype,
                        name=f'{tag}conv1')(x)
            y = nn.relu(norm(f'{tag}bn1')(y))
            y = nn.max_pool(y, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
            streams.append(y)
        streams = tuple(streams)

        blocks, merges = [], []
        for stage, (planes, nblocks) in enumerate(
                zip((64, 128, 256, 512), sizes)):
            for i in range(nblocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                streams = RGBDBasicBlock(planes, stride, dtype=self.dtype,
                                         name=f'layer{stage + 1}_{i}')(
                    streams, train)
            streams, merge = RGBDFusion(planes, dtype=self.dtype,
                                        name=f'rgbd_fusion_{stage}')(
                *streams)
            blocks.append(streams)
            merges.append(merge)
        return blocks, merges


class RGBDResNetUNet(nn.Module):
    """OfficialResNetUnet_RGBD (resnetUnet.py:659-751): dual-path encoder,
    UNet decoder over the per-stage merge features."""
    depth: int = 18
    joint_num: int = 21
    deconv_dim: int = 128
    out_dims: Sequence[int] = (63, 21, 21)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rgb, depth_img, train: bool = False):
        _, merges = RGBDResNet(self.depth, dtype=self.dtype,
                               name='backbone')(rgb, depth_img, train)
        m1, m2, m3, m4 = merges

        c4_up = upsample_bilinear_x2(
            Residual(512, dtype=self.dtype, name='up4')(m4, train))
        c3 = Residual(256, dtype=self.dtype, name='fusion_layer4')(
            jnp.concatenate([c4_up, Residual(256, dtype=self.dtype,
                                             name='skip_layer4')(m3, train)],
                            -1), train)
        c3_up = upsample_bilinear_x2(
            Residual(256, dtype=self.dtype, name='up3')(c3, train))
        c2 = Residual(128, dtype=self.dtype, name='fusion_layer3')(
            jnp.concatenate([c3_up, Residual(128, dtype=self.dtype,
                                             name='skip_layer3')(m2, train)],
                            -1), train)
        c2_up = upsample_bilinear_x2(
            Residual(128, dtype=self.dtype, name='up2')(c2, train))
        feat = Residual(self.deconv_dim, dtype=self.dtype,
                        name='fusion_layer2')(
            jnp.concatenate([c2_up, Residual(64, dtype=self.dtype,
                                             name='skip_layer2')(m1, train)],
                            -1), train)
        outs = [nn.Conv(od, (1, 1), use_bias=True, kernel_init=final_init,
                        bias_init=nn.initializers.zeros, dtype=self.dtype,
                        name=f'final_{i}')(feat)
                for i, od in enumerate(self.out_dims)]
        return jnp.concatenate(outs, -1), feat
