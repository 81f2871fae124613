"""UNet decoder with hourglass-style pre-activation Residual blocks and the
combined ResNet-UNet backbone.

Rebuilds reference model/hourglass.py:87-119 (Residual) and
model/resnetUnet.py:249-414 (OfficialResNetUnet / _RGB2offset_3D — the two
classes differ only in stem input channels, so here it is one module).
Layout NHWC; bilinear 2x upsample with half-pixel centers matches torch
Upsample(align_corners=False).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from keypointfusion_tpu.models.norm import TorchBatchNorm

from keypointfusion_tpu.models.resnet import ResNet, conv_init
from keypointfusion_tpu.ops.resize import upsample_bilinear_x2

final_init = nn.initializers.normal(stddev=0.001)


class Residual(nn.Module):
    """Pre-activation bottleneck: BN-ReLU-1x1(half) → BN-ReLU-3x3(half) →
    BN-ReLU-1x1(out), skip 1x1 on the raw input when dims differ
    (reference hourglass.py:87-119)."""
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: TorchBatchNorm(use_running_average=not train,
                                         momentum=0.9, epsilon=1e-5,
                                         dtype=self.dtype, name=name)
        half = self.out_dim // 2
        y = nn.relu(norm('bn1')(x))
        y = nn.Conv(half, (1, 1), use_bias=True, kernel_init=conv_init,
                    dtype=self.dtype, name='conv1')(y)
        y = nn.relu(norm('bn2')(y))
        y = nn.Conv(half, (3, 3), padding=1, use_bias=True,
                    kernel_init=conv_init, dtype=self.dtype, name='conv2')(y)
        y = nn.relu(norm('bn3')(y))
        y = nn.Conv(self.out_dim, (1, 1), use_bias=True,
                    kernel_init=conv_init, dtype=self.dtype, name='conv3')(y)
        if x.shape[-1] != self.out_dim:
            x = nn.Conv(self.out_dim, (1, 1), use_bias=True,
                        kernel_init=conv_init, dtype=self.dtype,
                        name='skip')(x)
        return y + x


class ResNetUNet(nn.Module):
    """ResNet encoder + residual-skip UNet decoder emitting a flat dense
    prediction map and a feature map at 1/4 input resolution.

    For a 128x128 crop: img_result [B,32,32,sum(out_dims)],
    img_feature [B,32,32,deconv_dim].
    Works for both the 1-channel depth stem and the 3-channel RGB stem
    (reference resnetUnet.py:249-414) — the stem conv adapts to the input.
    """
    depth: int = 18                       # resnet depth
    joint_num: int = 21
    deconv_dim: int = 128
    out_dims: Sequence[int] = (63, 21, 21)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        backbone = ResNet(self.depth, dtype=self.dtype, name='backbone')
        c0, c1, c2, c3, c4 = backbone(x, train)
        exp = backbone.expansion

        c4_up = Residual(512, dtype=self.dtype, name='up4')(c4, train)
        c4_up = upsample_bilinear_x2(c4_up)
        c3_skip = Residual(256, dtype=self.dtype, name='skip_layer4')(c3, train)
        c3_fusion = Residual(256, dtype=self.dtype, name='fusion_layer4')(
            jnp.concatenate([c4_up, c3_skip], axis=-1), train)

        c3_up = Residual(256, dtype=self.dtype, name='up3')(c3_fusion, train)
        c3_up = upsample_bilinear_x2(c3_up)
        c2_skip = Residual(128, dtype=self.dtype, name='skip_layer3')(c2, train)
        c2_fusion = Residual(128, dtype=self.dtype, name='fusion_layer3')(
            jnp.concatenate([c3_up, c2_skip], axis=-1), train)

        c2_up = Residual(128, dtype=self.dtype, name='up2')(c2_fusion, train)
        c2_up = upsample_bilinear_x2(c2_up)
        c1_skip = Residual(64, dtype=self.dtype, name='skip_layer2')(c1, train)
        img_feature = Residual(self.deconv_dim, dtype=self.dtype,
                               name='fusion_layer2')(
            jnp.concatenate([c2_up, c1_skip], axis=-1), train)

        outs = []
        for i, od in enumerate(self.out_dims):
            outs.append(nn.Conv(od, (1, 1), use_bias=True,
                                kernel_init=final_init,
                                bias_init=nn.initializers.zeros,
                                dtype=self.dtype, name=f'final_{i}')(
                img_feature))
        img_result = jnp.concatenate(outs, axis=-1)
        return img_result, img_feature
