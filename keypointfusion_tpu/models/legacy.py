"""Legacy model components present in the reference but off the flagship
path: stacked-hourglass PoseNet (the AWR backbone), CBAM attention, and the
CenterNet-style direct regressor.

Rebuilds reference model/hourglass.py:122-236 (Hourglass/PoseNet),
model/cbam.py:26-95 (CBAM), model/centerNet.py:101-199 (ResNet18→FC).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from keypointfusion_tpu.models.norm import TorchBatchNorm

from keypointfusion_tpu.models.resnet import ResNet, conv_init
from keypointfusion_tpu.models.unet import Residual


def _upsample_nearest_x2(x):
    b, h, w, c = x.shape
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


class ConvBNRelu(nn.Module):
    out_dim: int
    kernel: int = 3
    stride: int = 1
    bn: bool = False
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_dim, (self.kernel, self.kernel),
                    (self.stride, self.stride),
                    padding=(self.kernel - 1) // 2, use_bias=True,
                    kernel_init=conv_init, dtype=self.dtype, name='conv')(x)
        if self.bn:
            x = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name='bn')(x)
        if self.relu:
            x = nn.relu(x)
        return x


class Hourglass(nn.Module):
    """Recursive hourglass (hourglass.py:122-146)."""
    n: int
    features: int
    increase: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f, nf = self.features, self.features + self.increase
        up1 = Residual(f, dtype=self.dtype, name='up1')(x, train)
        low = nn.max_pool(x, (2, 2), (2, 2))
        low = Residual(nf, dtype=self.dtype, name='low1')(low, train)
        if self.n > 1:
            low = Hourglass(self.n - 1, nf, dtype=self.dtype,
                            name='low2')(low, train)
        else:
            low = Residual(nf, dtype=self.dtype, name='low2')(low, train)
        low = Residual(f, dtype=self.dtype, name='low3')(low, train)
        return up1 + _upsample_nearest_x2(low)


class PoseNet(nn.Module):
    """Stacked-hourglass AWR backbone (hourglass.py:163-236): emits the
    same (dense 5J map, feature map) contract as ResNetUNet."""
    nstack: int = 2
    joint_num: int = 21
    inp_dim: int = 256
    increase: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, train: bool = False):
        x = ConvBNRelu(64, 7, 2, bn=True, dtype=self.dtype,
                       name='pre_conv')(img, train)
        x = Residual(128, dtype=self.dtype, name='pre_res1')(x, train)
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = Residual(self.inp_dim, dtype=self.dtype, name='pre_res2')(x,
                                                                      train)
        x = Residual(self.inp_dim, dtype=self.dtype, name='pre_res3')(x,
                                                                      train)
        preds = feature = None
        for i in range(self.nstack):
            hg = Hourglass(4, self.inp_dim, self.increase, dtype=self.dtype,
                           name=f'hg_{i}')(x, train)
            feature = Residual(self.inp_dim, dtype=self.dtype,
                               name=f'feat_res_{i}')(hg, train)
            feature = ConvBNRelu(self.inp_dim, 1, bn=True, dtype=self.dtype,
                                 name=f'feat_conv_{i}')(feature, train)
            offset = nn.Conv(self.joint_num * 3, (1, 1), use_bias=True,
                             dtype=self.dtype, name=f'out1_{i}')(feature)
            dis = nn.Conv(self.joint_num, (1, 1), use_bias=True,
                          dtype=self.dtype, name=f'out2_{i}')(feature)
            weight = nn.Conv(self.joint_num, (1, 1), use_bias=True,
                             dtype=self.dtype, name=f'out3_{i}')(feature)
            preds = jnp.concatenate([offset, dis, weight], axis=-1)
            if i < self.nstack - 1:
                x = x \
                    + nn.Conv(self.inp_dim, (1, 1), dtype=self.dtype,
                              name=f'merge_preds_{i}')(preds) \
                    + nn.Conv(self.inp_dim, (1, 1), dtype=self.dtype,
                              name=f'merge_feats_{i}')(feature)
        return preds, feature


class ChannelGate(nn.Module):
    """CBAM channel gate (cbam.py:26-60)."""
    gate_channels: int
    reduction: int = 16
    pool_types: Sequence[str] = ('avg', 'max')
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mlp = nn.Sequential([
            nn.Dense(self.gate_channels // self.reduction, dtype=self.dtype,
                     name='fc1'),
            nn.relu,
            nn.Dense(self.gate_channels, dtype=self.dtype, name='fc2'),
        ])
        att = 0.0
        for p in self.pool_types:
            if p == 'avg':
                att = att + mlp(jnp.mean(x, axis=(1, 2)))
            elif p == 'max':
                att = att + mlp(jnp.max(x, axis=(1, 2)))
            else:
                raise NotImplementedError(p)
        return x * nn.sigmoid(att)[:, None, None, :]


class SpatialGate(nn.Module):
    """CBAM spatial gate (cbam.py:69-81); returns (kept, suppressed)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pooled = jnp.concatenate([jnp.max(x, -1, keepdims=True),
                                  jnp.mean(x, -1, keepdims=True)], -1)
        s = nn.Conv(1, (7, 7), padding=3, use_bias=False,
                    dtype=self.dtype, name='spatial_conv')(pooled)
        s = TorchBatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-5, dtype=self.dtype, name='spatial_bn')(s)
        scale = nn.sigmoid(s)
        return x * scale, x * (1 - scale)


class CBAM(nn.Module):
    """Channel + spatial attention (cbam.py:84-95)."""
    gate_channels: int
    reduction: int = 16
    no_spatial: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ChannelGate(self.gate_channels, self.reduction,
                        dtype=self.dtype, name='channel_gate')(x)
        if self.no_spatial:
            return x
        kept, _ = SpatialGate(dtype=self.dtype, name='spatial_gate')(x,
                                                                     train)
        return kept


class CenterNetRegressor(nn.Module):
    """Plain ResNet-18 → global pool → FC → J×3 direct joint regressor
    (model/centerNet.py:101-199, legacy)."""
    joint_num: int = 21
    depth: int = 18
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, train: bool = False):
        *_, c4 = ResNet(self.depth, dtype=self.dtype,
                        name='backbone')(img, train)
        x = jnp.mean(c4, axis=(1, 2))
        x = nn.Dense(self.joint_num * 3, dtype=self.dtype, name='fc')(x)
        return x.reshape(-1, self.joint_num, 3)
