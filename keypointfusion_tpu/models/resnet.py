"""Flax ResNet encoder emitting all five stage maps (c0..c4).

TPU-native NHWC re-design of the torchvision-style encoder the reference
uses (reference model/resnet.py:137-253): BasicBlock for resnet-18,
Bottleneck for resnet-50/101. Weight layouts are chosen so the
torch→flax checkpoint converter (utils/torch_convert.py) is a pure
transpose.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Type

import jax.numpy as jnp
import flax.linen as nn

from keypointfusion_tpu.models.norm import TorchBatchNorm

# conv init matching the reference: normal(0, sqrt(2/fan_out))
conv_init = nn.initializers.variance_scaling(2.0, 'fan_out', 'normal')

STAGES = {
    18: ('basic', (2, 2, 2, 2)),
    50: ('bottleneck', (3, 4, 6, 3)),
    101: ('bottleneck', (3, 4, 23, 3)),
    152: ('bottleneck', (3, 8, 36, 3)),
}


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: TorchBatchNorm(use_running_average=not train,
                                         momentum=0.9, epsilon=1e-5,
                                         dtype=self.dtype, name=name)
        residual = x
        y = nn.Conv(self.planes, (3, 3), (self.stride, self.stride),
                    padding=1, use_bias=False, kernel_init=conv_init,
                    dtype=self.dtype, name='conv1')(x)
        y = norm('bn1')(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    kernel_init=conv_init, dtype=self.dtype, name='conv2')(y)
        y = norm('bn2')(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = nn.Conv(self.planes, (1, 1),
                               (self.stride, self.stride), use_bias=False,
                               kernel_init=conv_init, dtype=self.dtype,
                               name='downsample_conv')(x)
            residual = norm('downsample_bn')(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: TorchBatchNorm(use_running_average=not train,
                                         momentum=0.9, epsilon=1e-5,
                                         dtype=self.dtype, name=name)
        out_planes = self.planes * self.expansion
        residual = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False,
                    kernel_init=conv_init, dtype=self.dtype, name='conv1')(x)
        y = nn.relu(norm('bn1')(y))
        y = nn.Conv(self.planes, (3, 3), (self.stride, self.stride),
                    padding=1, use_bias=False, kernel_init=conv_init,
                    dtype=self.dtype, name='conv2')(y)
        y = nn.relu(norm('bn2')(y))
        y = nn.Conv(out_planes, (1, 1), use_bias=False,
                    kernel_init=conv_init, dtype=self.dtype, name='conv3')(y)
        y = norm('bn3')(y)
        if self.stride != 1 or x.shape[-1] != out_planes:
            residual = nn.Conv(out_planes, (1, 1),
                               (self.stride, self.stride), use_bias=False,
                               kernel_init=conv_init, dtype=self.dtype,
                               name='downsample_conv')(x)
            residual = norm('downsample_bn')(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """5-output ResNet encoder. depth in {18, 50, 101, 152}."""
    depth: int = 18
    dtype: Any = jnp.float32

    @property
    def expansion(self) -> int:
        return 1 if STAGES[self.depth][0] == 'basic' else 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        kind, sizes = STAGES[self.depth]
        block_cls = BasicBlock if kind == 'basic' else Bottleneck

        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                    kernel_init=conv_init, dtype=self.dtype, name='conv1')(x)
        x = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name='bn1')(x)
        x = nn.relu(x)
        c0 = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))

        feats = []
        y = c0
        for stage, (planes, nblocks) in enumerate(
                zip((64, 128, 256, 512), sizes)):
            for i in range(nblocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                y = block_cls(planes, stride, dtype=self.dtype,
                              name=f'layer{stage + 1}_{i}')(y, train)
            feats.append(y)
        c1, c2, c3, c4 = feats
        return c0, c1, c2, c3, c4
