"""ConvNeXt encoder + UNet decoder backbone family (T/S/B/L).

Rebuilds reference convNeXT/convnext.py (stock ConvNeXt with dual-format
LayerNorm and DropPath) and convNeXT/resnetUnet.py:60-253 (convNeXTUnet /
convNeXTUnet_RGB2offset_3D — again one module here; both reference variants
replace the stem with a 4x4/s4 conv matching the input channels at
convNeXT/resnetUnet.py:105-109, 201-205). NHWC throughout, so the torch
Block's permute dance (convnext.py:41-49) disappears — LayerNorm and the
pointwise Dense layers act on the native last axis.

Reference quirk preserved: the decoder defines `feat_emb` but feeds BOTH
outputs through `result_emb` (convNeXT/resnetUnet.py:145-152), so the
returned feature map and the dense-head input are the same tensor.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from keypointfusion_tpu.models.unet import Residual, final_init
from keypointfusion_tpu.ops.resize import upsample_bilinear_x2

MODEL_LIST = {
    'tiny': ((3, 3, 9, 3), (96, 192, 384, 768)),
    'small': ((3, 3, 27, 3), (96, 192, 384, 768)),
    'base': ((3, 3, 27, 3), (128, 256, 512, 1024)),
    'large': ((3, 3, 27, 3), (192, 384, 768, 1536)),
}
_ALIASES = {'T': 'tiny', 'S': 'small', 'B': 'base', 'L': 'large'}

trunc_init = nn.initializers.truncated_normal(stddev=0.02)


def resolve_size(name: str) -> str:
    return _ALIASES.get(name, name)


class DropPath(nn.Module):
    """Stochastic depth — drops the whole residual branch per sample."""
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng('dropout')
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class ConvNeXtBlock(nn.Module):
    """7x7 depthwise conv → LN → Dense(4x) → GELU → Dense → layer scale →
    drop-path residual (reference convnext.py:16-52)."""
    dim: int
    drop_path: float = 0.0
    layer_scale_init: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.dim, (7, 7), padding=3,
                    feature_group_count=self.dim, kernel_init=trunc_init,
                    dtype=self.dtype, name='dwconv')(x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name='norm')(y)
        y = nn.Dense(4 * self.dim, kernel_init=trunc_init,
                     dtype=self.dtype, name='pwconv1')(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, kernel_init=trunc_init, dtype=self.dtype,
                     name='pwconv2')(y)
        if self.layer_scale_init > 0:
            gamma = self.param(
                'gamma',
                nn.initializers.constant(self.layer_scale_init),
                (self.dim,))
            y = gamma * y
        y = DropPath(self.drop_path, name='drop_path')(y, train)
        return x + y


class ConvNeXt(nn.Module):
    """4-stage ConvNeXt encoder; emits all four stage maps
    (reference convnext.py:55-117). The stem is the reference's modified
    4x4/s4 conv + LN (convNeXT/resnetUnet.py:105-109) adapting to the input
    channel count."""
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    drop_path_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        total = sum(self.depths)
        dp_rates = [self.drop_path_rate * i / max(total - 1, 1)
                    for i in range(total)]
        feats = []
        cur = 0
        for i in range(4):
            if i == 0:
                x = nn.Conv(self.dims[0], (4, 4), (4, 4), padding=0,
                            kernel_init=trunc_init, dtype=self.dtype,
                            name='stem_conv')(x)
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name='stem_norm')(x)
            else:
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name=f'down_norm{i}')(x)
                x = nn.Conv(self.dims[i], (2, 2), (2, 2), padding=0,
                            kernel_init=trunc_init, dtype=self.dtype,
                            name=f'down_conv{i}')(x)
            for j in range(self.depths[i]):
                x = ConvNeXtBlock(self.dims[i], dp_rates[cur + j],
                                  dtype=self.dtype,
                                  name=f'stage{i}_block{j}')(x, train)
            cur += self.depths[i]
            feats.append(x)
        return tuple(feats)


class ConvNeXtUNet(nn.Module):
    """ConvNeXt encoder + residual-skip UNet decoder with the extra
    result_emb residual stage (convNeXT/resnetUnet.py:60-253)."""
    size: str = 'tiny'
    joint_num: int = 21
    deconv_dim: int = 128
    out_dims: Sequence[int] = (63, 21, 21)
    drop_path_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        depths, dims = MODEL_LIST[resolve_size(self.size)]
        c1, c2, c3, c4 = ConvNeXt(depths, dims, self.drop_path_rate,
                                  dtype=self.dtype, name='backbone')(x, train)

        c4_up = Residual(dims[3], dtype=self.dtype, name='up4')(c4, train)
        c4_up = upsample_bilinear_x2(c4_up)
        c3_skip = Residual(dims[2], dtype=self.dtype, name='skip_layer4')(
            c3, train)
        c3_fusion = Residual(dims[2], dtype=self.dtype,
                             name='fusion_layer4')(
            jnp.concatenate([c4_up, c3_skip], -1), train)

        c3_up = Residual(dims[2], dtype=self.dtype, name='up3')(c3_fusion,
                                                                train)
        c3_up = upsample_bilinear_x2(c3_up)
        c2_skip = Residual(dims[1], dtype=self.dtype, name='skip_layer3')(
            c2, train)
        c2_fusion = Residual(dims[1], dtype=self.dtype,
                             name='fusion_layer3')(
            jnp.concatenate([c3_up, c2_skip], -1), train)

        c2_up = Residual(dims[1], dtype=self.dtype, name='up2')(c2_fusion,
                                                                train)
        c2_up = upsample_bilinear_x2(c2_up)
        c1_skip = Residual(dims[0], dtype=self.dtype, name='skip_layer2')(
            c1, train)
        img_feature = Residual(self.deconv_dim, dtype=self.dtype,
                               name='fusion_layer2')(
            jnp.concatenate([c2_up, c1_skip], -1), train)

        # reference applies result_emb to both outputs (feat_emb is dead)
        result_feature = Residual(self.deconv_dim, dtype=self.dtype,
                                  name='result_emb')(img_feature, train)
        outs = [nn.Conv(od, (1, 1), use_bias=True, kernel_init=final_init,
                        bias_init=nn.initializers.zeros, dtype=self.dtype,
                        name=f'final_{i}')(result_feature)
                for i, od in enumerate(self.out_dims)]
        return jnp.concatenate(outs, -1), result_feature
