"""Image resizing with the exact semantics the reference relies on.

torch's `F.interpolate(x, size)` defaults to mode='nearest' with source index
floor(dst * in/out) — NOT half-pixel centers (which is what
jax.image.resize('nearest') uses). The codecs' depth downsample must match
bit-exactly for eval parity, so we implement the torch rule as a pure gather
(reference model/model.py:470-471, util/generateFeature.py:170-171).
"""

import jax
import jax.numpy as jnp


def resize_nearest_torch(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """NHWC nearest-resize with torch's floor(dst*in/out) index rule."""
    b, h, w, c = x.shape
    oh, ow = (out_hw, out_hw) if isinstance(out_hw, int) else out_hw
    if (oh, ow) == (h, w):
        return x
    if h % oh == 0 and w % ow == 0:
        # integer downsample: floor(dst*in/out) == dst*(in/out) exactly, so
        # the gather is a strided slice — identical indices, but the slice
        # lowers to a fast TPU op while the equivalent constant-index
        # gather measured ~12 ms/batch at [256,128,128] when XLA's gather
        # simplifier didn't fire
        return x[:, ::h // oh, ::w // ow]
    idx_h = (jnp.arange(oh) * h) // oh
    idx_w = (jnp.arange(ow) * w) // ow
    return x[:, idx_h][:, :, idx_w]


def upsample_bilinear_x2(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC 2x bilinear upsample, half-pixel centers (torch
    nn.Upsample(scale_factor=2, mode='bilinear', align_corners=False),
    reference model/resnetUnet.py:258-269)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method='bilinear')
