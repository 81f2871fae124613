"""ConvNeXt backbone tests: stage shapes, UNet output contract, jit."""

import numpy as np
import jax
import jax.numpy as jnp

from keypointfusion_tpu.models.convnext import (
    ConvNeXt, ConvNeXtUNet, resolve_size,
)


def test_resolve_size():
    assert resolve_size('T') == 'tiny'
    assert resolve_size('tiny') == 'tiny'
    assert resolve_size('L') == 'large'


def test_convnext_stage_shapes():
    x = jnp.zeros((1, 128, 128, 1))
    model = ConvNeXt(depths=(1, 1, 2, 1))
    v = model.init(jax.random.PRNGKey(0), x)
    c1, c2, c3, c4 = model.apply(v, x)
    assert c1.shape == (1, 32, 32, 96)
    assert c2.shape == (1, 16, 16, 192)
    assert c3.shape == (1, 8, 8, 384)
    assert c4.shape == (1, 4, 4, 768)


def test_convnext_unet_contract():
    x = jnp.zeros((1, 128, 128, 3))

    model = ConvNeXtUNet(size='tiny', joint_num=21, out_dims=(63, 21, 21))
    v = model.init(jax.random.PRNGKey(0), x)
    result, feature = jax.jit(
        lambda v, x: model.apply(v, x))(v, x)
    assert result.shape == (1, 32, 32, 105)
    assert feature.shape == (1, 32, 32, 128)
    assert bool(jnp.isfinite(result).all())
