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


def test_kpfusion_convnext_wiring():
    """KPFusion with the ConvNeXt backbone family compiles end to end."""
    import numpy as np
    from keypointfusion_tpu.models.kpfusion import KPFusion
    from keypointfusion_tpu.geometry import CropFrame
    rng = np.random.RandomState(0)
    b = 1
    rgb = jnp.asarray(rng.rand(b, 128, 128, 3).astype(np.float32))
    depth = jnp.asarray(rng.uniform(-1, 1, (b, 128, 128, 1)).astype(
        np.float32))
    pcl = jnp.asarray(rng.uniform(-1, 1, (b, 64, 3)).astype(np.float32))
    cam = np.array([[600., 600., 320., 240.]], np.float32)
    center = np.array([[0., 0., 600.]], np.float32)
    M = np.eye(3, dtype=np.float32)[None]
    cube = np.full((1, 3), 250., np.float32)
    frame = CropFrame.from_batch(cam, center, M, cube)
    model = KPFusion(net='KPFusion-convnext-T', joint_num=21)
    v = model.init(jax.random.PRNGKey(0), rgb, depth, pcl, frame)
    results, sw = model.apply(v, rgb, depth, pcl, frame)
    assert results[-1].shape == (b, 21, 3)
    assert bool(jnp.isfinite(results[-1]).all())
