"""Model stack tests: shapes, jit-ability, gradient flow."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from keypointfusion_tpu.geometry import CropFrame
from keypointfusion_tpu.models import (
    ResNet, ResNetUNet, KeypointEncoder, KPInteraction, CrossDecoder, DESA,
    KPFusion,
)

B, J, S, N = 2, 21, 128, 256


def make_frame(b=B):
    rng = np.random.RandomState(0)
    cam = np.stack([rng.uniform(400, 700, b), rng.uniform(400, 700, b),
                    rng.uniform(300, 340, b), rng.uniform(220, 260, b)],
                   -1).astype(np.float32)
    center = np.stack([rng.uniform(-50, 50, b), rng.uniform(-50, 50, b),
                       rng.uniform(500, 800, b)], -1).astype(np.float32)
    M = np.tile(np.eye(3, dtype=np.float32), (b, 1, 1))
    M[:, 0, 0] = M[:, 1, 1] = 0.5
    M[:, 0, 2] = M[:, 1, 2] = -80
    cube = np.tile(np.array([[250., 250., 250.]], np.float32), (b, 1))
    return CropFrame.from_batch(cam, center, M, cube)


def test_resnet18_stage_shapes():
    x = jnp.zeros((B, S, S, 1))
    model = ResNet(depth=18)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    c0, c1, c2, c3, c4 = model.apply(vars_, x)
    assert c0.shape == (B, 32, 32, 64)
    assert c1.shape == (B, 32, 32, 64)
    assert c2.shape == (B, 16, 16, 128)
    assert c3.shape == (B, 8, 8, 256)
    assert c4.shape == (B, 4, 4, 512)


def test_resnet_unet_shapes():
    x = jnp.zeros((B, S, S, 1))
    model = ResNetUNet(depth=18, joint_num=J, out_dims=(3 * J, J, J))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    result, feature = model.apply(vars_, x)
    assert result.shape == (B, 32, 32, 5 * J)
    assert feature.shape == (B, 32, 32, 128)


def test_keypoint_transformers():
    feats = jnp.ones((B, J, 128))
    enc = KPInteraction(img_dim=128)
    vars_ = enc.init(jax.random.PRNGKey(0), feats)
    seq, pred = enc.apply(vars_, feats)
    assert seq.shape == (B, J, 128) and pred.shape == (B, J, 3)

    dec = CrossDecoder()
    vd = dec.init(jax.random.PRNGKey(0), feats, seq)
    out = dec.apply(vd, feats, seq)
    assert out.shape == (B, J, 128)


def test_desa_shapes_and_sensitivity():
    rng = np.random.RandomState(0)
    pcl = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)).astype(np.float32))
    nodes = jnp.asarray(rng.uniform(-0.5, 0.5, (B, J, 3)).astype(np.float32))
    pf = jnp.asarray(rng.randn(B, N, 128).astype(np.float32))
    nf = jnp.asarray(rng.randn(B, J, 128).astype(np.float32))
    model = DESA()
    vars_ = model.init(jax.random.PRNGKey(0), pf, nf, pcl, nodes)
    out = model.apply(vars_, pf, nf, pcl, nodes)
    assert out.shape == (B, J, 128)
    # features of nearby points must influence the output
    pf2 = pf.at[:, :, :].mul(2.0)
    out2 = model.apply(vars_, pf2, nf, pcl, nodes)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


@pytest.fixture(scope="module")
def kpf_setup():
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.rand(B, S, S, 3).astype(np.float32))
    depth = rng.uniform(-1, 1, (B, S, S, 1)).astype(np.float32)
    depth[depth > 0.5] = 1.0
    depth = jnp.asarray(depth)
    pcl = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)).astype(np.float32))
    frame = make_frame()
    model = KPFusion(joint_num=J)
    variables = model.init(jax.random.PRNGKey(0), rgb, depth, pcl, frame)
    return model, variables, rgb, depth, pcl, frame


def test_kpfusion_forward_shapes(kpf_setup):
    model, variables, rgb, depth, pcl, frame = kpf_setup
    results, sw = model.apply(variables, rgb, depth, pcl, frame)
    assert len(results) == 6 and len(sw) == 2
    assert results[0].shape == (B, 32, 32, 5 * J)
    assert results[1].shape == (B, 32, 32, 5 * J)
    for r in results[2:]:
        assert r.shape == (B, J, 3)
    for s in sw:
        assert s.shape == (B, 32, 32, J)
    assert all(bool(jnp.isfinite(r).all()) for r in results)


def test_kpfusion_jit_and_grad(kpf_setup):
    model, variables, rgb, depth, pcl, frame = kpf_setup
    params = variables['params']
    others = {k: v for k, v in variables.items() if k != 'params'}

    # train-mode apply with mutable batch_stats
    def loss_fn2(p):
        (results, sw), _ = model.apply(
            {'params': p, **others}, rgb, depth, pcl, frame, 0.8, True,
            rngs={'dropout': jax.random.PRNGKey(1)},
            mutable=['batch_stats'])
        return sum(jnp.mean(jnp.abs(r)) for r in results[2:])

    grads = jax.jit(jax.grad(loss_fn2))(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    # both backbones and both blocks must receive gradient
    gnorms = jax.tree_util.tree_map(lambda g: float(jnp.abs(g).sum()), grads)
    for top in ('backbone_d', 'backbone_rgb', 'block1', 'block2'):
        total = sum(jax.tree_util.tree_leaves(gnorms[top]))
        assert total > 0, f"no gradient reaching {top}"
