"""Golden parity for the legacy codec variants vs the reference GFM."""

import numpy as np
import jax.numpy as jnp
import pytest

from keypointfusion_tpu.ops import codecs_extra as cx

B, J, FS = 2, 21, 32
KERNEL = 0.8


def to_torch_nchw(x):
    import torch
    return torch.from_numpy(np.moveaxis(np.asarray(x), -1, 1).copy())


@pytest.fixture(scope="module")
def sample(rng=np.random.RandomState(11)):
    joint = rng.uniform(-0.7, 0.7, (B, J, 3)).astype(np.float32)
    depth = rng.uniform(-1, 1, (B, 128, 128, 1)).astype(np.float32)
    depth[depth > 0.6] = 1.0
    return joint, depth


def test_weight_nosoftmax_golden(sample, ref_gfm):
    import torch
    _, depth = sample
    rng = np.random.RandomState(1)
    m = rng.randn(B, FS, FS, 5 * J).astype(np.float32)
    got = np.asarray(cx.offset_to_joint_weight_nosoftmax(
        jnp.asarray(m), jnp.asarray(depth), KERNEL))
    with torch.no_grad():
        want = ref_gfm.offset2joint_weight_nosoftmax(
            to_torch_nchw(m), to_torch_nchw(depth), KERNEL)
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-3, atol=1e-3)


def test_topk_decode_golden(sample, ref_gfm):
    import torch
    _, depth = sample
    rng = np.random.RandomState(2)
    m = rng.randn(B, FS, FS, 4 * J).astype(np.float32)
    got = np.asarray(cx.offset_to_joint_topk(
        jnp.asarray(m), jnp.asarray(depth), KERNEL, topk=30))
    with torch.no_grad():
        want = ref_gfm.offset2joint(to_torch_nchw(m), to_torch_nchw(depth),
                                    KERNEL, topk=30)
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-3, atol=1e-3)


def test_heatmap_softmax_golden(sample, ref_gfm):
    import torch
    rng = np.random.RandomState(3)
    hm = rng.rand(B, FS, FS, J).astype(np.float32)
    got = np.asarray(cx.heatmap_to_joint_softmax(jnp.asarray(hm)))
    with torch.no_grad():
        want = ref_gfm.heatmap2joint_softmax(to_torch_nchw(hm))
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-3, atol=1e-4)


def test_joint_to_feature_weight_offset_matches_base(sample):
    joint, depth = sample
    from keypointfusion_tpu.ops.codecs import joint_to_offset
    got = cx.joint_to_feature(jnp.asarray(joint), jnp.asarray(depth),
                              [KERNEL], FS, ['weight_offset'])
    want = joint_to_offset(jnp.asarray(joint), jnp.asarray(depth), KERNEL,
                           FS)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))


def test_feature_to_joint_dispatch(sample):
    joint, depth = sample
    from keypointfusion_tpu.ops.codecs import joint_to_offset
    enc = joint_to_offset(jnp.asarray(joint), jnp.asarray(depth), KERNEL, FS)
    full = jnp.concatenate([enc, enc[..., 3 * J:] * 30], -1)
    dec = cx.feature_to_joint(jnp.asarray(depth), full, ['weight_offset'],
                              [KERNEL])
    assert np.abs(np.asarray(dec) - joint).max() < 0.1


def test_joint_to_pc_shapes():
    import jax
    joint = jnp.zeros((B, J, 3))
    pc = cx.joint_to_pc(joint, jax.random.PRNGKey(0), sample_point=256)
    assert pc.shape == (B, 256, 4)
    assert float(pc[..., 3].min()) >= 1.0
