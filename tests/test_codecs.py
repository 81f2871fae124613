"""Codec tests: encode/decode inverse consistency plus golden parity against
the reference torch GFM (imported read-only as a test oracle)."""

import numpy as np
import jax.numpy as jnp
import pytest

from keypointfusion_tpu.ops import (
    joint_to_offset, offset_to_joint_weight, offset_to_joint_softmax,
    joint_to_heatmap, pcl_joint_to_offset, pcl_offset_to_joint_weight,
    smooth_l1_loss,
)
from keypointfusion_tpu.ops.resize import resize_nearest_torch

B, J, FS = 2, 21, 32
KERNEL = 0.8


@pytest.fixture(scope="module")
def sample(rng=np.random.RandomState(7)):
    joint = rng.uniform(-0.7, 0.7, (B, J, 3)).astype(np.float32)
    depth = rng.uniform(-1, 1, (B, 128, 128, 1)).astype(np.float32)
    # background pixels at exactly 1.0 like a normalized crop
    depth[depth > 0.6] = 1.0
    pcl = rng.uniform(-0.9, 0.9, (B, 1024, 3)).astype(np.float32)
    return joint, depth, pcl


def test_encode_decode_consistency(sample):
    """GT-encoded maps must decode back to (nearly) the same joints when a
    weight channel focused on the heatmap is appended."""
    joint, depth, _ = sample
    enc = joint_to_offset(jnp.asarray(joint), jnp.asarray(depth), KERNEL, FS)
    assert enc.shape == (B, FS, FS, 4 * J)
    # use the GT heatmap itself (scaled) as the weight channel
    weight = enc[..., 3 * J:] * 30.0
    full = jnp.concatenate([enc, weight], axis=-1)
    dec = offset_to_joint_weight(full, jnp.asarray(depth), KERNEL)
    err = np.abs(np.asarray(dec) - joint).max()
    assert err < 0.1, f"decode bias too large: {err}"


def test_softmax_decode_consistency(sample):
    joint, depth, _ = sample
    enc = joint_to_offset(jnp.asarray(joint), jnp.asarray(depth), KERNEL, FS)
    dec = offset_to_joint_softmax(enc, jnp.asarray(depth), KERNEL)
    err = np.abs(np.asarray(dec) - joint).max()
    assert err < 0.15


def test_pcl_encode_decode_consistency(sample):
    joint, _, pcl = sample
    enc = pcl_joint_to_offset(jnp.asarray(joint), jnp.asarray(pcl), KERNEL)
    assert enc.shape == (B, 1024, 4 * J)
    weight = enc[..., 3 * J:] * 30.0
    full = jnp.concatenate([enc, weight], axis=-1)
    dec = pcl_offset_to_joint_weight(full, jnp.asarray(pcl), KERNEL)
    err = np.abs(np.asarray(dec) - joint).max()
    assert err < 0.1


# ---------------- golden parity vs the reference torch GFM ----------------

def to_torch_nchw(x):
    import torch
    return torch.from_numpy(np.moveaxis(np.asarray(x), -1, 1).copy())


def test_joint2offset_golden(sample, ref_gfm):
    import torch
    joint, depth, _ = sample
    got = np.asarray(joint_to_offset(jnp.asarray(joint), jnp.asarray(depth),
                                     KERNEL, FS))
    with torch.no_grad():
        want = ref_gfm.joint2offset(torch.from_numpy(joint),
                                    to_torch_nchw(depth), KERNEL, FS)
    want = np.moveaxis(want.numpy(), 1, -1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_offset2joint_weight_golden(sample, ref_gfm):
    import torch
    joint, depth, _ = sample
    rng = np.random.RandomState(1)
    offset_map = rng.randn(B, FS, FS, 5 * J).astype(np.float32)
    got = np.asarray(offset_to_joint_weight(jnp.asarray(offset_map),
                                            jnp.asarray(depth), KERNEL))
    with torch.no_grad():
        want = ref_gfm.offset2joint_weight(to_torch_nchw(offset_map),
                                           to_torch_nchw(depth), KERNEL)
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-3, atol=1e-4)


def test_joint2heatmap_golden(sample, ref_gfm):
    import torch
    joint, _, _ = sample
    got = np.asarray(joint_to_heatmap(jnp.asarray(joint[..., :2]), KERNEL,
                                      FS, sigma=1.0))
    with torch.no_grad():
        want = ref_gfm.joint2heatmap(torch.from_numpy(joint[..., :2]),
                                     KERNEL, FS, sigma=1)
    want = np.moveaxis(want.numpy(), 1, -1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_pcl_joint2offset_golden(sample, ref_gfm):
    import torch
    joint, _, pcl = sample
    got = np.asarray(pcl_joint_to_offset(jnp.asarray(joint), jnp.asarray(pcl),
                                         KERNEL))
    with torch.no_grad():
        # model/model.py:503-525 copy (the one the fusion block uses) differs
        # from GFM only by the sqrt epsilon; compare against GFM's variant.
        want = ref_gfm.pcl_joint2offset(torch.from_numpy(joint),
                                        torch.from_numpy(pcl), KERNEL)
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-3, atol=2e-4)


def test_pcl_offset2joint_weight_golden(sample, ref_gfm):
    import torch
    _, _, pcl = sample
    rng = np.random.RandomState(2)
    pcl_result = rng.randn(B, 1024, 5 * J).astype(np.float32)
    got = np.asarray(pcl_offset_to_joint_weight(
        jnp.asarray(pcl_result), jnp.asarray(pcl), KERNEL))
    with torch.no_grad():
        want = ref_gfm.pcl_offset2joint_weight(torch.from_numpy(pcl_result),
                                               torch.from_numpy(pcl), KERNEL)
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-3, atol=1e-4)


def test_resize_nearest_matches_torch(sample):
    import torch
    import torch.nn.functional as F
    _, depth, _ = sample
    got = np.asarray(resize_nearest_torch(jnp.asarray(depth), 32))
    with torch.no_grad():
        want = F.interpolate(to_torch_nchw(depth), size=[32, 32])
    np.testing.assert_allclose(got, np.moveaxis(want.numpy(), 1, -1))


def test_smooth_l1_matches_reference():
    import torch
    import sys
    sys.path.insert(0, "/root/reference")
    try:
        from model.loss import SmoothL1Loss  # type: ignore
    except Exception as e:
        pytest.skip(f"reference loss unimportable: {e}")
    rng = np.random.RandomState(3)
    x = rng.randn(4, 21, 3).astype(np.float32) * 0.05
    y = rng.randn(4, 21, 3).astype(np.float32) * 0.05
    got = float(smooth_l1_loss(jnp.asarray(x), jnp.asarray(y)))
    with torch.no_grad():
        want = float(SmoothL1Loss()(torch.from_numpy(x), torch.from_numpy(y)))
    assert abs(got - want) < 1e-6
