"""Patch-warp helpers: golden parity vs the reference preprocess.py and
debug-renderer smoke checks."""

import sys

import numpy as np
import pytest

from keypointfusion_tpu.data.patch_warp import (
    gen_trans_from_patch, generate_patch_image,
)
from keypointfusion_tpu.utils.vis import (
    draw_heatmap, draw_offset_field, draw_pcl,
)


def test_gen_trans_golden():
    sys.path.insert(0, "/root/reference")
    try:
        from dataloader.preprocess import gen_trans_from_patch_cv  # type: ignore
    except Exception as e:
        pytest.skip(f"reference preprocess unimportable: {e}")
    for inv in (False, True):
        got = gen_trans_from_patch(100, 120, 80, 60, 256, 256, 1.2, 30,
                                   (2.0, -3.0), inv=inv)
        want = gen_trans_from_patch_cv(100, 120, 80, 60, 256, 256, 1.2, 30,
                                       (2.0, -3.0), inv=inv)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_generate_patch_image():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (480, 640, 3)).astype(np.float32)
    patch, trans, inv_trans, tj, itj = generate_patch_image(
        img, [200, 150, 120, 100], 1.0, 0.0, (0, 0), False, (256, 256))
    assert patch.shape == (256, 256, 3)
    # forward then inverse transform is identity on the patch center
    c = np.array([260.0, 200.0, 1.0])
    fwd = trans @ c
    back = inv_trans @ np.array([fwd[0], fwd[1], 1.0])
    np.testing.assert_allclose(back, c[:2], atol=1e-3)


def test_debug_renderers():
    rng = np.random.RandomState(1)
    depth = rng.uniform(-1, 1, (128, 128, 1)).astype(np.float32)
    hm = rng.rand(32, 32).astype(np.float32)
    assert draw_heatmap(depth, hm).shape == (128, 128, 3)
    off = rng.randn(32, 32, 84).astype(np.float32)
    assert draw_offset_field(depth, off).shape == (128, 128, 3)
    pcl = rng.uniform(-1, 1, (256, 3)).astype(np.float32)
    assert draw_pcl(pcl).shape == (256, 256, 3)
