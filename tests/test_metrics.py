"""Metric tests: golden parity of Procrustes alignment vs the reference
numpy implementation; PCK/AUC sanity."""

import numpy as np
import jax.numpy as jnp
import pytest

from keypointfusion_tpu.training.metrics import (
    xyz_to_error_mm, rigid_align, pa_error_mm, pck_curve, auc_subset,
)


def test_xyz_error_zero_for_identical():
    rng = np.random.RandomState(0)
    x = rng.randn(4, 21, 3).astype(np.float32)
    center = rng.randn(4, 3).astype(np.float32)
    cube = np.full((4, 3), 250., np.float32)
    err = xyz_to_error_mm(jnp.asarray(x), jnp.asarray(x),
                          jnp.asarray(center), jnp.asarray(cube))
    assert float(jnp.abs(err).max()) < 1e-4


def test_rigid_align_recovers_similarity_transform():
    rng = np.random.RandomState(1)
    B = np.asarray(rng.randn(21, 3), np.float64)
    # random rotation via QR
    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    A = 0.7 * (B @ q.T) + np.array([1.0, -2.0, 0.5])
    aligned = np.asarray(rigid_align(jnp.asarray(A, jnp.float32),
                                     jnp.asarray(B, jnp.float32)))
    assert np.abs(aligned - B).max() < 1e-3


def test_rigid_align_golden_vs_reference(ref_gfm):
    rng = np.random.RandomState(2)
    for i in range(5):
        A = rng.randn(21, 3).astype(np.float32)
        B = (A + 0.1 * rng.randn(21, 3)).astype(np.float32)
        got = np.asarray(rigid_align(jnp.asarray(A), jnp.asarray(B)))
        want = ref_gfm.rigid_align(A.astype(np.float64),
                                   B.astype(np.float64))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_rigid_align_batched_matches_loop(ref_gfm):
    rng = np.random.RandomState(3)
    A = rng.randn(6, 21, 3).astype(np.float32)
    B = (A + 0.2 * rng.randn(6, 21, 3)).astype(np.float32)
    got = np.asarray(rigid_align(jnp.asarray(A), jnp.asarray(B)))
    for i in range(6):
        want = ref_gfm.rigid_align(A[i].astype(np.float64),
                                   B[i].astype(np.float64))
        np.testing.assert_allclose(got[i], want, rtol=1e-3, atol=1e-3)


def test_pck_auc():
    errors = np.full((100, 21), 10.0)   # all errors 10mm
    auc, curve, th = pck_curve(errors)
    # pck jumps to 1 at ~10mm; AUC should be ~ (50-10)/50 with trapezoid
    assert 0.7 < auc < 0.9
    sub = auc_subset(curve, th)
    assert sub == pytest.approx(1.0)    # all under 20mm
