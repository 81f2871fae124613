"""Serving-mode ('default' precision) kernel paths in interpret mode.

The exact 'highest' paths are bit-compared elsewhere; these tests pin the
bf16 serving paths STRUCTURALLY (they lower, run, and stay within
bf16-level tolerance of the exact path) so a CPU-only CI catches breakage
without TPU access. Hardware-only lowering hazards (Mosaic) are still
validated by scripts/tpu_check_{desa,sampler}.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from keypointfusion_tpu.models.desa import DESA
from keypointfusion_tpu.kernels.desa_dense_pallas import desa_dense_fused
from keypointfusion_tpu.kernels.pixel_sampler_pallas import (
    sample_pixel_features_fused,
)


def test_desa_serving_mode_close_to_exact():
    b, n, j, c = 2, 128, 21, 128
    rng = np.random.RandomState(0)
    pf = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    nf = jnp.asarray(rng.randn(b, j, c).astype(np.float32))
    px = jnp.asarray(rng.uniform(-.9, .9, (b, n, 3)).astype(np.float32))
    nx = jnp.asarray(rng.uniform(-.7, .7, (b, j, 3)).astype(np.float32))
    m = DESA(c, (128, 128), (64, 64, 64), (0.1, 0.2, 0.4))
    v = m.init(jax.random.PRNGKey(0), pf, nf, px, nx)
    hi = np.asarray(desa_dense_fused(
        v['params'], v['batch_stats'], pf, nf, px, nx,
        interpret=True, mlp_precision='highest'))
    lo = np.asarray(desa_dense_fused(
        v['params'], v['batch_stats'], pf, nf, px, nx,
        interpret=True, mlp_precision='default'))
    rel = np.abs(hi - lo).max() / max(np.abs(hi).max(), 1e-9)
    assert rel < 0.02, rel            # bf16-level, not garbage


def test_sampler_serving_mode_close_to_exact():
    b, n, hw, c = 2, 256, 1024, 64
    rng = np.random.RandomState(1)
    pcl = jnp.asarray(rng.uniform(-.9, .9, (b, n, 3)).astype(np.float32))
    img_xyz = jnp.asarray(rng.uniform(-1, 1, (b, hw, 3)
                                      ).astype(np.float32))
    feat = jnp.asarray(rng.randn(b, hw, c).astype(np.float32))
    hi = np.asarray(sample_pixel_features_fused(
        pcl, img_xyz, feat, k=4, interpret=True,
        feat_precision='highest')).astype(np.float32)
    lo = np.asarray(sample_pixel_features_fused(
        pcl, img_xyz, feat, k=4, interpret=True,
        feat_precision='default')).astype(np.float32)
    # random continuous points: no boundary ties, same selection set;
    # differences are bf16 rounding of features/weights only
    rel = np.abs(hi - lo).max() / max(np.abs(hi).max(), 1e-9)
    assert rel < 0.02, rel
    assert lo.dtype == np.float32     # cast on exit, bf16 inside


def test_sampler_serving_mode_tile_aligned_channels():
    """c % 128 == 0: the serving normalizer's ones column must force an
    extra lane tile rather than overwrite a real channel."""
    b, n, hw, c = 2, 256, 1024, 128
    rng = np.random.RandomState(2)
    pcl = jnp.asarray(rng.uniform(-.9, .9, (b, n, 3)).astype(np.float32))
    img_xyz = jnp.asarray(rng.uniform(-1, 1, (b, hw, 3)
                                      ).astype(np.float32))
    feat = jnp.asarray(rng.randn(b, hw, c).astype(np.float32))
    hi = np.asarray(sample_pixel_features_fused(
        pcl, img_xyz, feat, k=4, interpret=True,
        feat_precision='highest')).astype(np.float32)
    lo = np.asarray(sample_pixel_features_fused(
        pcl, img_xyz, feat, k=4, interpret=True,
        feat_precision='default')).astype(np.float32)
    assert lo.shape == (b, n, c)
    rel = np.abs(hi - lo).max() / max(np.abs(hi).max(), 1e-9)
    assert rel < 0.02, rel
