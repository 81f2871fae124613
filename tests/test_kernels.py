"""Pallas kernel tests (interpret mode on CPU): the fused DESA grouped-MLP
pool must match the Flax module inference path."""

import numpy as np
import jax
import jax.numpy as jnp

from keypointfusion_tpu.models.desa import DESA
from keypointfusion_tpu.kernels.desa_pallas import (
    fold_bn, desa_apply_inference,
)


def test_fold_bn():
    rng = np.random.RandomState(0)
    dense = {'kernel': rng.randn(8, 16).astype(np.float32),
             'bias': rng.randn(16).astype(np.float32)}
    bn_p = {'scale': rng.rand(16).astype(np.float32) + 0.5,
            'bias': rng.randn(16).astype(np.float32)}
    bn_s = {'mean': rng.randn(16).astype(np.float32),
            'var': rng.rand(16).astype(np.float32) + 0.1}
    w, b = fold_bn(dense, bn_p, bn_s)
    x = rng.randn(4, 8).astype(np.float32)
    got = x @ np.asarray(w) + np.asarray(b)
    pre = x @ dense['kernel'] + dense['bias']
    want = (pre - bn_s['mean']) / np.sqrt(bn_s['var'] + 1e-5) \
        * bn_p['scale'] + bn_p['bias']
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_desa_pallas_matches_module():
    rng = np.random.RandomState(1)
    B, N, J, C = 2, 256, 21, 128
    pcl = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)).astype(np.float32))
    nodes = jnp.asarray(rng.uniform(-0.5, 0.5, (B, J, 3)).astype(np.float32))
    pf = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    nf = jnp.asarray(rng.randn(B, J, C).astype(np.float32))
    m = DESA()
    v = m.init(jax.random.PRNGKey(0), pf, nf, pcl, nodes)
    want = m.apply(v, pf, nf, pcl, nodes, False)
    got = desa_apply_inference(v['params'], v['batch_stats'], pf, nf, pcl,
                               nodes, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=2e-3)


def test_desa_dense_fused_kernel_matches_module():
    """Whole-DESA fused kernel (kernels/desa_dense_pallas.py) vs the
    module's dense eval path, interpret mode, incl. an empty-ball case."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from keypointfusion_tpu.models.desa import DESA
    from keypointfusion_tpu.kernels.desa_dense_pallas import \
        desa_dense_fused

    rng = np.random.RandomState(0)
    B, N, J, C = 2, 150, 21, 128
    pf = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    nf = jnp.asarray(rng.randn(B, J, C).astype(np.float32))
    pxyz = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)).astype(np.float32))
    nxyz = jnp.asarray(rng.uniform(-0.5, 0.5, (B, J, 3)).astype(np.float32))
    nxyz = nxyz.at[0, 0].set(jnp.array([5., 5., 5.]))   # empty balls
    d = DESA(128)
    v = jax.jit(d.init)(jax.random.PRNGKey(0), pf, nf, pxyz, nxyz)
    want = d.apply(v, pf, nf, pxyz, nxyz)
    got = desa_dense_fused(v['params'], v['batch_stats'], pf, nf, pxyz,
                           nxyz, interpret=True, mlp_precision='highest')
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-3)
