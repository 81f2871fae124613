"""Dense DESA formulation vs the gather formulation: eval outputs, train
outputs, AND training BatchNorm statistics must match (the dense path's
weighted BN reproduces the gather path's [B,J,S,C] multiset exactly —
models/desa.py, models/norm.py:WeightedTorchBatchNorm)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from keypointfusion_tpu.models.desa import DESA, dense_group_masks
from keypointfusion_tpu.ops.ball_query import ball_query_group
from keypointfusion_tpu.ops.pairwise import pairwise_sqdist


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    B, N, J, C = 3, 150, 21, 64
    pf = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    nf = jnp.asarray(rng.randn(B, J, C).astype(np.float32))
    pxyz = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)).astype(np.float32))
    nxyz = jnp.asarray(rng.uniform(-0.5, 0.5, (B, J, 3)).astype(np.float32))
    # an isolated joint triggers the empty-ball fallback at r=0.1
    nxyz = nxyz.at[0, 0].set(jnp.array([5., 5., 5.]))
    return pf, nf, pxyz, nxyz


def test_dense_matches_gather_eval_train_and_stats(data):
    pf, nf, pxyz, nxyz = data
    d_dense = DESA(64, mlp=(64, 64))
    d_gath = DESA(64, mlp=(64, 64), dense_eval=False, dense_train=False)
    v = jax.jit(d_gath.init)(jax.random.PRNGKey(0), pf, nf, pxyz, nxyz)

    a = d_dense.apply(v, pf, nf, pxyz, nxyz)
    b = d_gath.apply(v, pf, nf, pxyz, nxyz)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    at, avars = d_dense.apply(v, pf, nf, pxyz, nxyz, True,
                              mutable=['batch_stats'])
    bt, bvars = d_gath.apply(v, pf, nf, pxyz, nxyz, True,
                             mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(at), np.asarray(bt), atol=2e-5)
    flat_a = jax.tree_util.tree_leaves_with_path(avars['batch_stats'])
    flat_b = dict(jax.tree_util.tree_leaves_with_path(bvars['batch_stats']))
    for path, x in flat_a:
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(flat_b[path]), atol=2e-5,
            err_msg=jax.tree_util.keystr(path))


def test_dense_group_weights_sum_to_s(data):
    """Every (b,j) group must contribute exactly S slots of BN weight."""
    _, _, pxyz, nxyz = data
    sup = jnp.concatenate([pxyz, nxyz], axis=1)
    d2 = pairwise_sqdist(nxyz, sup)
    for r, s in ((0.1, 64), (0.2, 64), (0.4, 64)):
        mask, w = dense_group_masks(d2, r, s)
        np.testing.assert_allclose(np.asarray(jnp.sum(w, -1)), s)
        # mask agrees with the gather path's valid set (as an index set)
        idx, valid, _ = ball_query_group(sup, nxyz, r, s, d2=d2)
        got = np.zeros(mask.shape, bool)
        b_i, j_i, _ = np.meshgrid(np.arange(mask.shape[0]),
                                  np.arange(mask.shape[1]),
                                  np.arange(s), indexing='ij')
        got[b_i[valid], j_i[valid], np.asarray(idx)[np.asarray(valid)]] = \
            True
        np.testing.assert_array_equal(np.asarray(mask), got)


def test_dense_train_gradients_flow(data):
    pf, nf, pxyz, nxyz = data
    d = DESA(64, mlp=(64, 64))
    v = jax.jit(d.init)(jax.random.PRNGKey(0), pf, nf, pxyz, nxyz)

    def loss(params, pfe):
        out, _ = d.apply({'params': params,
                          'batch_stats': v['batch_stats']},
                         pfe, nf, pxyz, nxyz, True,
                         mutable=['batch_stats'])
        return jnp.sum(out ** 2)

    g = jax.grad(loss, argnums=(0, 1))(v['params'], pf)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_exclusive_rank_matches_cumsum():
    """exclusive_rank (the MXU-matmul rank) must equal the cumsum
    definition BIT-EXACTLY on every backend and density. Guards two
    round-5 regressions: the transposed triangle (suffix counts — picked
    the LAST S in-ball members) and CPU oneDNN's bf16 accumulation
    (counts > 256 rounded)."""
    from keypointfusion_tpu.ops.ball_query import exclusive_rank
    rng = np.random.RandomState(0)
    for p in (0.0, 0.05, 0.3, 0.9, 1.0):
        for shape in ((8, 21, 1045), (2, 5, 64)):
            ib = rng.rand(*shape) < p
            want = np.cumsum(ib.astype(np.int32), -1) - ib.astype(np.int32)
            got = np.asarray(jax.jit(exclusive_rank)(jnp.asarray(ib)))
            np.testing.assert_array_equal(got, want,
                                          err_msg=f'p={p} shape={shape}')
