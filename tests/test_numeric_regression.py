"""Numeric regression guard: the jitted KPFusion forward with fixed seeds
must reproduce the stored golden vectors (tests/golden_kpfusion_forward.npz,
generated on CPU). Protects later rounds from silently changing model
numerics during refactors. Regenerate deliberately via the snippet in the
file's git history if the model is intentionally changed."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__),
                      'golden_kpfusion_forward.npz')


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="no golden file")
def test_kpfusion_forward_matches_golden():
    from keypointfusion_tpu.config import Config
    from keypointfusion_tpu.data.synthetic import synthetic_batch
    from keypointfusion_tpu.models.kpfusion import KPFusion
    from keypointfusion_tpu.training.train_step import frame_from_batch

    cfg = Config()
    b = {k: jnp.asarray(v) for k, v in synthetic_batch(
        batch_size=2, point_num=256, seed=42).items()}
    model = KPFusion(joint_num=21)
    v = model.init(jax.random.PRNGKey(7), b['rgb'], b['depth'], b['pcl'],
                   frame_from_batch(b, cfg))
    results, sw = jax.jit(lambda v, rgb, d, p, f: model.apply(
        v, rgb, d, p, f))(v, b['rgb'], b['depth'], b['pcl'],
                          frame_from_batch(b, cfg))
    golden = np.load(GOLDEN)
    for i, r in enumerate(results):
        np.testing.assert_allclose(
            np.asarray(r), golden[f'result_{i}'], rtol=2e-3, atol=2e-4,
            err_msg=f'result_{i} diverged from golden')
    np.testing.assert_allclose(np.asarray(sw[0]),
                               golden['spatial_weight_0'],
                               rtol=2e-3, atol=2e-4)
