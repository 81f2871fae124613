"""Per-shard BatchNorm training step (reference DataParallel BN parity)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from keypointfusion_tpu.config import Config
from keypointfusion_tpu.data.synthetic import synthetic_batch
from keypointfusion_tpu.parallel.mesh import (
    make_mesh, shard_batch, replicated_sharding,
)
from keypointfusion_tpu.training.train_step import (
    create_train_state, make_train_step,
)


def to_jnp(batch):
    return {k: jnp.asarray(v) for k, v in batch.items()}


def test_per_shard_bn_step_runs_and_differs_from_sync():
    assert len(jax.devices()) >= 8
    mesh = make_mesh(8)
    batch = to_jnp(synthetic_batch(batch_size=8, point_num=128, seed=3))

    cfg_sync = Config(sync_batchnorm=True)
    cfg_local = Config(sync_batchnorm=False)
    state0 = create_train_state(cfg_sync, jax.random.PRNGKey(0), batch,
                                steps_per_epoch=100)
    state0 = jax.device_put(state0, replicated_sharding(mesh))
    sbatch = shard_batch(batch, mesh)
    rng = jax.random.PRNGKey(1)
    epoch = jnp.zeros((), jnp.int32)

    step_sync = make_train_step(cfg_sync, mesh)
    step_local = make_train_step(cfg_local, mesh)

    s_sync, m_sync = step_sync(state0, sbatch, rng, epoch)
    # state was donated; rebuild for the second run
    state0b = create_train_state(cfg_sync, jax.random.PRNGKey(0), batch,
                                 steps_per_epoch=100)
    state0b = jax.device_put(state0b, replicated_sharding(mesh))
    s_local, m_local = step_local(state0b, shard_batch(batch, mesh), rng,
                                  epoch)

    assert np.isfinite(float(m_sync['loss']))
    assert np.isfinite(float(m_local['loss']))
    # BN statistics must differ somewhere: averaged per-shard MEANS equal
    # the global mean exactly (equal shard sizes), but per-shard VARIANCES
    # are smaller than the global-batch variance
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(jax.tree_util.tree_leaves(s_sync.batch_stats),
                             jax.tree_util.tree_leaves(s_local.batch_stats))]
    assert max(diffs) > 1e-7, f"per-shard BN identical to sync: {max(diffs)}"
