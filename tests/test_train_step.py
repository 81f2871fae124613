"""End-to-end training slice: jitted train step on an 8-device CPU mesh,
loss decreases on a fixed synthetic batch (SURVEY.md §4's fixed-seed
tiny-batch loss-decrease test)."""

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
    create_train_state, make_train_step, make_eval_step,
)


def to_jnp(batch):
    return {k: jnp.asarray(v) for k, v in batch.items()}


@pytest.fixture(scope="module")
def cfg():
    return Config()


def test_train_step_runs_and_loss_decreases(cfg):
    batch = to_jnp(synthetic_batch(batch_size=8, point_num=128, seed=0))
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                               steps_per_epoch=100)
    train_step = make_train_step(cfg)
    epoch = jnp.zeros((), jnp.int32)
    losses = []
    for i in range(8):
        state, metrics = train_step(state, batch, jax.random.PRNGKey(i),
                                    epoch)
        losses.append(float(metrics['loss']))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


def test_train_step_multidevice_mesh(cfg):
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh(8)
    batch = to_jnp(synthetic_batch(batch_size=8, point_num=128, seed=1))
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                               steps_per_epoch=100)
    state = jax.device_put(state, replicated_sharding(mesh))
    batch = shard_batch(batch, mesh)
    train_step = make_train_step(cfg, mesh)
    state, metrics = train_step(state, batch, jax.random.PRNGKey(1),
                                jnp.zeros((), jnp.int32))
    assert np.isfinite(float(metrics['loss']))

    eval_step = make_eval_step(cfg, mesh)
    results, sw = eval_step(state, batch)
    assert results[-1].shape == (8, cfg.joint_num, 3)


def test_lr_schedule(cfg):
    from keypointfusion_tpu.training.train_step import make_lr_schedule
    sched = make_lr_schedule(cfg, steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(cfg.lr)
    assert float(sched(10 * cfg.step_size)) == pytest.approx(cfg.lr * 0.1)
    assert float(sched(10 * 2 * cfg.step_size)) == pytest.approx(
        cfg.lr * 0.01)
