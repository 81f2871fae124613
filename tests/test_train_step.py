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


def test_flatten_opt_equivalence(cfg):
    """Config.flatten_opt only changes the opt_state LAYOUT, never the
    math: AdamW is elementwise, so the raveled-vector update and the
    per-leaf update must produce identical parameters and moments.
    Tested at the optimizer level (a full per-leaf train-step compile
    costs minutes on XLA CPU; the step factories share make_optimizer)."""
    from keypointfusion_tpu.training.train_step import make_optimizer
    rng = np.random.RandomState(0)
    params = {
        'conv': {'kernel': jnp.asarray(rng.randn(3, 3, 4, 8), jnp.float32),
                 'bias': jnp.asarray(rng.randn(8), jnp.float32)},
        'head': {'w': jnp.asarray(rng.randn(8, 21), jnp.float32)},
    }
    grads = jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.randn(*p.shape), p.dtype), params)
    import optax
    outs = {}
    for flat in (True, False):
        tx = make_optimizer(cfg.replace(flatten_opt=flat),
                            steps_per_epoch=100)
        opt_state = tx.init(params)
        p = params
        for _ in range(3):
            updates, opt_state = tx.update(grads, opt_state, p)
            p = optax.apply_updates(p, updates)
        outs[flat] = p
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(outs[True]),
            jax.tree_util.tree_leaves_with_path(outs[False])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-7, err_msg=str(kp))


def test_lr_schedule(cfg):
    from keypointfusion_tpu.training.train_step import make_lr_schedule
    sched = make_lr_schedule(cfg, steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(cfg.lr)
    assert float(sched(10 * cfg.step_size)) == pytest.approx(cfg.lr * 0.1)
    assert float(sched(10 * 2 * cfg.step_size)) == pytest.approx(
        cfg.lr * 0.01)
