"""Config-option wiring tests: feature_type dispatch in the train step and
eval decode, loss_type dispatch, scheduler='constant'/'auto' (plateau
lr_scale), finetune/load partial merge, and the per-stage eval result dumps
(reference train.py:100-117, 216-219, 295-301, 308-310)."""

import os
import os.path as osp

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from keypointfusion_tpu.config import Config
from keypointfusion_tpu.training.train_step import (
    create_train_state, frame_from_batch, make_lr_schedule, make_train_step,
)
from test_trainer import SyntheticDataset


def _batch(n=2, point_num=128, seed=0):
    from keypointfusion_tpu.data.synthetic import synthetic_batch
    return {k: jnp.asarray(v) for k, v in
            synthetic_batch(batch_size=n, point_num=point_num,
                            seed=seed).items()}


@pytest.mark.parametrize("feature_type", [('offset',),
                                          ('weight_offset_nosoftmax',)])
def test_train_step_feature_type_dispatch(feature_type):
    """One jitted train step with a non-default feature_type — the loss
    must route through joint_to_feature/feature_to_joint
    (reference train.py:216-219)."""
    cfg = Config(batch_size=2, point_num=128, feature_type=feature_type)
    batch = _batch()
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg, mesh=None)
    state, metrics = step(state, batch, jax.random.PRNGKey(1),
                          jnp.zeros((), jnp.int32))
    assert np.isfinite(float(metrics['loss']))


def test_loss_type_mse():
    cfg = Config(batch_size=2, point_num=128, loss_type='Mse')
    batch = _batch()
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg, mesh=None)
    state, metrics = step(state, batch, jax.random.PRNGKey(1),
                          jnp.zeros((), jnp.int32))
    assert np.isfinite(float(metrics['loss']))


def test_loss_type_ghm_rejected():
    from keypointfusion_tpu.training.losses import elementwise_loss
    with pytest.raises(NotImplementedError):
        elementwise_loss(Config(loss_type='GHM'))


def test_scheduler_options():
    cfg_step = Config(scheduler='step')
    cfg_const = Config(scheduler='constant')
    s_step = make_lr_schedule(cfg_step, steps_per_epoch=10)
    s_const = make_lr_schedule(cfg_const, steps_per_epoch=10)
    # staircase decays at step_size epochs; constant never does
    late = 10 * cfg_step.step_size
    assert s_step(0) == cfg_step.lr
    assert s_step(late) == pytest.approx(cfg_step.lr * cfg_step.step_gamma)
    assert s_const(late) == cfg_const.lr


def test_lr_scale_scales_update():
    """TrainState.lr_scale must scale the applied update exactly (used by
    scheduler='auto' plateau decay)."""
    # bs=4 + steps_per_epoch=2 match test_resume_equivalence's Trainer
    # executables exactly (same HLO -> persistent-cache hit instead of a
    # fresh ~2 min full-model XLA CPU compile; the lr_scale semantics
    # under test are batch-size-independent)
    cfg = Config(batch_size=4, point_num=128)
    batch = _batch(n=4)
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                               steps_per_epoch=2)
    step = make_train_step(cfg, mesh=None)
    rng = jax.random.PRNGKey(1)
    ep = jnp.zeros((), jnp.int32)

    s_full, _ = step(state, batch, rng, ep)
    state2 = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                                steps_per_epoch=2).replace(
        lr_scale=jnp.asarray(0.0, jnp.float32))
    s_zero, _ = step(state2, batch, rng, ep)
    # zero scale → params unchanged
    ref = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                             steps_per_epoch=2).params
    for a, b in zip(jax.tree_util.tree_leaves(s_zero.params),
                    jax.tree_util.tree_leaves(ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # full scale → params changed
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(s_full.params),
                        jax.tree_util.tree_leaves(ref)))
    assert changed


def test_merge_partial_shape_gate():
    from keypointfusion_tpu.utils.torch_convert import merge_partial
    init = {'a': np.zeros((2, 2)), 'b': np.zeros(3), 'c': np.zeros(4)}
    loaded = {'a': np.ones((2, 2)), 'b': np.ones(5), 'd': np.ones(1)}
    merged, used, skipped = merge_partial(init, loaded)
    np.testing.assert_allclose(merged['a'], 1.0)    # taken
    np.testing.assert_allclose(merged['b'], 0.0)    # shape mismatch → kept
    np.testing.assert_allclose(merged['c'], 0.0)    # absent → kept
    assert len(used) == 1 and len(skipped) == 1


def test_eval_result_dumps(tmp_path):
    """Trainer.test must write per-stage test_%d.txt (world-mm joints per
    sample) and id.txt (reference train.py:308-310)."""
    from keypointfusion_tpu.training.trainer import Trainer
    cfg = Config(batch_size=4, point_num=128)
    tr = Trainer(cfg, train_data=SyntheticDataset(4),
                 test_data=SyntheticDataset(4),
                 model_dir=str(tmp_path), use_mesh=False)
    err = tr.test(epoch=0)
    assert np.isfinite(err)
    for i in range(len(cfg.stage_type)):
        path = osp.join(str(tmp_path), f'test_{i}.txt')
        assert os.path.exists(path)
        lines = open(path).read().strip().splitlines()
        assert len(lines) == 4
        assert len(lines[0].split()) == cfg.joint_num * 3
    ids = open(osp.join(str(tmp_path), 'id.txt')).read().split()
    assert ids == [str(i) for i in range(4)]


def test_finetune_dir_orbax(tmp_path):
    """finetune_dir warm start from an Orbax checkpoint restores weights
    (reference train.py:109-117)."""
    from keypointfusion_tpu.training.trainer import Trainer
    cfg = Config(batch_size=4, point_num=128)
    d1 = str(tmp_path / 'm1')
    tr = Trainer(cfg, train_data=SyntheticDataset(4),
                 test_data=SyntheticDataset(4), model_dir=d1,
                 use_mesh=False)
    tr.ckpt.save('best', tr.state, epoch=0)
    want = np.asarray(jax.tree_util.tree_leaves(tr.state.params)[0])

    cfg2 = cfg.replace(finetune_dir=osp.join(d1, 'ckpt', 'best'),
                       seed=cfg.seed + 99)
    tr2 = Trainer(cfg2, train_data=SyntheticDataset(4),
                  test_data=SyntheticDataset(4),
                  model_dir=str(tmp_path / 'm2'), use_mesh=False)
    got = np.asarray(jax.tree_util.tree_leaves(tr2.state.params)[0])
    np.testing.assert_allclose(got, want)
