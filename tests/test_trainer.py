"""Trainer smoke test on a tiny synthetic dataset: one epoch of train +
test + checkpoint save/restore round trip."""

import os

import numpy as np
import jax
import pytest

from keypointfusion_tpu.config import Config
from keypointfusion_tpu.data.synthetic import synthetic_batch
from keypointfusion_tpu.training.trainer import Trainer


class SyntheticDataset:
    def __init__(self, n=8, point_num=128):
        self.samples = []
        for i in range(n):
            b = synthetic_batch(batch_size=1, point_num=point_num, seed=i)
            self.samples.append({k: v[0] for k, v in b.items()})

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    cfg = Config(batch_size=4, point_num=128)
    model_dir = str(tmp_path_factory.mktemp('model'))
    ds = SyntheticDataset(8)
    return Trainer(cfg, train_data=ds, test_data=SyntheticDataset(4),
                   model_dir=model_dir, use_mesh=True)


def test_one_epoch_and_checkpoint(trainer):
    err = trainer.test(epoch=0)
    assert np.isfinite(err)

    # drive a single training epoch through the loader + jitted step
    from keypointfusion_tpu.data.pipeline import BatchLoader, device_prefetch
    import jax.numpy as jnp
    loader = BatchLoader(trainer.train_data, 4, shuffle=True, num_workers=2)
    losses = []
    for batch in device_prefetch(loader):
        trainer._rng, rng = jax.random.split(trainer._rng)
        trainer.state, metrics = trainer.train_step(
            trainer.state, batch, rng, jnp.zeros((), jnp.int32))
        losses.append(float(jax.device_get(metrics['loss'])))
    assert np.isfinite(losses).all()

    # checkpoint round trip, incl. scheduler state (lr_scale/min_error/
    # plateau — resuming an 'auto' run must keep its decayed lr)
    trainer.state = trainer.state.replace(
        lr_scale=jnp.asarray(0.25, jnp.float32))
    trainer.ckpt.save('latest', trainer.state, epoch=0,
                      min_error=12.5, plateau=2)
    restored, epoch, min_error, plateau = trainer.ckpt.restore(
        'latest', trainer.state)
    assert epoch == 0
    assert min_error == 12.5 and plateau == 2
    assert float(restored.lr_scale) == 0.25
    p0 = jax.tree_util.tree_leaves(trainer.state.params)[0]
    p1 = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1))
    assert int(restored.step) == int(trainer.state.step)


def test_evaluation_dump(trainer, tmp_path):
    out = trainer.evaluation(out_path=str(tmp_path / 'pred.json'))
    assert os.path.exists(out)
    import json
    joints, meshes = json.load(open(out))
    assert len(joints) == 4 and np.asarray(joints[0]).shape == (21, 3)
    assert np.asarray(meshes[0]).shape == (778, 3)


def test_legacy_checkpoint_restores_with_default_scheduler_state(
        trainer, tmp_path):
    """A pre-round-3 checkpoint (no lr_scale/min_error/plateau keys) must
    still restore, default-filling the scheduler state (the Checkpointer's
    fallback path)."""
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    legacy = {'params': trainer.state.params,
              'batch_stats': trainer.state.batch_stats,
              'opt_state': trainer.state.opt_state,
              'step': trainer.state.step,
              'epoch': jnp.asarray(3)}
    ckptr = ocp.StandardCheckpointer()
    path = str(tmp_path / 'legacy')
    ckptr.save(path, legacy, force=True)
    ckptr.wait_until_finished()

    from keypointfusion_tpu.training.trainer import Checkpointer
    ck = Checkpointer(str(tmp_path))
    state, epoch, min_error, plateau = ck.restore('legacy', trainer.state)
    assert epoch == 3
    assert float(state.lr_scale) == 1.0
    assert min_error == float(np.finfo(np.float32).max)
    assert plateau == 0
