"""Resume equivalence — Trainer.train() driven END TO END.

The headline improvement over the reference harness is a real resume: the
reference saves optimizer/epoch but never restores them
(/root/reference/train.py:97-107,267-302), so a resumed run silently
restarts cold. Here: N epochs straight must equal k epochs + kill + a
FRESH Trainer + resume + (N-k) epochs — params, optimizer state, BN stats,
step count and scheduler state all matching. Also proves the 'auto'
scheduler's plateau decay fires inside train() and persists across resume.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from keypointfusion_tpu.config import Config
from keypointfusion_tpu.training.trainer import Trainer
from tests.test_trainer import SyntheticDataset


@dataclasses.dataclass(frozen=True)
class TinyConfig(Config):
    """Config with a settable epoch budget (max_epoch is normally derived
    from the per-dataset EPOCH table)."""
    epochs: int = 4

    @property
    def max_epoch(self) -> int:
        return self.epochs


def _mk_cfg(**kw):
    # tiny everything; no test split -> train() uses the epoch's final
    # loss as test_error (deterministic), exercising the best/latest policy
    # without paying the eval compile
    base = dict(batch_size=4, point_num=128, epochs=4, seed=3)
    base.update(kw)
    return TinyConfig(**base)


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


def _assert_state_equal(a, b, atol=0.0, mean_atol=None, opt_atol=None,
                        opt_mean_atol=None):
    """mean_atol (used with atol>0): rounding drift is sparse — a few
    elements near atol, the bulk orders of magnitude below — while a
    semantic bug (wrong rng stream, skipped/reordered batch) shifts EVERY
    element at update scale. Bounding the mean separates the two.

    opt_atol/opt_mean_atol: optimizer moments accumulate RAW gradients.
    Executable-level rounding can flip discrete selections (top-k
    neighbors, ball-query membership), which changes a sparse set of
    gradient entries DISCRETELY — that lands in momentum at gradient
    scale (~1e-2) while the param effect stays lr-scaled. So moments get
    their own, gradient-scale bound; a semantic bug still trips the mean
    bound (every element moves)."""
    for la, lb in zip(_leaves(a.params), _leaves(b.params)):
        np.testing.assert_allclose(la, lb, rtol=0, atol=atol)
        if mean_atol is not None:
            assert np.abs(la - lb).mean() < mean_atol
    for la, lb in zip(_leaves(a.batch_stats), _leaves(b.batch_stats)):
        np.testing.assert_allclose(la, lb, rtol=0, atol=atol)
    for la, lb in zip(_leaves(a.opt_state), _leaves(b.opt_state)):
        oa = atol if opt_atol is None else opt_atol
        np.testing.assert_allclose(la, lb, rtol=0, atol=oa)
        if opt_mean_atol is not None and la.size > 1:
            assert np.abs(la - lb).mean() < opt_mean_atol
    assert int(a.step) == int(b.step)
    assert float(a.lr_scale) == float(b.lr_scale)


def test_train_resume_equivalence(tmp_path):
    ds = SyntheticDataset(8)

    # ---- straight: 4 epochs in one Trainer ----
    cfg = _mk_cfg()
    t_straight = Trainer(cfg, train_data=ds, test_data=None,
                         model_dir=str(tmp_path / 'straight'),
                         use_mesh=False)
    t_straight.train()
    final_straight = jax.device_get(t_straight.state)

    # ---- interrupted: 2 epochs, then a FRESH Trainer resumes for 2 ----
    cfg2 = _mk_cfg(epochs=2)
    rdir = str(tmp_path / 'resumed')
    t_a = Trainer(cfg2, train_data=ds, test_data=None, model_dir=rdir,
                  use_mesh=False)
    t_a.train()
    assert int(t_a.state.step) == 2 * (len(ds) // cfg.batch_size)

    cfg3 = _mk_cfg(epochs=4, resume=True)
    t_b = Trainer(cfg3, train_data=ds, test_data=None, model_dir=rdir,
                  use_mesh=False)
    assert t_b.start_epoch == 2          # latest was saved at epoch 1
    t_b.train()
    final_resumed = jax.device_get(t_b.state)

    # identical compiled step + identical data order (loader seeded by
    # seed+epoch) + identical rng stream (fold_in(epoch)) -> bit equality
    _assert_state_equal(final_straight, final_resumed, atol=0.0)


def test_scan_dispatch_matches_per_step():
    """ONE scan dispatch of G=2 steps must equal 2 sequential per-step
    dispatches from the same state: same ops, same rng stream. The scan
    body and the standalone step are different XLA executables, so fusion
    choices reassociate float reductions — bit equality is not attainable.
    Two drift channels over one group: (a) pure rounding (sparse param
    elements near 1e-5, bulk far below); (b) rounding that flips a
    DISCRETE selection (top-k neighbor, ball-query membership) in step
    2's forward, changing a sparse set of raw-gradient entries at
    gradient scale (~1e-2) — visible in the optimizer moments, lr-scaled
    in params (measured: 0.7% of momentum elements move ≤2e-2, params
    stay ≤2e-4). A semantic bug (wrong rng, swapped batch order inside
    the scan) moves EVERY element at full scale and trips the mean
    bounds. Whole-run
    scan-vs-per-step equivalence follows transitively from this plus
    test_steps_per_dispatch_trainer_equivalence (which pins the Trainer's
    wiring bitwise); asserting it directly is not meaningful — per-step
    rounding noise compounds chaotically through BN/momentum over epochs
    (measured: 6 tiny SGD steps already push single BN-var elements past
    6e-3)."""
    import numpy as np
    from keypointfusion_tpu.data.pipeline import collate
    from keypointfusion_tpu.training.train_step import (
        create_train_state, make_train_step, make_train_step_scan)

    ds = SyntheticDataset(8)
    cfg = _mk_cfg(opt='sgd')
    b0 = collate([ds[i] for i in range(4)])
    b1 = collate([ds[i] for i in range(4, 8)])
    with jax.default_matmul_precision('highest'):
        # steps_per_epoch=3 matches test_steps_per_dispatch_trainer_
        # equivalence's Trainer (ds12/bs4): the schedule divisor is baked
        # into the HLO, and matching it lets that test reuse this test's
        # compiled executables via the persistent cache (each full-model
        # XLA CPU compile costs minutes on the 1-core suite box).
        # Semantics unchanged: both steps run in epoch 0 either way.
        state0 = create_train_state(cfg, jax.random.PRNGKey(0), b0,
                                    steps_per_epoch=3)
        host0 = jax.device_get(state0)
        rngs = jax.random.split(jax.random.PRNGKey(5), 2)
        ep = jnp.asarray(0, jnp.int32)

        step = make_train_step(cfg)          # donates its state arg ->
        s, _ = step(jax.device_get(host0), b0, rngs[0], ep)   # feed copies
        s, _ = step(s, b1, rngs[1], ep)
        per_step = jax.device_get(s)

        scan = make_train_step_scan(cfg)
        stacked = {k: np.stack([b0[k], b1[k]]) for k in b0}
        s2, m = scan(jax.device_get(host0), stacked, rngs, ep)
        scanned = jax.device_get(s2)
        assert m['loss'].shape == (2,)       # metrics come back stacked

    _assert_state_equal(per_step, scanned, atol=2e-4, mean_atol=2e-5,
                        opt_atol=5e-2, opt_mean_atol=1e-4)


def test_steps_per_dispatch_trainer_equivalence(tmp_path):
    """Trainer.train() with cfg.steps_per_dispatch=2 (3 steps/epoch = one
    scan group of 2 + a partial-tail single step) must be BITWISE equal to
    a hand replay of the same schedule through the same executables
    (t.train_scan / t.train_step, same loader seeds, same rng stream).
    This pins every piece of the Trainer's scan wiring — batch grouping
    order, rng slicing, tail handoff, epoch loop — with zero float
    tolerance; the scan-vs-per-step MATH is covered separately by
    test_scan_dispatch_matches_per_step."""
    import numpy as np
    from keypointfusion_tpu.data.pipeline import BatchLoader

    ds = SyntheticDataset(12)   # 3 batches of 4 per epoch -> tail of 1
    cfg = _mk_cfg(epochs=2, opt='sgd', steps_per_dispatch=2)
    # default_matmul_precision('highest') matches test_scan_dispatch_
    # matches_per_step's context, so this test's per-step and scan
    # executables are the SAME HLO that test already compiled (persistent
    # cache hit — the assertion below is trained-vs-replayed through
    # identical executables, so the ambient precision cannot affect it)
    with jax.default_matmul_precision('highest'):
        t = Trainer(cfg, train_data=ds, test_data=None,
                    model_dir=str(tmp_path / 'scan'), use_mesh=False)
        assert t.train_scan is not None
        init = jax.device_get(t.state)       # train() donates the state
        base_rng = np.asarray(t._rng)
        t.train()
        trained = jax.device_get(t.state)

        # hand replay: same loader seeds -> same batch order; same rng
        # stream
        state = init
        for epoch in range(cfg.max_epoch):
            loader = BatchLoader(ds, cfg.batch_size, shuffle=True,
                                 num_workers=2, seed=cfg.seed + epoch)
            batches = list(loader)
            assert len(batches) == 3
            step_rngs = jax.random.split(
                jax.random.fold_in(jnp.asarray(base_rng), epoch),
                len(batches))
            ep = jnp.asarray(epoch, jnp.int32)
            stacked = {k: np.stack([batches[0][k], batches[1][k]])
                       for k in batches[0]}
            state, _ = t.train_scan(state, stacked, step_rngs[:2], ep)
            state, _ = t.train_step(state, batches[2], step_rngs[2], ep)
        replayed = jax.device_get(state)

    assert int(trained.step) == 6
    _assert_state_equal(trained, replayed, atol=0.0)


def test_auto_scheduler_plateau_fires_and_persists(tmp_path):
    """scheduler='auto': the plateau decay must actually fire inside
    Trainer.train() (trainer.py:314-326) and the decayed lr_scale +
    tracking state must survive a resume into a fresh Trainer."""
    ds = SyntheticDataset(8)
    cfg = _mk_cfg(epochs=3, scheduler='auto')
    mdir = str(tmp_path / 'auto')
    t = Trainer(cfg, train_data=ds, test_data=SyntheticDataset(4),
                model_dir=mdir, use_mesh=False)
    t.plateau_patience = 2
    # deterministic worsening test errors: epoch 0 improves (inf -> 100),
    # epochs 1-2 plateau -> decay fires at epoch 2
    t.test = lambda epoch=-1: 100.0 + epoch
    t.train()
    gamma = cfg.step_gamma
    assert float(t.state.lr_scale) == pytest.approx(gamma)
    assert t._plateau == 0               # reset after firing
    assert t.min_error == 100.0

    # fresh Trainer + resume: scheduler state persists
    cfg2 = dataclasses.replace(cfg, epochs=3, resume=True)
    t2 = Trainer(cfg2, train_data=ds, test_data=SyntheticDataset(4),
                 model_dir=mdir, use_mesh=False)
    assert t2.start_epoch == 3
    assert float(t2.state.lr_scale) == pytest.approx(gamma)
    assert t2.min_error == 100.0
    assert t2._plateau == 0

    # and the decayed scale actually shrinks the applied update
    from keypointfusion_tpu.data.pipeline import collate
    batch = {k: jnp.asarray(v) for k, v in
             collate([ds[i] for i in range(4)]).items()}
    rng = jax.random.PRNGKey(0)
    ep = jnp.asarray(0, jnp.int32)
    # the step donates its state argument -> feed host copies, keep p0
    host = jax.device_get(t2.state)
    p0 = _leaves(host.params)[0]
    s_scaled, _ = t2.train_step(jax.device_get(t2.state), batch, rng, ep)
    s_unscaled, _ = t2.train_step(
        jax.device_get(t2.state).replace(
            lr_scale=jnp.ones((), jnp.float32)), batch, rng, ep)
    d_scaled = np.abs(_leaves(jax.device_get(s_scaled.params))[0]
                      - p0).max()
    d_unscaled = np.abs(_leaves(jax.device_get(s_unscaled.params))[0]
                        - p0).max()
    assert 0 < d_scaled < d_unscaled
