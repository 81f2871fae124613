"""Multi-step training-trajectory parity vs the reference torch pipeline
(VERDICT r2 item 4a).

Runs N full train steps — forward (train-mode BN), reference loss assembly,
optimizer update, BN running-stat update — on BOTH frameworks from the same
converted weights and the same fixed batch sequence, and asserts bounded
divergence of the loss curve and final parameters. Dropout is disabled on
both sides (rates are identical but the RNG streams cannot be aligned
across frameworks); everything else runs the real training path, so drift
through optimizer state + BN statistics compounds exactly as in training.
lr is small (1e-5) to keep the drift regime linear.

The trajectory optimizer is SGD+momentum, NOT AdamW: Adam normalizes each
update to ~lr*sign(m/sqrt(v)), so for near-zero-gradient parameters (BN
biases) a 1e-6 cross-framework forward difference flips the SIGN of the
whole update — divergence of 2*lr*steps with no bug present. SGD updates
are proportional to the gradient, so bounded gradient deviation gives
bounded parameter deviation. AdamW's exact update/decay/schedule semantics
are pinned separately by test_optimizer_semantics_vs_torch_adamw.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_full_forward_parity import TorchQueryAndGroup
from test_full_checkpoint_convert import build_reference_kpfusion
from test_training_dynamics_parity import _torch_loss

B = 2
STEPS = 10
LR = 1e-5


@pytest.fixture(scope="module")
def ref_net():
    net = build_reference_kpfusion()
    for block in (net.block1, net.block2):
        for i, _ in enumerate(block.FA.groupers):
            block.FA.groupers[i] = TorchQueryAndGroup(
                block.FA.radius[i], block.FA.S[i])
    for m in net.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    return net


def _batches(n=3):
    out = []
    for seed in range(n):
        rng = np.random.RandomState(100 + seed)
        depth = rng.uniform(-1, 1, (B, 128, 128, 1)).astype(np.float32)
        depth[depth > 0.4] = 1.0
        out.append({
            'rgb': rng.rand(B, 128, 128, 3).astype(np.float32),
            'depth': depth,
            'pcl': rng.uniform(-0.9, 0.9, (B, 1024, 3)).astype(np.float32),
            'uvd_gt': rng.uniform(-0.7, 0.7, (B, 21, 3)).astype(np.float32),
            'xyz_gt': rng.uniform(-0.7, 0.7, (B, 21, 3)).astype(np.float32),
            'cam_para': np.tile(np.array([[600., 600., 320., 240.]],
                                         np.float32), (B, 1)),
            'center': np.tile(np.array([[10., -10., 600.]], np.float32),
                              (B, 1)),
            'M': np.tile((np.eye(3) * [0.5, 0.5, 1.]).astype(
                np.float32)[None], (B, 1, 1)),
            'cube': np.full((B, 3), 250., np.float32),
        })
    return out


def test_trajectory_parity(ref_net, monkeypatch):
    import jax
    import jax.numpy as jnp
    import optax
    from keypointfusion_tpu.config import Config
    from keypointfusion_tpu.geometry import CropFrame
    from keypointfusion_tpu.models.kpfusion import KPFusion
    from keypointfusion_tpu.training.losses import compute_losses
    from keypointfusion_tpu.utils.torch_convert import (
        convert_kpfusion_checkpoint)

    batches = _batches(3)
    net = ref_net.train()
    sd0 = {k: v.clone() for k, v in net.state_dict().items()}

    # ---- torch trajectory ----
    opt_t = torch.optim.SGD(net.parameters(), lr=LR, momentum=0.9)
    losses_t = []
    for step in range(STEPS):
        b = batches[step % len(batches)]
        net.zero_grad(set_to_none=True)
        loss = _torch_loss(net, b, monkeypatch)
        loss.backward()
        opt_t.step()
        losses_t.append(float(loss.item()))
    sd_t = {k: v.clone() for k, v in net.state_dict().items()}
    net.load_state_dict(sd0)   # restore for other tests
    net.eval()

    # ---- jax trajectory (same converted start, same batches) ----
    converted = convert_kpfusion_checkpoint({'model': sd0}, depth=18)
    cfg = Config(batch_size=B)
    model = KPFusion(joint_num=21, dropout=0.0)
    params = jax.tree_util.tree_map(jnp.asarray, converted['params'])
    batch_stats = jax.tree_util.tree_map(jnp.asarray,
                                         converted['batch_stats'])
    tx = optax.sgd(LR, momentum=0.9)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, jb, frame):
        def loss_fn(p):
            (results, sw), newv = model.apply(
                {'params': p, 'batch_stats': batch_stats},
                jb['rgb'], jb['depth'], jb['pcl'], frame, 0.8, True,
                rngs={'dropout': jax.random.PRNGKey(0)},
                mutable=['batch_stats'])
            loss, _ = compute_losses(results, sw, jb['depth'],
                                     jb['uvd_gt'], jb['xyz_gt'], frame,
                                     cfg, 0)
            return loss, newv['batch_stats']
        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_bs, new_opt,
                loss)

    losses_j = []
    for step in range(STEPS):
        b = batches[step % len(batches)]
        frame = CropFrame.from_batch(b['cam_para'], b['center'], b['M'],
                                     b['cube'])
        jb = {k: jnp.asarray(v) for k, v in b.items()}
        params, batch_stats, opt_state, loss = train_step(
            params, batch_stats, opt_state, jb, frame)
        losses_j.append(float(loss))

    # loss curves track each other through all steps
    for s, (lt, lj) in enumerate(zip(losses_t, losses_j)):
        assert abs(lt - lj) < 5e-3 * max(abs(lt), 1.0), (s, lt, lj)

    # final parameters: bounded drift relative to how far each tensor
    # actually moved over the trajectory (catches compounding divergence
    # in grads/Adam moments/BN stats without demanding bit equality)
    want = convert_kpfusion_checkpoint({'model': sd_t}, depth=18)
    flat_want = dict(jax.tree_util.tree_leaves_with_path(want['params']))
    flat_start = dict(jax.tree_util.tree_leaves_with_path(
        convert_kpfusion_checkpoint({'model': sd0}, depth=18)['params']))
    flat_got = dict(jax.tree_util.tree_leaves_with_path(params))
    worst = 0.0
    for path, w in flat_want.items():
        w = np.asarray(w, np.float64)
        g = np.asarray(flat_got[path], np.float64)
        moved = np.abs(w - np.asarray(flat_start[path], np.float64)).max()
        dev = np.abs(g - w).max()
        # floors: (a) f32 rounding noise at the PARAMETER's magnitude,
        # (b) a few LR — two noise regimes live below that: tensors whose
        # total movement is below a step's scale (pure gradient noise),
        # and input-side convs feeding train-mode BN, whose gradient is a
        # cancellation residual of the BN projection (scale-invariance),
        # so ~1e-3 cross-framework f32 noise in the upstream cotangents
        # arrives amplified to the size of the gradient itself (verified
        # against an isolated-backbone backward, which matches at 2e-3).
        # Tensors that actually move get the 5%-of-movement criterion,
        # which is what catches compounding divergence.
        tol = max(0.05 * moved, 5e-6 * np.abs(w).max(), 3 * LR)
        worst = max(worst, dev / tol)
        assert dev < tol, (jax.tree_util.keystr(path), dev, tol, moved)
    print('trajectory: worst final-param deviation (fraction of tol):',
          worst)

    # BN running stats also track. Tolerance note: the DESA group BNs see
    # the ball-query multiset, and a support point at the in-ball BOUNDARY
    # can flip membership between torch's cdist^2 and our matmul d2 (f32
    # rounding), shifting that step's batch stats by ~1e-3 — this is
    # selection ambiguity, not drift (the duplicate-fill semantics bug
    # this test caught showed up as 0.29 here).
    flat_bs_want = dict(jax.tree_util.tree_leaves_with_path(
        want['batch_stats']))
    flat_bs_got = dict(jax.tree_util.tree_leaves_with_path(batch_stats))
    for path, w in flat_bs_want.items():
        w = np.asarray(w, np.float64)
        g = np.asarray(flat_bs_got[path], np.float64)
        scale = max(np.abs(w).max(), 1.0)
        assert np.abs(g - w).max() < 1e-2 * scale, \
            (jax.tree_util.keystr(path), np.abs(g - w).max())
