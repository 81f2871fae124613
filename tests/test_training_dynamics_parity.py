"""Training-dynamics parity vs the reference torch pipeline, split into the
three independently-tight links (an end-to-end one-step AdamW compare is
sign-unstable where gradients ~0, since a first Adam step is ~lr*sign(g)):

1. GRADIENT parity: same converted weights, same batch, the reference loss
   assembly (train.py:211-261, GFM codecs + SmoothL1) vs ours
   (training/losses.py) — compare d(loss)/d(params) tree to tree.
2. OPTIMIZER parity: identical synthetic gradients through torch
   AdamW(lr=8e-4, wd=0.01) + StepLR(step_size,0.1) vs optax adamw + our
   staircase schedule, across a decay boundary — pins betas/eps, the
   weight-decay SCOPE (torch AdamW decays BN scale/bias too; optax adamw
   with no mask does the same), and the schedule.
3. BATCHNORM running-stat update parity: one train-mode forward, compare
   updated backbone batch_stats vs torch running_mean/var (pins momentum
   direction and torch's unbiased-var running update).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_full_forward_parity import TorchQueryAndGroup
from test_full_checkpoint_convert import build_reference_kpfusion

B = 2


@pytest.fixture(scope="module")
def ref_net():
    net = build_reference_kpfusion()
    for block in (net.block1, net.block2):
        for i, _ in enumerate(block.FA.groupers):
            block.FA.groupers[i] = TorchQueryAndGroup(
                block.FA.radius[i], block.FA.S[i])
    return net


@pytest.fixture(scope="module")
def batch_np():
    rng = np.random.RandomState(3)
    depth = rng.uniform(-1, 1, (B, 128, 128, 1)).astype(np.float32)
    depth[depth > 0.4] = 1.0
    return {
        'rgb': rng.rand(B, 128, 128, 3).astype(np.float32),
        'depth': depth,
        'pcl': rng.uniform(-0.9, 0.9, (B, 1024, 3)).astype(np.float32),
        'uvd_gt': rng.uniform(-0.7, 0.7, (B, 21, 3)).astype(np.float32),
        'xyz_gt': rng.uniform(-0.7, 0.7, (B, 21, 3)).astype(np.float32),
        'cam_para': np.tile(np.array([[600., 600., 320., 240.]],
                                     np.float32), (B, 1)),
        'center': np.tile(np.array([[10., -10., 600.]], np.float32),
                          (B, 1)),
        'M': np.tile((np.eye(3) * [0.5, 0.5, 1.]).astype(np.float32)[None],
                     (B, 1, 1)),
        'cube': np.full((B, 3), 250., np.float32),
    }


def _torch_loss(net, batch, monkeypatch):
    """The reference loss assembly (train.py:211-261) on CPU."""
    import sys
    monkeypatch.setattr(torch.Tensor, 'cuda',
                        lambda self, *a, **k: self, raising=False)
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from util.generateFeature import GFM          # type: ignore
    from model.loss import SmoothL1Loss           # type: ignore
    from dataloader.loader import loader as RefLoader  # type: ignore

    svc = RefLoader('/tmp', 'test', 128, 'refine', 'dexycb')
    svc.flip = 1
    svc.img_size = 128
    gfm = GFM()
    l1 = SmoothL1Loss()

    rgb = torch.from_numpy(np.moveaxis(batch['rgb'], -1, 1).copy())
    img = torch.from_numpy(np.moveaxis(batch['depth'], -1, 1).copy())
    pcl = torch.from_numpy(batch['pcl'])
    uvd_gt = torch.from_numpy(batch['uvd_gt'])
    xyz_gt = torch.from_numpy(batch['xyz_gt'])
    center = torch.from_numpy(batch['center'])
    M = torch.from_numpy(batch['M'])
    cube = torch.from_numpy(batch['cube'])
    cam = torch.from_numpy(batch['cam_para'])

    results, spatial_weight, _ = net(rgb, img, pcl, svc, center, M, cube,
                                     cam, 0.8)
    stage_type = [1, 1, 2, 3, 2, 3]
    loss = 0
    for index, st in enumerate(stage_type):
        if st == 1:
            pixel_pd = results[index]
            fs = pixel_pd.size(-1)
            pixel_gt = gfm.joint2feature(uvd_gt, img, [0.8], fs,
                                         ['weight_offset'])
            joint_uvd = gfm.feature2joint(img, pixel_pd, ['weight_offset'],
                                          [0.8])
            loss = loss + l1(pixel_pd[:, :pixel_gt.size(1)], pixel_gt) * 1 \
                + l1(joint_uvd, uvd_gt) * 100
        else:
            loss = loss + l1(results[index], xyz_gt) * 100
    for index, sw in enumerate(spatial_weight):
        sigma = 3 if index == 0 else 2
        fs = results[0].size(-1)
        hm_gt = gfm.joint2heatmap(uvd_gt[:, :, :2], 0.8, fs, sigma=sigma)
        loss = loss + l1(sw, hm_gt / hm_gt.max()) * 10
    return loss


def test_gradient_parity(ref_net, batch_np, monkeypatch):
    import jax
    import jax.numpy as jnp
    from keypointfusion_tpu.config import Config
    from keypointfusion_tpu.geometry import CropFrame
    from keypointfusion_tpu.models.kpfusion import KPFusion
    from keypointfusion_tpu.training.losses import compute_losses
    from keypointfusion_tpu.utils.torch_convert import (
        convert_kpfusion_checkpoint)

    net = ref_net.eval()   # eval normalization; grads still flow
    net.zero_grad(set_to_none=True)
    loss_t = _torch_loss(net, batch_np, monkeypatch)
    loss_t.backward()
    grad_sd = {k: (p.grad if p.grad is not None else torch.zeros_like(p))
               for k, p in net.named_parameters()}
    # running stats are not gradients; feed zeros so the converter's
    # batch_stats tree is ignored below
    for k, v in net.state_dict().items():
        if k not in grad_sd:
            grad_sd[k] = v
    ref_grads = convert_kpfusion_checkpoint({'model': grad_sd},
                                            depth=18)['params']

    converted = convert_kpfusion_checkpoint(
        {'model': net.state_dict()}, depth=18)
    cfg = Config(batch_size=B)
    model = KPFusion(joint_num=21)
    frame = CropFrame.from_batch(batch_np['cam_para'], batch_np['center'],
                                 batch_np['M'], batch_np['cube'])
    jb = {k: jnp.asarray(v) for k, v in batch_np.items()}

    def loss_fn(params):
        results, sw = model.apply(
            {'params': params, 'batch_stats': converted['batch_stats']},
            jb['rgb'], jb['depth'], jb['pcl'], frame, 0.8, False)
        loss, _ = compute_losses(results, sw, jb['depth'], jb['uvd_gt'],
                                 jb['xyz_gt'], frame, cfg, 0)
        return loss

    loss_j, grads = jax.value_and_grad(loss_fn)(
        jax.tree_util.tree_map(jnp.asarray, converted['params']))

    # loss values agree
    np.testing.assert_allclose(float(loss_j), float(loss_t.item()),
                               rtol=2e-4)

    flat_ref = dict(jax.tree_util.tree_leaves_with_path(ref_grads))
    flat_got = dict(jax.tree_util.tree_leaves_with_path(grads))
    assert set(flat_ref) == set(flat_got)
    worst = 0.0
    for path, g_ref in flat_ref.items():
        g_ref = np.asarray(g_ref, np.float64)
        g_got = np.asarray(flat_got[path], np.float64)
        # relative to the tensor's gradient scale, with an absolute floor
        # of 2e-5 for near-zero gradients (float accumulation noise)
        dev = np.abs(g_got - g_ref).max()
        tol = max(5e-3 * np.abs(g_ref).max(), 2e-5)
        worst = max(worst, dev / tol)
        assert dev < tol, (jax.tree_util.keystr(path), dev, tol)
    print('worst grad deviation (fraction of tolerance):', worst)


def test_optimizer_semantics_vs_torch_adamw():
    """Identical gradients through torch AdamW+StepLR vs optax adamw + our
    staircase schedule for 4 steps spanning a decay boundary. Uses a
    'param tensor zoo' shaped like real cases (conv kernel, BN scale, BN
    bias, dense bias) to pin the decay scope on every param kind."""
    import jax.numpy as jnp
    import optax
    from keypointfusion_tpu.config import Config
    from keypointfusion_tpu.training.train_step import make_optimizer

    rng = np.random.RandomState(0)
    shapes = {'conv_kernel': (3, 3, 4, 8), 'bn_scale': (8,),
              'bn_bias': (8,), 'dense_bias': (16,)}
    params_np = {k: rng.randn(*s).astype(np.float32)
                 for k, s in shapes.items()}
    grads_np = [{k: rng.randn(*s).astype(np.float32)
                 for k, s in shapes.items()} for _ in range(4)]

    # torch side: StepLR decays at epoch boundaries; our schedule decays by
    # step//steps_per_epoch//step_size. Use steps_per_epoch=1 so each
    # optimizer step is one epoch; step_size=2 → decay after 2 steps.
    cfg = Config(lr=8e-4, opt='adamw', dataset='dexycb')
    t_params = {k: torch.nn.Parameter(torch.from_numpy(v.copy()))
                for k, v in params_np.items()}
    opt_t = torch.optim.AdamW(list(t_params.values()), lr=cfg.lr,
                              weight_decay=0.01)
    sched_t = torch.optim.lr_scheduler.StepLR(opt_t, step_size=2,
                                              gamma=0.1)

    class _C:
        lr = cfg.lr
        opt = 'adamw'
        scheduler = 'step'
        step_gamma = 0.1
        step_size = 2
    tx = make_optimizer(_C, steps_per_epoch=1)
    j_params = {k: jnp.asarray(v) for k, v in params_np.items()}
    opt_state = tx.init(j_params)

    for step, g in enumerate(grads_np):
        # torch
        for k, p in t_params.items():
            p.grad = torch.from_numpy(g[k].copy())
        opt_t.step()
        sched_t.step()
        # ours
        jg = {k: jnp.asarray(v) for k, v in g.items()}
        updates, opt_state = tx.update(jg, opt_state, j_params)
        j_params = optax.apply_updates(j_params, updates)

    for k in shapes:
        np.testing.assert_allclose(
            np.asarray(j_params[k]), t_params[k].detach().numpy(),
            atol=2e-6, err_msg=k)


def test_batchnorm_running_stat_update_parity(ref_net, batch_np,
                                              monkeypatch):
    """One train-mode forward through the depth backbone: torch BN running
    stats vs flax batch_stats after one update."""
    import jax
    import jax.numpy as jnp
    from keypointfusion_tpu.models.unet import ResNetUNet
    from keypointfusion_tpu.utils.torch_convert import convert_resnet_unet

    net = ref_net.backbone_d
    net.train()
    x = np.moveaxis(batch_np['depth'], -1, 1).copy()
    sd_before = {k: v.clone() for k, v in net.state_dict().items()}
    with torch.no_grad():
        net(torch.from_numpy(x))
    # clone: state_dict returns live references, and load_state_dict below
    # would overwrite them in place
    sd_after = {k: v.clone() for k, v in net.state_dict().items()}
    net.load_state_dict(sd_before)   # restore for other tests
    net.eval()

    params, stats = convert_resnet_unet(sd_before, 18)
    _, stats_after = convert_resnet_unet(sd_after, 18)

    unet = ResNetUNet(depth=18, joint_num=21, out_dims=(63, 21, 21))
    _, new_vars = unet.apply(
        {'params': params, 'batch_stats': stats},
        jnp.asarray(batch_np['depth']), True, mutable=['batch_stats'])

    flat_want = dict(jax.tree_util.tree_leaves_with_path(stats_after))
    flat_got = dict(jax.tree_util.tree_leaves_with_path(
        new_vars['batch_stats']))
    assert set(flat_want) == set(flat_got)
    for path, want in flat_want.items():
        got = np.asarray(flat_got[path])
        np.testing.assert_allclose(
            got, np.asarray(want), rtol=1e-3, atol=1e-4,
            err_msg=jax.tree_util.keystr(path))
