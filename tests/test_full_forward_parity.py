"""THE parity test: full KPFusion forward, reference torch vs this
framework with converted weights, end to end.

The reference's CUDA-only pieces are replaced in-test so it runs on CPU:
  * pointnet2 QueryAndGroup → a pure-torch ball query with the CUDA
    semantics (first-S in-radius in storage order, duplicate padding) but a
    closest-point fallback for EMPTY balls, matching this framework's
    documented divergence (ops/ball_query.py) so the comparison isolates
    everything else;
  * torch.Tensor.cuda → identity (the reference hardcodes .cuda() inside
    forward, model/model.py:50, transfusion_head.py:690).
The reference `loader` base class acts as its own coordinate service, as in
real use (train.py:209)."""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


class TorchQueryAndGroup(torch.nn.Module):
    """CUDA QueryAndGroup semantics in pure torch (+closest-point
    fallback for empty balls — see module docstring)."""

    def __init__(self, radius, nsample, use_xyz=True):
        super().__init__()
        self.radius, self.nsample, self.use_xyz = radius, nsample, use_xyz

    def forward(self, xyz, new_xyz, features):
        # xyz [B,N,3], new_xyz [B,J,3], features [B,C,N]
        b, n, _ = xyz.shape
        j = new_xyz.shape[1]
        d2 = torch.cdist(new_xyz, xyz) ** 2                  # [B,J,N]
        in_ball = d2 < self.radius ** 2
        ar = torch.arange(n).view(1, 1, n).expand(b, j, n)
        key = torch.where(in_ball, ar, n + ar)
        order = torch.argsort(key, dim=-1)[:, :, :self.nsample]  # first-S
        valid = torch.gather(in_ball, -1, order)
        # duplicate-pad with the first slot
        first = order[:, :, :1].expand_as(order)
        idx = torch.where(valid, order, first)
        # closest-point fallback when the ball is empty
        none_valid = ~valid.any(-1, keepdim=True)
        closest = d2.argmin(-1, keepdim=True).expand_as(idx)
        idx = torch.where(none_valid, closest, idx)

        grouped_xyz = torch.gather(
            xyz.unsqueeze(1).expand(b, j, n, 3), 2,
            idx.unsqueeze(-1).expand(b, j, self.nsample, 3))
        grouped_xyz = (grouped_xyz - new_xyz.unsqueeze(2)).permute(
            0, 3, 1, 2)                                      # [B,3,J,S]
        c = features.shape[1]
        grouped_feat = torch.gather(
            features.unsqueeze(2).expand(b, c, j, n), 3,
            idx.unsqueeze(1).expand(b, c, j, self.nsample))  # [B,C,J,S]
        return torch.cat([grouped_xyz, grouped_feat], dim=1)


def _build_reference(monkey):
    """Instantiate the reference KPFusion with all stubs (shared with
    test_full_checkpoint_convert) and swap in the pure-torch ball query."""
    from tests.test_full_checkpoint_convert import build_reference_kpfusion
    net = build_reference_kpfusion()
    for block in (net.block1, net.block2):
        for i, g in enumerate(block.FA.groupers):
            block.FA.groupers[i] = TorchQueryAndGroup(
                block.FA.radius[i], block.FA.S[i])
    return net


def test_full_forward_parity(monkeypatch):
    import jax
    import jax.numpy as jnp
    from keypointfusion_tpu.models.kpfusion import KPFusion
    from keypointfusion_tpu.utils.torch_convert import (
        convert_kpfusion_checkpoint)
    from keypointfusion_tpu.geometry import CropFrame

    net = _build_reference(monkeypatch)
    net = net.eval()

    # .cuda() no-ops (reference hardcodes it inside forward)
    monkeypatch.setattr(torch.Tensor, 'cuda',
                        lambda self, *a, **k: self, raising=False)

    # reference loader service
    sys.path.insert(0, "/root/reference")
    from dataloader.loader import loader as RefLoader  # type: ignore
    svc = RefLoader('/tmp', 'test', 128, 'refine', 'dexycb')
    svc.flip = 1
    svc.img_size = 128

    rng = np.random.RandomState(0)
    b = 2
    rgb = rng.rand(b, 128, 128, 3).astype(np.float32)
    depth = rng.uniform(-1, 1, (b, 128, 128, 1)).astype(np.float32)
    depth[depth > 0.4] = 1.0
    pcl = rng.uniform(-0.9, 0.9, (b, 1024, 3)).astype(np.float32)
    cam = np.tile(np.array([[600., 600., 320., 240.]], np.float32), (b, 1))
    center = np.tile(np.array([[10., -10., 600.]], np.float32), (b, 1))
    M = np.tile(np.eye(3, dtype=np.float32)[None], (b, 1, 1))
    M[:, 0, 0] = M[:, 1, 1] = 0.5
    M[:, 0, 2] = M[:, 1, 2] = -60.0
    cube = np.full((b, 3), 250., np.float32)

    with torch.no_grad():
        ref_results, ref_sw, _ = net(
            torch.from_numpy(np.moveaxis(rgb, -1, 1).copy()),
            torch.from_numpy(np.moveaxis(depth, -1, 1).copy()),
            torch.from_numpy(pcl), svc,
            torch.from_numpy(center), torch.from_numpy(M),
            torch.from_numpy(cube), torch.from_numpy(cam), 0.8)

    converted = convert_kpfusion_checkpoint({'model': net.state_dict()},
                                            depth=18)
    frame = CropFrame.from_batch(cam, center, M, cube)
    model = KPFusion(joint_num=21)
    results, sw = jax.jit(
        lambda v, a, d, p, f: model.apply(v, a, d, p, f))(
        {'params': converted['params'],
         'batch_stats': converted['batch_stats']},
        jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(pcl), frame)

    # measured max abs deviation across all outputs is ~5e-5 (float
    # accumulation order only) — assert with a 10x margin
    for i in range(6):
        want = ref_results[i].numpy()
        if want.ndim == 4:
            want = np.moveaxis(want, 1, -1)
        np.testing.assert_allclose(
            np.asarray(results[i]), want, rtol=0, atol=5e-4,
            err_msg=f'result_{i}')
    for k in (0, 1):
        want = np.moveaxis(ref_sw[k].numpy(), 1, -1)
        np.testing.assert_allclose(np.asarray(sw[k]), want, rtol=0,
                                   atol=5e-4, err_msg=f'spatial_weight_{k}')
