"""Config.pretrain → ImageNet converter wiring (VERDICT r2 item 5).

A fake torchvision-style resnet18 checkpoint on disk must warm-start both
backbone bodies at Trainer construction: the RGB stem conv1 takes the
pretrained 3-ch weights, the depth stem conv1 keeps its fresh 1-ch init
(reference model/resnetUnet.py:278-289 loads strict=False then replaces
the depth conv1), and an explicitly configured-but-empty pretrain_dir is
a hard error."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from keypointfusion_tpu.config import Config


def _fake_resnet18_sd():
    """torchvision-named random resnet18 state_dict via the reference's
    torchvision-copy ResNet (reference model/resnet.py:137,573)."""
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference not mounted")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from model.resnet import resnet18
    torch.manual_seed(0)
    return resnet18().state_dict()


@pytest.fixture(scope="module")
def fake_ckpt(tmp_path_factory):
    sd = _fake_resnet18_sd()
    path = tmp_path_factory.mktemp("hub") / "resnet18-fake.pth"
    torch.save(sd, str(path))
    return str(path), sd


def test_imagenet_backbone_variables(fake_ckpt):
    path, sd = fake_ckpt
    cfg = Config(pretrain='1k', pretrain_dir=path)
    from keypointfusion_tpu.utils.pretrain import \
        imagenet_backbone_variables
    tree = imagenet_backbone_variables(cfg)
    conv1 = np.asarray(
        tree['params']['backbone_rgb']['backbone']['conv1']['kernel'])
    # torch OIHW [64,3,7,7] -> flax HWIO [7,7,3,64]
    assert conv1.shape == (7, 7, 3, 64)
    np.testing.assert_allclose(
        conv1, np.transpose(sd['conv1.weight'].numpy(), (2, 3, 1, 0)))
    bn1 = tree['batch_stats']['backbone_d']['backbone']['bn1']
    np.testing.assert_allclose(np.asarray(bn1['mean']),
                               sd['bn1.running_mean'].numpy())


def test_trainer_warm_starts_backbones(fake_ckpt, tmp_path):
    path, sd = fake_ckpt
    import jax
    from keypointfusion_tpu.training.trainer import Trainer
    from keypointfusion_tpu.data.synthetic import synthetic_batch

    class _Data:
        def __init__(self, n=4, point_num=64):
            self.samples = [
                {k: v[0] for k, v in synthetic_batch(
                    batch_size=1, point_num=point_num, seed=i).items()}
                for i in range(n)]

        def __len__(self):
            return len(self.samples)

        def __getitem__(self, i):
            return self.samples[i]

    cfg = Config(pretrain='1k', pretrain_dir=path, batch_size=2,
                 point_num=64, phase='train')
    data = _Data(4, point_num=64)
    tr = Trainer(cfg, train_data=data, test_data=data,
                 model_dir=str(tmp_path / 'run'), use_mesh=False)
    params = jax.device_get(tr.state.params)
    want = np.transpose(sd['conv1.weight'].numpy(), (2, 3, 1, 0))
    # RGB conv1 merged from the checkpoint
    np.testing.assert_allclose(
        np.asarray(params['backbone_rgb']['backbone']['conv1']['kernel']),
        want, rtol=1e-6)
    # depth conv1 [7,7,1,64] shape-mismatches and keeps random init
    dconv = np.asarray(
        params['backbone_d']['backbone']['conv1']['kernel'])
    assert dconv.shape == (7, 7, 1, 64)
    assert not np.allclose(dconv, want[:, :, :1, :])
    # a deeper layer merged into BOTH backbones
    want_l1 = np.transpose(sd['layer1.0.conv1.weight'].numpy(),
                           (2, 3, 1, 0))
    for bb in ('backbone_d', 'backbone_rgb'):
        np.testing.assert_allclose(
            np.asarray(
                params[bb]['backbone']['layer1_0']['conv1']['kernel']),
            want_l1, rtol=1e-6)


def test_configured_but_missing_is_an_error(tmp_path):
    cfg = Config(pretrain='1k', pretrain_dir=str(tmp_path / 'nowhere'))
    from keypointfusion_tpu.utils.pretrain import find_imagenet_checkpoint
    with pytest.raises(FileNotFoundError):
        find_imagenet_checkpoint(cfg)


def test_provenance_snapshot(tmp_path):
    from keypointfusion_tpu.utils.provenance import snapshot_sources
    dest = str(tmp_path / 'files')
    snapshot_sources(dest)
    assert os.path.isfile(os.path.join(
        dest, 'keypointfusion_tpu', 'training', 'trainer.py'))
    assert os.path.isfile(os.path.join(dest, 'MANIFEST.json'))
