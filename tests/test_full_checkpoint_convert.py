"""Full-checkpoint conversion test: instantiate the REAL reference KPFusion
(CUDA deps stubbed), convert its random-init state_dict, and check
(a) the converted tree loads into our KPFusion (structure + shapes),
(b) the depth/RGB backbone sub-paths agree numerically in eval mode."""

import os
import sys
import types

import importlib.machinery

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def build_reference_kpfusion(net='KPFusion-resnet-18', pretrain='1k'):
    """Instantiate the real reference KPFusion on CPU with all absent/CUDA
    deps stubbed. Shared by the conversion and full-forward parity tests.
    For convnext nets pass pretrain='' (the URL load needs egress)."""
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference not mounted")
    # stubs for CUDA/absent deps (need real __spec__ for transformers'
    # importlib probing)
    def _mod(name):
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        return m

    if 'pointnet2_ops' not in sys.modules:
        m = _mod('pointnet2_ops')
        mu = _mod('pointnet2_ops.pointnet2_utils')

        class QueryAndGroup(torch.nn.Module):
            def __init__(self, *a, **k):
                super().__init__()
        mu.QueryAndGroup = QueryAndGroup
        m.pointnet2_utils = mu
        sys.modules['pointnet2_ops'] = m
        sys.modules['pointnet2_ops.pointnet2_utils'] = mu
    if 'torchvision' not in sys.modules:
        tv = _mod('torchvision')
        tvm = _mod('torchvision.models')
        tvt = _mod('torchvision.transforms')

        class _Empty:
            def state_dict(self):
                return {}
        for name in ('resnet18', 'resnet34', 'resnet50', 'resnet101'):
            setattr(tvm, name, lambda *a, **k: _Empty())
        tvt.ToTensor = object
        tv.models = tvm
        tv.transforms = tvt
        sys.modules['torchvision'] = tv
        sys.modules['torchvision.models'] = tvm
        sys.modules['torchvision.transforms'] = tvt
    if 'timm' not in sys.modules:
        tm = _mod('timm')
        tml = _mod('timm.models')
        tml.__path__ = []   # mark as package
        tmll = _mod('timm.models.layers')
        tmlr = _mod('timm.models.registry')
        tmll.DropPath = torch.nn.Identity
        tmll.trunc_normal_ = lambda t, **k: t
        tmlr.register_model = lambda f=None, *a, **k: (f if f else
                                                       (lambda g: g))
        tml.layers = tmll
        tml.registry = tmlr
        tm.models = tml
        sys.modules['timm'] = tm
        sys.modules['timm.models'] = tml
        sys.modules['timm.models.layers'] = tmll
        sys.modules['timm.models.registry'] = tmlr
    if 'pycocotools' not in sys.modules:
        pc = _mod('pycocotools')
        pcc = _mod('pycocotools.coco')
        pcc.COCO = object
        pc.coco = pcc
        sys.modules['pycocotools'] = pc
        sys.modules['pycocotools.coco'] = pcc
    import transformers.pytorch_utils as ptu
    if not hasattr(ptu, 'torch_int_div'):
        ptu.torch_int_div = lambda a, b: torch.div(a, b,
                                                   rounding_mode='floor')
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    cwd = os.getcwd()
    os.chdir("/root/reference")   # BertConfig.from_pretrained("./config/")
    try:
        torch.manual_seed(0)
        from model.model import KPFusion as RefKPFusion  # type: ignore
        net = RefKPFusion(net, pretrain, 21, 'dexycb', './MANO/').eval()
    except Exception as e:
        pytest.skip(f"reference KPFusion unimportable: {e}")
    finally:
        os.chdir(cwd)
    return net


@pytest.fixture(scope="module")
def ref_kpfusion():
    return build_reference_kpfusion()


def test_full_conversion_structure_and_backbone_parity(ref_kpfusion):
    import jax
    import jax.numpy as jnp
    from keypointfusion_tpu.models.kpfusion import KPFusion
    from keypointfusion_tpu.models.unet import ResNetUNet
    from keypointfusion_tpu.utils.torch_convert import (
        convert_kpfusion_checkpoint, strip_module_prefix,
    )
    from keypointfusion_tpu.geometry import CropFrame

    sd = ref_kpfusion.state_dict()
    converted = convert_kpfusion_checkpoint({'model': sd}, depth=18)

    # (a) structure: every converted param must exist in our init with the
    # same shape
    rng = np.random.RandomState(0)
    b = 2
    rgb = jnp.asarray(rng.rand(b, 128, 128, 3).astype(np.float32))
    depth = jnp.asarray(rng.uniform(-1, 1, (b, 128, 128, 1)).astype(
        np.float32))
    pcl = jnp.asarray(rng.uniform(-1, 1, (b, 128, 3)).astype(np.float32))
    cam = np.tile(np.array([[600., 600., 320., 240.]], np.float32), (b, 1))
    center = np.tile(np.array([[0., 0., 600.]], np.float32), (b, 1))
    M = np.tile(np.eye(3, dtype=np.float32)[None], (b, 1, 1))
    cube = np.full((b, 3), 250., np.float32)
    frame = CropFrame.from_batch(cam, center, M, cube)

    model = KPFusion(joint_num=21)
    init_vars = model.init(jax.random.PRNGKey(0), rgb, depth, pcl, frame)

    flat_conv = jax.tree_util.tree_leaves_with_path(converted['params'])
    flat_init = dict(jax.tree_util.tree_leaves_with_path(
        init_vars['params']))
    missing, mismatched = [], []
    for path, leaf in flat_conv:
        if path not in flat_init:
            missing.append(jax.tree_util.keystr(path))
        elif tuple(flat_init[path].shape) != tuple(np.shape(leaf)):
            mismatched.append((jax.tree_util.keystr(path),
                               np.shape(leaf), flat_init[path].shape))
    assert not missing, f"converted params missing in init: {missing[:10]}"
    assert not mismatched, f"shape mismatches: {mismatched[:10]}"
    # our init must be fully covered too
    conv_paths = {p for p, _ in flat_conv}
    uncovered = [jax.tree_util.keystr(p) for p in flat_init
                 if p not in conv_paths]
    assert not uncovered, f"init params not covered: {uncovered[:10]}"

    # (b) numerical parity of the depth backbone sub-path
    from keypointfusion_tpu.utils.torch_convert import convert_resnet_unet
    params_d, stats_d = convert_resnet_unet(sd, 18, 'backbone_d.')
    x = rng.uniform(-1, 1, (2, 1, 128, 128)).astype(np.float32)
    with torch.no_grad():
        want_res, want_feat = ref_kpfusion.backbone_d(torch.from_numpy(x))
    unet = ResNetUNet(depth=18, joint_num=21, out_dims=(63, 21, 21))
    got_res, got_feat = unet.apply(
        {'params': params_d, 'batch_stats': stats_d},
        jnp.asarray(np.moveaxis(x, 1, -1)))
    np.testing.assert_allclose(
        np.asarray(got_feat), np.moveaxis(want_feat.numpy(), 1, -1),
        rtol=1e-2, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(got_res), np.moveaxis(want_res.numpy(), 1, -1),
        rtol=1e-2, atol=1e-3)
