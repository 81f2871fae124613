"""ConvNeXt checkpoint conversion: instantiate the REAL reference
KPFusion-convnext-tiny (CUDA deps stubbed, pretrain='' so no URL fetch),
convert its random-init state_dict, and check
(a) the converted tree loads into our convnext KPFusion (structure+shapes),
(b) the depth/RGB convNeXTUnet sub-paths agree numerically in eval mode,
(c) the ImageNet-release converter shape-merges over a fresh init
    (stem excluded, matching convNeXT/resnetUnet.py:105-109).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_full_checkpoint_convert import build_reference_kpfusion

NET = 'KPFusion-convnext-tiny'


@pytest.fixture(scope="module")
def ref_convnext_kpfusion():
    return build_reference_kpfusion(net=NET, pretrain='')


def _fake_frame(b):
    from keypointfusion_tpu.geometry import CropFrame
    cam = np.tile(np.array([[600., 600., 320., 240.]], np.float32), (b, 1))
    center = np.tile(np.array([[0., 0., 600.]], np.float32), (b, 1))
    M = np.tile(np.eye(3, dtype=np.float32)[None], (b, 1, 1))
    cube = np.full((b, 3), 250., np.float32)
    return CropFrame.from_batch(cam, center, M, cube)


def test_convnext_full_conversion_structure(ref_convnext_kpfusion):
    import jax
    import jax.numpy as jnp
    from keypointfusion_tpu.models.kpfusion import KPFusion
    from keypointfusion_tpu.utils.torch_convert import (
        convert_kpfusion_checkpoint,
    )

    sd = ref_convnext_kpfusion.state_dict()
    converted = convert_kpfusion_checkpoint({'model': sd}, net=NET)

    rng = np.random.RandomState(0)
    b = 2
    rgb = jnp.asarray(rng.rand(b, 128, 128, 3).astype(np.float32))
    depth = jnp.asarray(rng.uniform(-1, 1, (b, 128, 128, 1)).astype(
        np.float32))
    pcl = jnp.asarray(rng.uniform(-1, 1, (b, 128, 3)).astype(np.float32))
    frame = _fake_frame(b)

    model = KPFusion(net=NET, joint_num=21)
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
    conv_paths = {p for p, _ in flat_conv}
    uncovered = [jax.tree_util.keystr(p) for p in flat_init
                 if p not in conv_paths]
    assert not uncovered, f"init params not covered: {uncovered[:10]}"

    # batch_stats coverage (decoder Residual BNs)
    flat_conv_s = dict(jax.tree_util.tree_leaves_with_path(
        converted['batch_stats']))
    flat_init_s = dict(jax.tree_util.tree_leaves_with_path(
        init_vars['batch_stats']))
    assert set(flat_conv_s) == set(flat_init_s)


@pytest.mark.parametrize("which", ["backbone_d", "backbone_rgb"])
def test_convnext_unet_numeric_parity(ref_convnext_kpfusion, which):
    import jax.numpy as jnp
    from keypointfusion_tpu.models.convnext import ConvNeXtUNet
    from keypointfusion_tpu.utils.torch_convert import convert_convnext_unet

    sd = ref_convnext_kpfusion.state_dict()
    params, stats = convert_convnext_unet(sd, 'tiny', f'{which}.')

    rng = np.random.RandomState(1)
    ch = 1 if which == 'backbone_d' else 3
    x = rng.uniform(-1, 1, (2, ch, 128, 128)).astype(np.float32)
    ref_net = getattr(ref_convnext_kpfusion, which)
    with torch.no_grad():
        want_res, want_feat = ref_net(torch.from_numpy(x))

    unet = ConvNeXtUNet(size='tiny', joint_num=21, out_dims=(63, 21, 21))
    got_res, got_feat = unet.apply(
        {'params': params, 'batch_stats': stats},
        jnp.asarray(np.moveaxis(x, 1, -1)))
    np.testing.assert_allclose(
        np.asarray(got_feat), np.moveaxis(want_feat.numpy(), 1, -1),
        rtol=1e-2, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(got_res), np.moveaxis(want_res.numpy(), 1, -1),
        rtol=1e-2, atol=1e-3)


def test_convnext_imagenet_release_merge(ref_convnext_kpfusion):
    """The ImageNet-release converter (stem excluded) must merge cleanly
    over a freshly initialized backbone params tree."""
    import jax
    import jax.numpy as jnp
    from keypointfusion_tpu.models.convnext import ConvNeXt, MODEL_LIST
    from keypointfusion_tpu.utils.torch_convert import (
        convert_convnext_imagenet,
    )

    # Use the reference backbone's state_dict re-keyed like a release file
    # ({'model': sd} with the classifier norm/head present).
    ref_backbone = ref_convnext_kpfusion.backbone_d.backbone
    release = {'model': ref_backbone.state_dict()}
    converted = convert_convnext_imagenet(release, 'tiny')
    assert 'stem_conv' not in converted and 'stem_norm' not in converted

    depths, dims = MODEL_LIST['tiny']
    enc = ConvNeXt(depths=depths, dims=dims)
    x = jnp.zeros((1, 128, 128, 1), jnp.float32)
    init = enc.init(jax.random.PRNGKey(0), x)['params']
    merged = dict(init)
    for k, v in converted.items():
        assert k in init, k
        merged[k] = v
    # every non-stem init key must be covered and shapes must line up
    flat_conv = dict(jax.tree_util.tree_leaves_with_path(converted))
    flat_init = dict(jax.tree_util.tree_leaves_with_path(init))
    for path, leaf in flat_conv.items():
        assert tuple(flat_init[path].shape) == tuple(np.shape(leaf)), path
    nonstem = {jax.tree_util.keystr(p) for p in flat_init
               if 'stem' not in jax.tree_util.keystr(p)}
    covered = {jax.tree_util.keystr(p) for p in flat_conv}
    assert nonstem == covered
    enc.apply({'params': merged}, x)
