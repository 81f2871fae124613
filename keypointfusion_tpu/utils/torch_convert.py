"""Torch→Flax checkpoint conversion.

Converts (a) torchvision-convention ResNet ImageNet weights, (b) ConvNeXt
release checkpoints, and (c) full released KPFusion checkpoints (reference
naming, incl. the DataParallel 'module.' prefix) into this framework's
parameter pytrees. Needed to reproduce the reference's pretrained-backbone
training setup (reference model/resnetUnet.py:278-289,
convNeXT/resnetUnet.py:97-109) and its published DexYCB accuracy with the
released checkpoint (README.md:33-41).

Conventions:
  torch Conv2d [O,I,kh,kw]      → flax Conv kernel [kh,kw,I,O]
  torch Conv1d [O,I,1]          → flax Dense [I,O]
  torch Linear [O,I]            → flax Dense [I,O]
  torch BatchNorm weight/bias   → params scale/bias
        running_mean/var        → batch_stats mean/var
  torch MultiheadAttention in_proj [3C,C] → flax MHA q/k/v kernels
        [C, heads, C//heads]
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _np(t):
    if hasattr(t, 'detach'):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def strip_module_prefix(sd: Dict) -> Dict:
    return {(k[7:] if k.startswith('module.') else k): v
            for k, v in sd.items()}


def conv2d(sd, name):
    return np.transpose(_np(sd[f'{name}.weight']), (2, 3, 1, 0))


def dense(sd, name):
    return {'kernel': _np(sd[f'{name}.weight']).T,
            'bias': _np(sd[f'{name}.bias'])}


def dense_nobias(sd, name):
    return {'kernel': _np(sd[f'{name}.weight']).T}


def conv1d_as_dense(sd, name):
    w = _np(sd[f'{name}.weight'])[:, :, 0]          # [O, I]
    out = {'kernel': w.T}
    if f'{name}.bias' in sd:
        out['bias'] = _np(sd[f'{name}.bias'])
    return out


def bn(sd, name) -> Tuple[Dict, Dict]:
    params = {'scale': _np(sd[f'{name}.weight']),
              'bias': _np(sd[f'{name}.bias'])}
    stats = {'mean': _np(sd[f'{name}.running_mean']),
             'var': _np(sd[f'{name}.running_var'])}
    return params, stats


def layernorm(sd, name):
    return {'scale': _np(sd[f'{name}.weight']),
            'bias': _np(sd[f'{name}.bias'])}


def embed(sd, name):
    return {'embedding': _np(sd[f'{name}.weight'])}


# ------------------------------------------------------------- resnet ----

RESNET_SIZES = {18: (2, 2, 2, 2), 50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


def convert_resnet(sd, depth: int, prefix: str = ''
                   ) -> Tuple[Dict, Dict]:
    """torchvision/reference ResNet state_dict → (params, batch_stats) for
    models.resnet.ResNet. Missing keys (e.g. fc head) are ignored."""
    p = lambda n: prefix + n
    bottleneck = depth >= 50
    params: Dict = {}
    stats: Dict = {}

    params['conv1'] = {'kernel': conv2d(sd, p('conv1'))}
    params['bn1'], stats['bn1'] = bn(sd, p('bn1'))

    for stage, nblocks in enumerate(RESNET_SIZES[depth]):
        for i in range(nblocks):
            tname = p(f'layer{stage + 1}.{i}')
            fname = f'layer{stage + 1}_{i}'
            bp: Dict = {}
            bs: Dict = {}
            nconv = 3 if bottleneck else 2
            for c in range(1, nconv + 1):
                bp[f'conv{c}'] = {'kernel': conv2d(sd, f'{tname}.conv{c}')}
                bp[f'bn{c}'], bs[f'bn{c}'] = bn(sd, f'{tname}.bn{c}')
            if f'{tname}.downsample.0.weight' in sd:
                bp['downsample_conv'] = {
                    'kernel': conv2d(sd, f'{tname}.downsample.0')}
                bp['downsample_bn'], bs['downsample_bn'] = bn(
                    sd, f'{tname}.downsample.1')
            params[fname] = bp
            stats[fname] = bs
    return params, stats


# ----------------------------------------------------------- residual ----

def convert_residual(sd, prefix: str) -> Tuple[Dict, Dict]:
    """reference hourglass Residual (Conv wrapper adds '.conv')."""
    params: Dict = {}
    stats: Dict = {}
    for c in (1, 2, 3):
        params[f'bn{c}'], stats[f'bn{c}'] = bn(sd, f'{prefix}.bn{c}')
        params[f'conv{c}'] = {
            'kernel': conv2d(sd, f'{prefix}.conv{c}.conv'),
            'bias': _np(sd[f'{prefix}.conv{c}.conv.bias'])}
    # the torch module always creates skip_layer; we only keep it when used
    return params, stats


def convert_residual_with_skip(sd, prefix: str, need_skip: bool
                               ) -> Tuple[Dict, Dict]:
    params, stats = convert_residual(sd, prefix)
    if need_skip:
        params['skip'] = {
            'kernel': conv2d(sd, f'{prefix}.skip_layer.conv'),
            'bias': _np(sd[f'{prefix}.skip_layer.conv.bias'])}
    return params, stats


# --------------------------------------------------------- resnet-unet ----

def convert_resnet_unet(sd, depth: int, prefix: str = ''
                        ) -> Tuple[Dict, Dict]:
    """OfficialResNetUnet / _RGB2offset_3D (resnetUnet.py:249-414) →
    models.unet.ResNetUNet variables."""
    p = lambda n: prefix + n
    exp = 1 if depth < 50 else 4
    params: Dict = {}
    stats: Dict = {}
    params['backbone'], stats['backbone'] = convert_resnet(
        sd, depth, p('backbone.'))

    # (flax_name, torch_name, in_dim, out_dim)
    residuals = [
        ('up4', p('up4.0'), 512 * exp, 512),
        ('skip_layer4', p('skip_layer4'), 256 * exp, 256),
        ('fusion_layer4', p('fusion_layer4'), 768, 256),
        ('up3', p('up3.0'), 256, 256),
        ('skip_layer3', p('skip_layer3'), 128 * exp, 128),
        ('fusion_layer3', p('fusion_layer3'), 384, 128),
        ('up2', p('up2.0'), 128, 128),
        ('skip_layer2', p('skip_layer2'), 64 * exp, 64),
        ('fusion_layer2', p('fusion_layer2'), 192, 128),
    ]
    for fname, tname, ind, outd in residuals:
        params[fname], stats[fname] = convert_residual_with_skip(
            sd, tname, need_skip=(ind != outd))
    for i in range(3):
        params[f'final_{i}'] = {
            'kernel': conv2d(sd, p(f'finals.{i}')),
            'bias': _np(sd[p(f'finals.{i}.bias')])}
    return params, stats


# ------------------------------------------------------------ convnext ----

def conv2d_with_bias(sd, name):
    out = {'kernel': conv2d(sd, name)}
    if f'{name}.bias' in sd:
        out['bias'] = _np(sd[f'{name}.bias'])
    return out


def convert_convnext(sd, depths, prefix: str = '',
                     include_stem: bool = True) -> Dict:
    """ConvNeXt encoder state_dict → models.convnext.ConvNeXt params
    (LayerNorm only, no batch stats). Reference convNeXT/convnext.py:55-186.
    The classifier `norm`/`head` keys are ignored — the UNet only uses
    forward_features (convNeXT/convnext.py:111-117). torch depthwise Conv2d
    weights [dim,1,7,7] transpose straight into flax grouped-conv kernels
    [7,7,1,dim]."""
    p = lambda n: prefix + n
    params: Dict = {}
    if include_stem:
        params['stem_conv'] = conv2d_with_bias(sd,
                                               p('downsample_layers.0.0'))
        params['stem_norm'] = layernorm(sd, p('downsample_layers.0.1'))
    for i in range(1, 4):
        params[f'down_norm{i}'] = layernorm(
            sd, p(f'downsample_layers.{i}.0'))
        params[f'down_conv{i}'] = conv2d_with_bias(
            sd, p(f'downsample_layers.{i}.1'))
    for i, nblocks in enumerate(depths):
        for j in range(nblocks):
            tp = p(f'stages.{i}.{j}')
            params[f'stage{i}_block{j}'] = {
                'dwconv': conv2d_with_bias(sd, f'{tp}.dwconv'),
                'norm': layernorm(sd, f'{tp}.norm'),
                'pwconv1': dense(sd, f'{tp}.pwconv1'),
                'pwconv2': dense(sd, f'{tp}.pwconv2'),
                'gamma': _np(sd[f'{tp}.gamma']),
            }
    return params


def convert_convnext_imagenet(checkpoint: Dict, size: str) -> Dict:
    """Released ImageNet ConvNeXt checkpoint {'model': sd}
    (convNeXT/resnetUnet.py:46-58 URLs) → backbone params WITHOUT the stem:
    the reference loads the 3-ch ImageNet weights and then immediately
    REPLACES downsample_layers[0] with a fresh randomly-initialized conv+LN
    matched to the input channel count (convNeXT/resnetUnet.py:105-109), so
    pretrained stem weights never survive. Merge the returned tree over a
    freshly initialized ConvNeXtUNet params['backbone']."""
    from keypointfusion_tpu.models.convnext import MODEL_LIST, resolve_size
    depths, _ = MODEL_LIST[resolve_size(size)]
    sd = strip_module_prefix(checkpoint.get('model', checkpoint))
    return convert_convnext(sd, depths, include_stem=False)


def convert_convnext_unet(sd, size: str, prefix: str = '',
                          deconv_dim: int = 128) -> Tuple[Dict, Dict]:
    """convNeXTUnet / convNeXTUnet_RGB2offset_3D
    (convNeXT/resnetUnet.py:60-248) → models.convnext.ConvNeXtUNet
    variables. `feat_emb` is dead in the reference forward (result_emb is
    applied to both outputs, convNeXT/resnetUnet.py:145-152), so its
    weights are intentionally dropped."""
    from keypointfusion_tpu.models.convnext import MODEL_LIST, resolve_size
    depths, dims = MODEL_LIST[resolve_size(size)]
    p = lambda n: prefix + n
    params: Dict = {'backbone': convert_convnext(sd, depths,
                                                 p('backbone.'))}
    stats: Dict = {}   # the ConvNeXt encoder is LN-only; BN lives in the
    # decoder Residuals
    residuals = [
        ('up4', p('up4.0'), dims[3], dims[3]),
        ('skip_layer4', p('skip_layer4'), dims[2], dims[2]),
        ('fusion_layer4', p('fusion_layer4'), dims[2] + dims[3], dims[2]),
        ('up3', p('up3.0'), dims[2], dims[2]),
        ('skip_layer3', p('skip_layer3'), dims[1], dims[1]),
        ('fusion_layer3', p('fusion_layer3'), dims[2] + dims[1], dims[1]),
        ('up2', p('up2.0'), dims[1], dims[1]),
        ('skip_layer2', p('skip_layer2'), dims[0], dims[0]),
        ('fusion_layer2', p('fusion_layer2'), dims[1] + dims[0],
         deconv_dim),
        ('result_emb', p('result_emb'), deconv_dim, deconv_dim),
    ]
    for fname, tname, ind, outd in residuals:
        params[fname], stats[fname] = convert_residual_with_skip(
            sd, tname, need_skip=(ind != outd))
    for i in range(3):
        params[f'final_{i}'] = {
            'kernel': conv2d(sd, p(f'finals.{i}')),
            'bias': _np(sd[p(f'finals.{i}.bias')])}
    return params, stats


# --------------------------------------------------------------- bert ----

def convert_mha_bert(sd, prefix: str, heads: int) -> Dict:
    """BERT attention (separate q/k/v Linears + output dense) → flax MHA."""
    def qkv(name):
        d = dense(sd, f'{prefix}.self.{name}')
        c = d['kernel'].shape[0]
        return {'kernel': d['kernel'].reshape(c, heads, c // heads),
                'bias': d['bias'].reshape(heads, c // heads)}
    out = dense(sd, f'{prefix}.output.dense')
    c = out['kernel'].shape[1]
    return {
        'query': qkv('query'), 'key': qkv('key'), 'value': qkv('value'),
        'out': {'kernel': out['kernel'].reshape(heads, c // heads, c),
                'bias': out['bias']},
    }


def convert_keypoint_encoder(sd, prefix: str, layers: int = 4,
                             heads: int = 4) -> Dict:
    """TR_Encoder (model/model.py:30-103) → models.transformer
    KeypointEncoder params. Skips the unused BertEmbeddings/Pooler."""
    params: Dict = {
        'position_embeddings': embed(sd, f'{prefix}.position_embeddings'),
        'img_embedding': dense(sd, f'{prefix}.img_embedding'),
    }
    for i in range(layers):
        lp = f'{prefix}.encoder.layer.{i}'
        params[f'layer_{i}'] = {
            'attn': convert_mha_bert(sd, f'{lp}.attention', heads),
            'ln_attn': layernorm(sd, f'{lp}.attention.output.LayerNorm'),
            'ffn_in': dense(sd, f'{lp}.intermediate.dense'),
            'ffn_out': dense(sd, f'{lp}.output.dense'),
            'ln_ffn': layernorm(sd, f'{lp}.output.LayerNorm'),
        }
    return params


def convert_kp_interaction(sd, prefix: str) -> Dict:
    return {
        'bert': convert_keypoint_encoder(sd, f'{prefix}.bert'),
        'cls_head': dense(sd, f'{prefix}.cls_head'),
        'residual': dense(sd, f'{prefix}.residual'),
    }


def convert_mha_torch(sd, prefix: str, heads: int) -> Dict:
    """torch.nn.MultiheadAttention (packed in_proj) → flax MHA."""
    w = _np(sd[f'{prefix}.in_proj_weight'])          # [3C, C]
    b = _np(sd[f'{prefix}.in_proj_bias'])
    c = w.shape[1]
    out: Dict = {}
    for i, name in enumerate(('query', 'key', 'value')):
        wi = w[i * c:(i + 1) * c].T                  # [C(in), C(out)]
        bi = b[i * c:(i + 1) * c]
        out[name] = {'kernel': wi.reshape(c, heads, c // heads),
                     'bias': bi.reshape(heads, c // heads)}
    od = dense(sd, f'{prefix}.out_proj')
    out['out'] = {'kernel': od['kernel'].reshape(heads, c // heads, c),
                  'bias': od['bias']}
    return out


def convert_cross_decoder(sd, prefix: str, layers: int = 4,
                          heads: int = 4) -> Dict:
    """updatedDecoder (transfusion_head.py:635-708) → CrossDecoder params.
    (norm1 exists in torch but is unused under cross_only.)"""
    params: Dict = {}
    for i in range(layers):
        lp = f'{prefix}.decoder.{i}'
        params[f'layer_{i}'] = {
            'self_posembed': embed(sd, f'{lp}.self_posembed'),
            'cross_posembed': embed(sd, f'{lp}.cross_posembed'),
            'cross_attn': convert_mha_torch(sd, f'{lp}.multihead_attn',
                                            heads),
            'norm2': layernorm(sd, f'{lp}.norm2'),
            'norm3': layernorm(sd, f'{lp}.norm3'),
            'linear1': dense(sd, f'{lp}.linear1'),
            'linear2': dense(sd, f'{lp}.linear2'),
        }
    return params


# --------------------------------------------------------------- desa ----

def convert_desa(sd, prefix: str, scales: int = 3, mlp=(128, 128)
                 ) -> Tuple[Dict, Dict]:
    params: Dict = {}
    stats: Dict = {}
    for i in range(scales):
        params[f'conv_l0_{i}'] = conv2d_as_dense(sd,
                                                 f'{prefix}.conv_l0_blocks.{i}')
        params[f'bn_l0_{i}'], stats[f'bn_l0_{i}'] = bn(
            sd, f'{prefix}.bn_l0_blocks.{i}')
        params[f'conv_f0_{i}'] = conv2d_as_dense(sd,
                                                 f'{prefix}.conv_f0_blocks.{i}')
        params[f'bn_f0_{i}'], stats[f'bn_f0_{i}'] = bn(
            sd, f'{prefix}.bn_f0_blocks.{i}')
        for k in range(len(mlp) - 1):
            params[f'conv_{i}_{k}'] = conv2d_as_dense(
                sd, f'{prefix}.conv_blocks.{i}.{k}')
            params[f'bn_{i}_{k}'], stats[f'bn_{i}_{k}'] = bn(
                sd, f'{prefix}.bn_blocks.{i}.{k}')
    params['fusion'] = conv1d_as_dense(sd, f'{prefix}.fusion.0')
    params['fusion_bn'], stats['fusion_bn'] = bn(sd, f'{prefix}.fusion.1')
    return params, stats


def conv2d_as_dense(sd, name):
    """1x1 Conv2d → Dense (used by DESA's per-group MLPs)."""
    w = _np(sd[f'{name}.weight'])[:, :, 0, 0]        # [O, I]
    out = {'kernel': w.T}
    if f'{name}.bias' in sd and sd[f'{name}.bias'] is not None:
        out['bias'] = _np(sd[f'{name}.bias'])
    return out


# ------------------------------------------------------- fusion block ----

def convert_fusion_block(sd, prefix: str) -> Tuple[Dict, Dict]:
    params: Dict = {}
    stats: Dict = {}
    for emb_f, emb_t in (('pcl_feat_emb', 'pcl_feat_emb'),
                         ('pcl_xyz_emb', 'pcl_xyz_emb'),
                         ('pcl_pose_emb', 'pcl_pose_emb'),
                         ('pcl_feat_emb_rgb', 'pcl_feat_emb_RGB'),
                         ('joint_feat_emb', 'joint_feat_emb'),
                         ('joint_xyz_emb', 'joint_xyz_emb')):
        d = conv1d_as_dense(sd, f'{prefix}.{emb_t}.0')
        bnp, bns = bn(sd, f'{prefix}.{emb_t}.1')
        params[emb_f] = {'dense': d, 'bn': bnp}
        stats[emb_f] = {'bn': bns}
    fa_p, fa_s = convert_desa(sd, f'{prefix}.FA')
    params['FA'] = fa_p
    stats['FA'] = fa_s
    params['init_TR'] = convert_kp_interaction(sd, f'{prefix}.init_TR')
    params['final_TR'] = convert_kp_interaction(sd, f'{prefix}.final_TR')
    params['crossTR'] = convert_cross_decoder(sd, f'{prefix}.crossTR')
    params['atten_spatial'] = {
        'kernel': conv2d(sd, f'{prefix}.atten_spatial'),
        'bias': _np(sd[f'{prefix}.atten_spatial.bias'])}
    params['fc_spatial2joint_w'] = _np(
        sd[f'{prefix}.fc_spatial2joint_feature.weight']).T   # [1024,1]
    params['fc_spatial2joint_b'] = _np(
        sd[f'{prefix}.fc_spatial2joint_feature.bias'])
    params['weight_dis'] = _np(sd[f'{prefix}.weight_dis'])
    return params, stats


def merge_partial(init: Dict, loaded: Dict) -> Tuple[Dict, list, list]:
    """Filtered state merge: take every leaf of `loaded` whose path exists
    in `init` with a matching shape; keep `init`'s leaf otherwise. This is
    the reference's warm-start/fine-tune semantics (train.py:100-117:
    `{k: v for k, v in checkpoint.items() if k in model_dict}`), extended
    with a shape gate so e.g. a 21-joint checkpoint warm-starts a 14-joint
    NYU model. Returns (merged, used_paths, skipped_paths)."""
    import jax

    flat_loaded = dict(jax.tree_util.tree_leaves_with_path(loaded))
    used, skipped = [], []

    def merge_leaf(path, leaf):
        cand = flat_loaded.get(path)
        if cand is not None and tuple(np.shape(cand)) == tuple(
                np.shape(leaf)):
            used.append(jax.tree_util.keystr(path))
            return cand
        if cand is not None:
            skipped.append(jax.tree_util.keystr(path))
        return leaf

    merged = jax.tree_util.tree_map_with_path(merge_leaf, init)
    return merged, used, skipped


# ------------------------------------------------------------ kpfusion ----

def load_torch_checkpoint_variables(path: str,
                                    net: str = 'KPFusion-resnet-18'
                                    ) -> Dict:
    """Load a released reference .pth and convert to flax variables.
    Shared by the Trainer warm-start and the demo. Dispatches on the net
    name, matching the reference backbone selection (model/model.py:363-373).
    """
    import torch
    ckpt = torch.load(path, map_location='cpu')
    return convert_kpfusion_checkpoint(ckpt, net=net)


def convert_kpfusion_checkpoint(checkpoint: Dict, depth: int = 18,
                                net: str = None) -> Dict:
    """Full released-checkpoint conversion: torch `{'model': state_dict}`
    (train.py:271-276) → flax variables {'params', 'batch_stats'} for
    either backbone family (resnet depth or convnext size, per the net
    name, e.g. 'KPFusion-resnet-18' / 'KPFusion-convnext-tiny')."""
    sd = checkpoint.get('model', checkpoint)
    sd = strip_module_prefix(sd)
    if net is not None and 'convnext' in net:
        size = net.split('-')[-1]
        convert = lambda pre: convert_convnext_unet(sd, size, pre)
    else:
        if net is not None:
            depth = int(net.split('-')[-1])
        convert = lambda pre: convert_resnet_unet(sd, depth, pre)
    params: Dict = {}
    stats: Dict = {}
    params['backbone_d'], stats['backbone_d'] = convert('backbone_d.')
    params['backbone_rgb'], stats['backbone_rgb'] = convert('backbone_rgb.')
    for i in (1, 2):
        params[f'block{i}'], stats[f'block{i}'] = convert_fusion_block(
            sd, f'block{i}')
    return {'params': params, 'batch_stats': stats}
