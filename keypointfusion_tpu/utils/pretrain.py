"""ImageNet backbone warm-start — routes Config.pretrain to the converters.

The reference constructs its backbones already ImageNet-initialized:
torchvision ResNet weights loaded strict=False and then the depth stem
replaced with a fresh 1-ch conv (reference model/resnetUnet.py:278-289,
:362-373 — the RGB variant keeps the pretrained 3-ch conv1), and ConvNeXt
release checkpoints loaded before BOTH variants replace their stem
(convNeXT/resnetUnet.py:97-109, :196-204). The reference downloads over the
network; here the checkpoint must already be on disk — either at
``Config.pretrain_dir`` (file or directory) or in the conventional torch
hub cache (~/.cache/torch/hub/checkpoints).

The converted tree merges through ``merge_partial``, whose shape gate
reproduces the stem semantics exactly: the RGB ResNet conv1 [7,7,3,64]
merges, the depth conv1 [7,7,1,64] mismatches and keeps its fresh init,
and ConvNeXt stems are never emitted by the converter at all.
"""

from __future__ import annotations

import glob
import os
import os.path as osp
from typing import Dict, Optional

from keypointfusion_tpu.config import Config

TORCH_HUB_CACHE = osp.expanduser('~/.cache/torch/hub/checkpoints')

_CONVNEXT_LONG = {'T': 'tiny', 'S': 'small', 'B': 'base', 'L': 'large'}


def _patterns(cfg: Config):
    """Filename globs for the net's conventional released checkpoints."""
    if 'convnext' in cfg.net:
        size = cfg.net.split('-')[-1]
        long = _CONVNEXT_LONG.get(size, size.lower())
        tag = '22k' if cfg.pretrain == '22k' else '1k'
        return [f'convnext_{long}_{tag}*.pth', f'convnext_{long}*.pth']
    depth = cfg.net.split('-')[-1]
    return [f'resnet{depth}-*.pth', f'resnet{depth}.pth']


def find_imagenet_checkpoint(cfg: Config) -> Optional[str]:
    """Resolve the on-disk ImageNet checkpoint for cfg.net/cfg.pretrain.

    Returns None when nothing is configured and the cache is empty; raises
    FileNotFoundError when ``pretrain_dir`` is explicitly set but holds no
    matching checkpoint (a configured-but-absent path is a user error the
    run must not silently ignore)."""
    pats = _patterns(cfg)
    if cfg.pretrain_dir:
        if osp.isfile(cfg.pretrain_dir):
            return cfg.pretrain_dir
        if osp.isdir(cfg.pretrain_dir):
            for pat in pats:
                hits = sorted(glob.glob(osp.join(cfg.pretrain_dir, pat)))
                if hits:
                    return hits[0]
        raise FileNotFoundError(
            f"Config.pretrain_dir={cfg.pretrain_dir!r} has no checkpoint "
            f"matching {pats} for net={cfg.net!r} pretrain="
            f"{cfg.pretrain!r}")
    if osp.isdir(TORCH_HUB_CACHE):
        for pat in pats:
            hits = sorted(glob.glob(osp.join(TORCH_HUB_CACHE, pat)))
            if hits:
                return hits[0]
    return None


def imagenet_backbone_variables(cfg: Config) -> Optional[Dict]:
    """Load + convert the ImageNet checkpoint into a partial variables tree
    {'params': {'backbone_d': ..., 'backbone_rgb': ...}, 'batch_stats': ...}
    for merge_partial over a fresh KPFusion init. None when no checkpoint
    is available (and none was explicitly configured)."""
    path = find_imagenet_checkpoint(cfg)
    if path is None:
        return None
    import torch
    from keypointfusion_tpu.utils.torch_convert import (
        convert_convnext_imagenet, convert_resnet, strip_module_prefix)
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    if 'convnext' in cfg.net:
        size = cfg.net.split('-')[-1]
        body = convert_convnext_imagenet(ckpt, size)   # params, stem-less
        params = {'backbone': body}
        stats: Dict = {}
    else:
        depth = int(cfg.net.split('-')[-1])
        sd = ckpt.get('state_dict', ckpt.get('model', ckpt))
        bb_params, bb_stats = convert_resnet(strip_module_prefix(sd), depth)
        params = {'backbone': bb_params}
        stats = {'backbone': bb_stats}
    tree: Dict = {'params': {'backbone_d': params, 'backbone_rgb': params},
                  'batch_stats': {}}
    if stats:
        tree['batch_stats'] = {'backbone_d': stats, 'backbone_rgb': stats}
    return tree
