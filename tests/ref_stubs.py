"""Functional stubs for importing the reference torch code on CPU.

The reference (/root/reference) imports pycocotools, torchvision, timm and
pointnet2_ops, none of which are installed here. The model-conversion tests
stub them minimally; the composed-dataset golden tests need FUNCTIONAL
stubs (a real COCO-json join, a real ToTensor) because the dataset classes
actually call them. install_functional_stubs() installs or UPGRADES the
stubs so both kinds of test can coexist in one pytest session.
"""

import importlib.machinery
import json
import sys
import types

import numpy as np


def _mod(name):
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return m


class FakeCOCO:
    """Just enough of pycocotools.coco.COCO for the reference load_data
    loops (loader.py:1045-1052, 1233-1240): .anns and .loadImgs."""

    def __init__(self, path):
        with open(path) as f:
            db = json.load(f)
        self.anns = {a['id']: a for a in db['annotations']}
        self.imgs = {i['id']: i for i in db['images']}

    def loadImgs(self, ids):
        if not isinstance(ids, (list, tuple)):
            ids = [ids]
        return [self.imgs[i] for i in ids]


def _to_tensor_factory(torch):
    class ToTensor:
        """torchvision ToTensor on a float ndarray: HWC→CHW, no scaling
        (scaling applies to uint8 input only — the reference always
        converts to float32 first, loader.py:1151)."""

        def __call__(self, x):
            x = np.asarray(x)
            if x.ndim == 3:
                x = np.moveaxis(x, -1, 0)
            return torch.from_numpy(np.ascontiguousarray(x))
    return ToTensor


def install_functional_stubs():
    import torch

    # pycocotools — functional COCO
    pc = sys.modules.get('pycocotools') or _mod('pycocotools')
    pcc = sys.modules.get('pycocotools.coco') or _mod('pycocotools.coco')
    pcc.COCO = FakeCOCO
    pc.coco = pcc
    sys.modules['pycocotools'] = pc
    sys.modules['pycocotools.coco'] = pcc

    # torchvision — functional ToTensor + empty pretrained models
    tv = sys.modules.get('torchvision') or _mod('torchvision')
    tvm = sys.modules.get('torchvision.models') or _mod(
        'torchvision.models')
    tvt = sys.modules.get('torchvision.transforms') or _mod(
        'torchvision.transforms')

    class _Empty:
        def state_dict(self):
            return {}
    for name in ('resnet18', 'resnet34', 'resnet50', 'resnet101'):
        if not callable(getattr(tvm, name, None)):
            setattr(tvm, name, lambda *a, **k: _Empty())
    tvt.ToTensor = _to_tensor_factory(torch)

    class Compose:
        def __init__(self, fns):
            self.fns = fns

        def __call__(self, x):
            for f in self.fns:
                x = f(x)
            return x

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(-1, 1, 1)
            self.std = torch.tensor(std).view(-1, 1, 1)

        def __call__(self, x):
            return (x - self.mean.to(x.dtype)) / self.std.to(x.dtype)
    tvt.Compose = Compose
    tvt.Normalize = Normalize
    tv.models = tvm
    tv.transforms = tvt
    sys.modules['torchvision'] = tv
    sys.modules['torchvision.models'] = tvm
    sys.modules['torchvision.transforms'] = tvt

    # timm / pointnet2_ops — structural only (model path)
    if 'timm' not in sys.modules:
        tm = _mod('timm')
        tml = _mod('timm.models')
        tml.__path__ = []
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


def patch_numpy2_depth_decoders():
    """The reference decodes 16-bit depth as `uint8 + uint8 * 256`, which
    overflows under numpy>=2's strict NEP-50 casting (it relied on numpy 1
    promoting to int64). Patch in equivalent int-math versions so the
    reference classes still work as oracles."""
    import cv2
    loader_mod = import_reference_module('dataloader.loader')
    pre_mod = import_reference_module('dataloader.preprocess')

    def ho3d_read_depth_img(self, depth_filename):
        depth_scale = 0.00012498664727900177
        depth_img = cv2.imread(depth_filename)
        dpt = (depth_img[:, :, 2].astype(np.int64)
               + depth_img[:, :, 1].astype(np.int64) * 256)
        return dpt * depth_scale * 1000

    def nyu_reader(img_path):
        img = cv2.imread(img_path)
        return np.asarray(img[:, :, 0].astype(np.int64)
                          + img[:, :, 1].astype(np.int64) * 256, np.float32)

    def stb_read_depth_img(depth_filename):
        depth_img = cv2.imread(depth_filename)
        dpt = (depth_img[:, :, 2].astype(np.int64)
               + depth_img[:, :, 1].astype(np.int64) * 256)
        return dpt.astype(np.float32)

    loader_mod.HO3D.read_depth_img = ho3d_read_depth_img
    loader_mod.nyu_reader = nyu_reader
    # nyu_loader takes the reader as a default arg — rebind it
    import inspect
    defaults = list(loader_mod.nyu_loader.__init__.__defaults__)
    params = list(inspect.signature(
        loader_mod.nyu_loader.__init__).parameters)[1:]
    for i, p in enumerate(params[-len(defaults):]):
        if p == 'loader':
            defaults[i] = nyu_reader
    loader_mod.nyu_loader.__init__.__defaults__ = tuple(defaults)
    pre_mod.read_depth_img = stb_read_depth_img
    stb_mod = import_reference_module('dataloader.dataset_STB')
    stb_mod.read_depth_img = stb_read_depth_img
    return loader_mod


def import_reference_module(name):
    """Import a module from /root/reference with functional stubs in place.
    Returns the module, or None if the reference tree is absent."""
    import os
    if not os.path.isdir('/root/reference'):
        return None
    install_functional_stubs()
    if '/root/reference' not in sys.path:
        sys.path.insert(0, '/root/reference')
    import importlib
    return importlib.import_module(name)
