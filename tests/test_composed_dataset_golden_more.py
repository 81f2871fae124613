"""Composed dataset golden tests, HO3D / NYU / STB: the real reference
dataset classes (torch CPU, functional stubs) and the rebuilt loaders on
the same fake trees, RNG-aligned (see test_composed_dataset_golden.py for
the alignment argument). Reference dataloader/loader.py:1207-1638,
dataset_STB.py:21-179."""

import os
import random
import shutil
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(__file__))
from ref_stubs import import_reference_module
from test_composed_dataset_golden import (
    SEED, _compare, _ref_tuple_to_dict,
)
from test_datasets_more import ho3d_root, nyu_root, stb_root  # noqa: F401

pytestmark = pytest.mark.skipif(
    not os.path.isdir('/root/reference'), reason="reference not mounted")


from ref_stubs import patch_numpy2_depth_decoders


@pytest.fixture(scope="module")
def ref_loader_mod():
    mod = patch_numpy2_depth_decoders()
    if mod is None:
        pytest.skip("reference not mounted")
    return mod


@pytest.fixture(autouse=True)
def _no_native(monkeypatch):
    import keypointfusion_tpu.native as native
    monkeypatch.setattr(native, 'available', lambda: False)


@pytest.mark.parametrize("split", ["test", "train"])
def test_ho3d_composed_golden(ho3d_root, ref_loader_mod, split):
    ref_ds = ref_loader_mod.HO3D(split, ho3d_root, dataset_version='v2')
    from keypointfusion_tpu.data.datasets import HO3D
    ours_ds = HO3D(split, ho3d_root, version='v2', sample_num=1024,
                   seed=SEED)
    assert len(ref_ds) == len(ours_ds)
    random.seed(SEED)
    np.random.seed(SEED)
    for i in range(len(ref_ds)):
        ref = _ref_tuple_to_dict(ref_ds[i])
        ours = ours_ds[i]
        _compare(ours, ref, atol=1e-4)


def test_nyu_composed_golden(nyu_root, ref_loader_mod):
    # the reference loads MANO model-para side files the fake tree must
    # provide (loader.py:1007-1019)
    n = 3
    pp_dir = f'{nyu_root}/posePara_lm_collosion'
    os.makedirs(pp_dir, exist_ok=True)
    for name, cols in (('pose', 45), ('glb', 3), ('scale', 1),
                       ('trans', 3), ('shape', 10)):
        np.savetxt(f'{pp_dir}/nyu-test-0-{name}.txt',
                   np.zeros((n, cols)))
    ref_ds = ref_loader_mod.nyu_loader(nyu_root, 'test')
    from keypointfusion_tpu.data.datasets import NYUDataset
    ours_ds = NYUDataset(nyu_root, 'test', sample_num=1024, seed=SEED)
    assert len(ref_ds) == len(ours_ds)
    random.seed(SEED)
    np.random.seed(SEED)
    for i in range(len(ref_ds)):
        ref = _ref_tuple_to_dict(ref_ds[i])
        ours = ours_ds[i]
        _compare(ours, ref, atol=1e-4)


def test_stb_composed_golden(stb_root, ref_loader_mod):
    stb_mod = import_reference_module('dataloader.dataset_STB')
    cwd = os.getcwd()
    os.chdir('/root/reference')   # dataset_STB imports `from config import opt`
    try:
        ref_ds = stb_mod.STB('', 'test', stb_root)
    finally:
        os.chdir(cwd)
    from keypointfusion_tpu.data.datasets import STBDataset
    ours_ds = STBDataset('test', stb_root, sample_num=1024, seed=SEED)
    random.seed(SEED)
    np.random.seed(SEED)
    for i in range(2):   # only the first 2 frames have images on disk
        ref = _ref_tuple_to_dict(ref_ds[i])
        ours = ours_ds[i]
        _compare(ours, ref, atol=1e-4)
