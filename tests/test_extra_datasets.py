"""FreiHAND/RHD helper tests, golden vs the reference preprocess module
where importable (reference dataloader/preprocess.py:51-428)."""

import json
import os
import sys

import cv2
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from keypointfusion_tpu.data.extra_datasets import (
    convert_kp, create_heatmap, freihand_map_id, imcrop,
    load_freihand_annotations, make_gaussian_heatmap, preprocess_rhd,
    project_points, read_freihand_img, unify_mask,
)


def _ref_preprocess():
    from ref_stubs import import_reference_module
    cwd = os.getcwd()
    os.chdir('/root/reference')   # imports `from config import opt`
    try:
        return import_reference_module('dataloader.preprocess')
    except Exception as e:
        pytest.skip(f'reference preprocess unimportable: {e}')
    finally:
        os.chdir(cwd)


def test_freihand_index_and_versions(tmp_path):
    n = 3
    for name, val in (('K', [[[600., 0, 320], [0, 600, 240], [0, 0, 1]]]),
                      ('verts', [[[0.0] * 3] * 4]),
                      ('xyz', [[[0.1, 0.2, 0.5]] * 21]),
                      ('scale', [1.0])):
        with open(tmp_path / f'training_{name}.json', 'w') as f:
            json.dump(val * n, f)
    db = load_freihand_annotations(str(tmp_path), 'training')
    assert len(db) == 3 and len(db[0]) == 4
    assert freihand_map_id(5, 'gs') == 5
    assert freihand_map_id(5, 'hom') == 5 + 32560
    with pytest.raises(ValueError):
        freihand_map_id(0, 'nope')

    os.makedirs(tmp_path / 'training' / 'rgb')
    img = np.zeros((8, 8, 3), np.uint8)
    cv2.imwrite(str(tmp_path / 'training' / 'rgb' / '00000005.jpg'), img)
    assert read_freihand_img(5, str(tmp_path), 'training').shape == (8, 8, 3)


def test_project_points_golden():
    ref = _ref_preprocess()
    rng = np.random.RandomState(0)
    xyz = rng.uniform(0.2, 0.8, (21, 3))
    K = np.array([[600., 0, 320], [0, 600, 240], [0, 0, 1]])
    np.testing.assert_allclose(project_points(xyz, K),
                               ref.projectPoints(xyz, K), rtol=1e-6)


def test_imcrop_golden():
    ref = _ref_preprocess()
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (60, 80, 3)).astype(np.uint8)
    for center, size in (((40, 30), 10), ((5, 5), 12), ((75, 55), 20)):
        got, gt = imcrop(img.copy(), center, size)
        want, wt = ref.imcrop(img.copy(), center, size)
        np.testing.assert_array_equal(got, want)
        np.testing.assert_allclose(gt, wt)


def test_convert_kp_golden():
    ref = _ref_preprocess()
    kp = np.random.RandomState(2).rand(21, 3)
    np.testing.assert_array_equal(convert_kp(kp), ref.convert_kp(kp))


def test_preprocess_rhd_golden():
    ref = _ref_preprocess()
    rng = np.random.RandomState(3)
    for dominant in ('left', 'right'):
        image = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
        mask = np.zeros((64, 64, 3), np.uint8)
        if dominant == 'left':
            mask[20:40, 20:40] = 5          # left-hand labels 2..17
            mask[50:54, 50:54] = 20         # a bit of right hand
        else:
            mask[20:44, 18:42] = 20         # right-hand labels >17
            mask[2:6, 2:6] = 5
        uv = rng.uniform(10, 50, (42, 2))
        xyz = rng.uniform(-0.5, 0.5, (42, 3))
        got = preprocess_rhd(image.copy(), mask.copy(), uv.copy(),
                             xyz.copy())
        want = ref.preprocessRHD(image.copy(), mask.copy(), uv.copy(),
                                 xyz.copy())
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g, np.float64),
                                       np.asarray(w, np.float64))


def test_unify_mask_golden():
    ref = _ref_preprocess()
    m = np.random.RandomState(4).randint(0, 34, (32, 32))
    for side in (np.array([1.0, 0.0]), np.array([0.0, 1.0])):
        np.testing.assert_array_equal(unify_mask(m.copy(), side),
                                      ref.unify_mask(m.copy(), side))


def test_create_heatmap_golden():
    ref = _ref_preprocess()
    joints = np.random.RandomState(5).uniform(5, 60, (21, 2))
    np.testing.assert_allclose(create_heatmap(joints, 64),
                               ref.create_heatmap(joints, 64), atol=1e-6)
    assert (create_heatmap(np.zeros((21, 2))) == 0).all()


def test_make_gaussian_heatmap():
    hm = make_gaussian_heatmap(np.array([[[8.0, 4.0]]]), (16, 16),
                               sigma=2.5)
    assert hm.shape == (1, 1, 16, 16)
    assert hm[0, 0, 4, 8] == pytest.approx(1.0)
    assert hm[0, 0].argmax() == 4 * 16 + 8
