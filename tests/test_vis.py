"""Golden parity tests for utils/vis.py against the reference
util/vis_tool.py (tables bit-equal, cv2 renderers pixel-equal)."""

import os
import sys

import numpy as np
import pytest

from keypointfusion_tpu.utils import vis

sys.path.insert(0, os.path.dirname(__file__))
from ref_stubs import import_reference_module  # noqa: E402


@pytest.fixture(scope="module")
def ref_vis():
    try:
        return import_reference_module("util.vis_tool")
    except Exception as e:  # matplotlib may be absent / ref unmounted
        pytest.skip(f"reference vis_tool unimportable: {e}")


DATASETS = ["dexycb", "FHAD", "hands17", "nyu", "nyu_all", "icvl", "msra",
            "itop", "shrec", "DHG2016"]


def _values(colors):
    return [tuple(c.value) for c in colors]


@pytest.mark.parametrize("ds", DATASETS)
def test_sketch_setting_matches(ref_vis, ds):
    assert [list(b) for b in vis.get_sketch_setting(ds)] == \
        [list(b) for b in ref_vis.get_sketch_setting(ds)]


@pytest.mark.parametrize("ds", DATASETS)
def test_color_tables_match(ref_vis, ds):
    assert [tuple(c) for c in vis.get_sketch_color(ds)] == \
        _values(ref_vis.get_sketch_color(ds))
    assert [tuple(c) for c in vis.get_joint_color(ds)] == \
        _values(ref_vis.get_joint_color(ds))


@pytest.mark.parametrize("ds", ["mano", "hands17", "nyu", "nyu_all"])
def test_hierarchy_tables_match(ref_vis, ds):
    assert vis.get_hierarchy_mapping(ds) == ref_vis.get_hierarchy_mapping(ds)
    ref_sketch = ref_vis.get_hierarchy_sketch(ds)
    got = vis.get_hierarchy_sketch(ds)
    assert [list(map(list, lvl)) for lvl in got] == \
        [list(map(list, lvl)) for lvl in ref_sketch]


@pytest.mark.parametrize("ds", ["dexycb", "nyu", "nyu_all", "icvl", "msra",
                                "itop", "shrec"])
def test_draw_pose_pixel_parity(ref_vis, ds):
    r = np.random.RandomState(hash(ds) % (2 ** 31))
    img = r.randint(0, 255, (128, 128, 3), np.uint8)
    n_joints = len(ref_vis.get_joint_color(ds))
    pose = r.uniform(5, 123, (n_joints, 3)).astype(np.float32)
    ours = vis.draw_pose(ds, img.copy(), pose, scale=1)
    ref = ref_vis.draw_pose(ds, img.copy(), pose, scale=1)
    np.testing.assert_array_equal(ours, ref)


def test_draw_point_and_visible_pixel_parity(ref_vis):
    r = np.random.RandomState(7)
    img = r.randint(0, 255, (96, 96, 3), np.uint8)
    pose = r.uniform(5, 91, (21, 2)).astype(np.float32)
    np.testing.assert_array_equal(
        vis.draw_point("dexycb", img.copy(), pose),
        ref_vis.draw_point("dexycb", img.copy(), pose))
    visible = r.randint(0, 2, (21,))
    np.testing.assert_array_equal(
        vis.draw_visible("dexycb", img.copy(), pose, visible),
        ref_vis.draw_visible("dexycb", img.copy(), pose, visible))


def test_draw_2d_pose_pixel_parity(ref_vis):
    torch = pytest.importorskip("torch")
    r = np.random.RandomState(3)
    depth = r.uniform(-1, 1, (1, 64, 64)).astype(np.float32)
    joints = r.uniform(-0.9, 0.9, (21, 3)).astype(np.float32)
    ref = ref_vis.draw_2d_pose(torch.from_numpy(depth),
                               torch.from_numpy(joints), "dexycb")
    ours = vis.draw_2d_pose(depth[0][..., None], joints, "dexycb")
    # reference draws onto a float image; truncating to u8 reproduces our
    # pre-draw quantization exactly (drawn pixels are integer colors)
    np.testing.assert_array_equal(ours, ref.astype(np.uint8))


def test_draw_2d_pose_rgb_pixel_parity(ref_vis):
    torch = pytest.importorskip("torch")
    r = np.random.RandomState(4)
    rgb = r.uniform(0, 1, (3, 64, 64)).astype(np.float32)
    joints = r.uniform(-0.9, 0.9, (21, 3)).astype(np.float32)
    ref = ref_vis.draw_2d_pose_rgb(torch.from_numpy(rgb),
                                   torch.from_numpy(joints), "dexycb")
    ours = vis.draw_2d_pose_rgb(rgb.transpose(1, 2, 0), joints, "dexycb")
    np.testing.assert_array_equal(ours, ref.astype(np.uint8))


def test_draw_pcl_batch_matches_reference(ref_vis):
    torch = pytest.importorskip("torch")
    r = np.random.RandomState(5)
    pcl = r.uniform(-1.2, 1.2, (4, 256, 3)).astype(np.float32)
    ref = ref_vis.draw_pcl(torch.from_numpy(pcl), 64).numpy()  # [B,1,S,S]
    ours = vis.draw_pcl_batch(pcl, 64)  # [B,S,S,1]
    np.testing.assert_array_equal(ours[..., 0], ref[:, 0])


def test_debug_mesh_obj_dump(ref_vis, tmp_path):
    torch = pytest.importorskip("torch")
    r = np.random.RandomState(6)
    verts = r.uniform(-1, 1, (2, 10, 3)).astype(np.float32)
    faces = r.randint(0, 10, (6, 3)).astype(np.int64)
    ref_dir, our_dir = tmp_path / "ref", tmp_path / "ours"
    ref_dir.mkdir(), our_dir.mkdir()
    ref_vis.debug_mesh(torch.from_numpy(verts), torch.from_numpy(faces),
                       1, str(ref_dir), "mesh")
    vis.debug_mesh(verts, faces, 1, str(our_dir), "mesh")
    for i in (2, 3):
        ref_txt = (ref_dir / f"{i}_mesh.obj").read_text()
        our_txt = (our_dir / f"{i}_mesh.obj").read_text()
        assert our_txt == ref_txt


def test_montage_and_debug_renderers_smoke(tmp_path):
    """Shape/IO smoke for the batch debug family (no reference analogue
    rendering comparison: reference uses matplotlib figures for some)."""
    r = np.random.RandomState(8)
    depth = r.uniform(-1, 1, (2, 32, 32, 1)).astype(np.float32)
    joints = r.uniform(-0.9, 0.9, (2, 21, 3)).astype(np.float32)
    overlays = vis.debug_2d_pose(depth, joints, 0, "dexycb",
                                 str(tmp_path), "pose", save=True)
    assert overlays.shape == (2, 32, 32, 3)
    assert (tmp_path / "0_pose.png").exists()
    hm = r.uniform(0, 1, (2, 3, 16, 16)).astype(np.float32)
    tiles = vis.debug_img_heatmap(depth, hm, 0, str(tmp_path), 32,
                                  save=False)
    assert tiles.shape == (6, 32, 32, 3)
    mont = vis.draw_muti_pic([overlays, overlays, overlays], 0,
                             str(tmp_path), "mont", text=["a", "b"],
                             save=True, max_col=2)
    assert len(mont) == 2 and mont[0].shape == (64, 64, 3)
    assert (tmp_path / "mont_0.png").exists()
    field = np.zeros((32, 32, 4 * 21), np.float32)
    field[..., 0] = 0.3
    arrows = vis.draw_offset_field(depth[0], field, 0)
    assert arrows.shape == (32, 32, 3)
    scatter = vis.draw_pcl(r.uniform(-1, 1, (100, 3)), 64)
    assert scatter.shape == (64, 64, 3)
