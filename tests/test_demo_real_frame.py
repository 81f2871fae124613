"""Real-frame demo parity — the reference's shipped in-the-wild RGB-D frame.

The reference repo ships an actual capture plus the artifacts its demo
produced on it (/root/reference/visualization/: box.png RGB, box_d.png
uint16 depth, box_cropRGB.png / box_cropD.png crops, box_bbox.txt). Two
kinds of parity are checked on those real pixels:

  1. oracle parity — the reference `Model_RGBD` preprocessing methods
     (demo_RGBD.py:253-331: get_center_from_bbx, Crop_Image_deep_pp_RGB,
     process_depth, getpcl) run on CPU as an in-test oracle against this
     framework's demo preprocessing chain (bbox -> CoM -> crop -> M ->
     normalize -> pcl);
  2. golden-artifact parity — box_cropRGB.png / box_cropD.png were written
     by the reference's OWN demo run (demo_RGBD.py:588-589) and depend only
     on preprocessing, not weights: our crops must reproduce them.

Plus an end-to-end smoke run of ModelRGBD on the real frame (random
weights) that writes overlays to artifacts/demo_real_frame/.
"""

import os
import os.path as osp
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
torch = pytest.importorskip("torch")

ASSETS = "/root/reference/visualization"
CAM = (906.96, 906.79, 956.75, 547.23)
CUBE = [250.0, 250.0, 250.0]
# demo_RGBD.py:578-580: centered xywh -> corner xywh
BBOX = [885 - 178.0 / 2, 515.50 - 127.0 / 2, 178.0, 127.0]
ART_DIR = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                   "artifacts", "demo_real_frame")


@pytest.fixture(scope="module")
def frames():
    if not osp.isdir(ASSETS):
        pytest.skip("reference visualization assets not mounted")
    rgb = cv2.imread(osp.join(ASSETS, "box.png"))            # BGR uint8
    depth = cv2.imread(osp.join(ASSETS, "box_d.png"),
                       cv2.IMREAD_ANYDEPTH).astype(np.float32)
    assert rgb is not None and depth is not None
    return rgb, depth


@pytest.fixture(scope="module")
def ref_demo():
    """Bare reference Model_RGBD (no __init__: it builds the net and calls
    .cuda()); only the preprocessing attrs the oracle methods read."""
    from tests.ref_stubs import install_functional_stubs
    install_functional_stubs()
    # dataloader/processing_depth.py imports trimesh (mesh IO; unused on
    # the demo preprocessing path)
    import importlib.machinery
    import types

    def _stub(name, attrs=()):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        for a in attrs:
            setattr(m, a, lambda *args, **kw: None)
        sys.modules[name] = m
        return m

    _stub("trimesh")
    # util/object_transform.py:5 imports pytorch3d rotation converters;
    # unused on the demo preprocessing path
    p3d = _stub("pytorch3d")
    p3d.transforms = _stub("pytorch3d.transforms", (
        "axis_angle_to_matrix", "axis_angle_to_quaternion",
        "euler_angles_to_matrix", "matrix_to_euler_angles",
        "matrix_to_quaternion", "matrix_to_rotation_6d",
        "quaternion_to_axis_angle", "quaternion_to_matrix",
        "rotation_6d_to_matrix"))
    import transformers.pytorch_utils as ptu
    if not hasattr(ptu, "torch_int_div"):  # removed in new transformers
        ptu.torch_int_div = lambda a, b: torch.div(a, b,
                                                   rounding_mode="floor")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        import demo_RGBD as ref_mod  # noqa: F401
    except Exception as e:
        pytest.skip(f"reference demo unimportable: {e}")
    ref = ref_mod.Model_RGBD.__new__(ref_mod.Model_RGBD)
    ref.img_size = 128
    ref.cam_para = CAM
    ref.sample_num = 1024
    ref.flip = 1
    ref.cube = list(CUBE)
    return ref


def test_center_from_bbox_real_frame(frames, ref_demo):
    _, depth = frames
    from keypointfusion_tpu.demo import get_center_from_bbox
    ours = get_center_from_bbox(depth, BBOX)
    ref = ref_demo.get_center_from_bbx(depth, BBOX)
    np.testing.assert_allclose(ours, np.asarray(ref, np.float64),
                               rtol=0, atol=1e-4)
    # sanity: a real hand in frame, not the fallback
    assert 100 < ours[2] < 1500


def test_preprocess_chain_real_frame(frames, ref_demo):
    """CoM -> crop -> M -> normalized depth -> com3d -> full pcl, ours vs
    the reference methods, on the real capture."""
    rgb, depth = frames
    from keypointfusion_tpu.data import preprocessing as pp
    from keypointfusion_tpu.demo import get_center_from_bbox

    center = get_center_from_bbox(depth, BBOX)

    # RGB crop (thresh_z=False path)
    crop_ref, _ = ref_demo.Crop_Image_deep_pp_RGB(
        rgb.astype(np.float32), center, CUBE, (128, 128), CAM)
    crop_ours, _ = pp.crop_area_3d(rgb.astype(np.float32), center, CUBE,
                                   (128, 128), CAM, thresh_z=False)
    np.testing.assert_allclose(crop_ours, crop_ref, rtol=0, atol=1e-3)

    # depth crop + normalize + M + com3d (reference mutates its input crop
    # in normalize_img, so feed each side a fresh float copy)
    np.random.seed(0)
    data_r, _pcl_r, com3d_r, M_r, cube_r = ref_demo.process_depth(
        CUBE, depth.copy(), center)
    imgD_r = data_r.numpy()[0]

    depth_crop, M_o = pp.crop_area_3d(depth.copy(), center, CUBE,
                                      (128, 128), CAM)
    imgD_o = pp.normalize_img(depth_crop.max(), depth_crop, center, CUBE)
    com3d_o = pp.joint_img_to_3d(center, CAM)

    np.testing.assert_allclose(M_o, M_r.numpy(), rtol=0, atol=1e-4)
    np.testing.assert_allclose(com3d_o, com3d_r.numpy(), rtol=0, atol=1e-4)
    np.testing.assert_allclose(imgD_o, imgD_r, rtol=0, atol=1e-5)

    # full (pre-sampling) point cloud — deterministic, order-preserving
    pcl_r = ref_demo.getpcl(imgD_r.copy(), com3d_r.numpy(),
                            np.asarray(CUBE), M_r.numpy(), CAM)
    pcl_o = pp.get_pcl(imgD_o.copy(), com3d_o, np.asarray(CUBE),
                       M_o, CAM)
    assert pcl_o.shape == pcl_r.shape
    np.testing.assert_allclose(pcl_o, pcl_r, rtol=0, atol=1e-4)


def test_crops_match_shipped_golden(frames):
    """The repo's shipped box_cropRGB.png / box_cropD.png came out of the
    reference demo's real run (demo_RGBD.py:588-589) and are weight-free:
    our demo must reproduce them (uint8, allow rounding at the edge)."""
    rgb, depth = frames
    import jax
    from keypointfusion_tpu.config import Config
    from keypointfusion_tpu.demo import ModelRGBD

    cfg = Config(phase='test')
    model = ModelRGBD(cfg, cam_para=CAM)
    meta, out = model.estimate_pose_rgbd(
        [{"rgb": rgb, "depth": depth, "bbox": BBOX, "hand_type": "right"}])

    gold_rgb = cv2.imread(osp.join(ASSETS, "box_cropRGB.png"))   # BGR
    gold_d = cv2.imread(osp.join(ASSETS, "box_cropD.png"),
                        cv2.IMREAD_GRAYSCALE)
    # reference wrote cvtColor(RGB_crop, BGR2RGB) with imwrite's BGR
    # convention -> file holds the original BGR crop (see module docstring)
    ours_rgb = meta[0]["crop_img"]
    ours_d = meta[0]["crop_img_d"]
    assert ours_rgb.shape == gold_rgb.shape
    diff_rgb = np.abs(ours_rgb.astype(int) - gold_rgb.astype(int))
    diff_d = np.abs(ours_d.astype(int) - gold_d.astype(int))
    # uint8 quantization permits off-by-one at float ties
    assert (diff_rgb <= 1).mean() > 0.999, diff_rgb.max()
    assert (diff_d <= 1).mean() > 0.999, diff_d.max()

    # end-to-end smoke on the real frame: finite joints + overlays saved
    assert np.isfinite(out[0]["joint_xyz"]).all()
    assert np.isfinite(out[0]["joint_uvd"]).all()
    os.makedirs(ART_DIR, exist_ok=True)
    cv2.imwrite(osp.join(ART_DIR, "crop_rgb.png"), ours_rgb)
    cv2.imwrite(osp.join(ART_DIR, "crop_d.png"), ours_d)
    cv2.imwrite(osp.join(ART_DIR, "pose_d.png"), meta[0]["pose_d"])
    cv2.imwrite(osp.join(ART_DIR, "pose_rgb.png"), meta[0]["pose_rgb"])
