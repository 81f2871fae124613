"""In-the-wild RGB-D single-frame inference API.

Rebuilds reference demo_RGBD.py:27-592 (`Model_RGBD`): bbox → depth-CoM
center, crop + normalize + point cloud, jitted KPFusion forward, inverse-M
back-projection to original pixels, and pose overlays. The public contract
matches the reference:

    model = ModelRGBD(cfg, cam_para=(fx, fy, fu, fv))
    meta_info_list, outputs_list = model.estimate_pose_rgbd(
        [{'rgb': bgr_img, 'depth': depth_mm, 'bbox': xywh,
          'hand_type': 'right'}])

Run `python -m keypointfusion_tpu.demo` for a synthetic-frame smoke demo.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import cv2
import numpy as np
import jax
import jax.numpy as jnp

from keypointfusion_tpu.config import Config
from keypointfusion_tpu.data import preprocessing as pp
from keypointfusion_tpu.geometry.camera import (
    CropFrame, uvd_nl_to_xyz_nl, xyz_nl_to_uvd_nl,
)
from keypointfusion_tpu.ops.codecs import offset_to_joint_weight
from keypointfusion_tpu.models.kpfusion import KPFusion
from keypointfusion_tpu.utils.vis import draw_2d_pose, draw_2d_pose_rgb

MANO2HO3D = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
             20, 16, 17, 19, 18]


def get_center_from_bbox(depth: np.ndarray, bbox, upper=1500, lower=171
                         ) -> np.ndarray:
    """Masked-mean depth CoM inside the bbox (demo_RGBD.py:253-276)."""
    center = np.array([0.0, 0.0, 300.0])
    x0, y0 = int(bbox[0]), int(bbox[1])
    crop = depth[y0:int(bbox[1] + bbox[3]), x0:int(bbox[0] + bbox[2])]
    flag = np.logical_and(crop <= upper, crop >= lower)
    if flag.any():
        xv, yv = np.meshgrid(
            np.linspace(0, crop.shape[1], crop.shape[1]),
            np.linspace(0, crop.shape[0], crop.shape[0]))
        center[0] = np.mean(xv[flag]) + bbox[0]
        center[1] = np.mean(yv[flag]) + bbox[1]
        center[2] = np.mean(crop[flag])
        if center[2] <= 0:
            center[2] = 300.0
    return center


class ModelRGBD:
    def __init__(self, cfg: Config, cam_para: Tuple[float, float, float,
                                                    float],
                 variables: Optional[dict] = None):
        self.cfg = cfg
        self.cam_para = cam_para
        self.img_size = cfg.input_size
        self.cube = list(cfg.cube_size)
        self.sample_num = cfg.point_num
        self.model = KPFusion(net=cfg.net, joint_num=cfg.joint_num)
        self.np_rng = np.random.RandomState(cfg.seed)

        if variables is None:
            from keypointfusion_tpu.data.synthetic import synthetic_batch
            b = {k: jnp.asarray(v) for k, v in synthetic_batch(
                batch_size=1, point_num=cfg.point_num).items()}
            frame = CropFrame.from_batch(b['cam_para'], b['center'], b['M'],
                                         b['cube'])
            variables = self.model.init(jax.random.PRNGKey(0), b['rgb'],
                                        b['depth'], b['pcl'], frame)
            if cfg.load_model and cfg.load_model.endswith('.pth'):
                # released reference checkpoint → converter
                from keypointfusion_tpu.utils.torch_convert import (
                    load_torch_checkpoint_variables)
                conv = load_torch_checkpoint_variables(cfg.load_model,
                                                       cfg.net)
                variables = {'params': conv['params'],
                             'batch_stats': conv['batch_stats']}
            elif cfg.load_model:
                from keypointfusion_tpu.training.trainer import Checkpointer
                import os.path as osp
                ckpt = Checkpointer(osp.dirname(cfg.load_model) or '.')
                # weights-only restore into the init structure
                restored = ckpt.ckptr.restore(
                    osp.abspath(cfg.load_model),
                    {'params': variables['params'],
                     'batch_stats': variables.get('batch_stats', {})})
                variables = {'params': restored['params'],
                             'batch_stats': restored['batch_stats']}
        self.variables = variables
        # variables is a jit ARGUMENT (not a closure capture): assigning
        # model.variables = ... after construction takes effect on the next
        # call instead of silently serving trace-time weights.
        self._forward = jax.jit(self._forward_impl)

    def _forward_impl(self, variables, rgb, depth, pcl, frame):
        results, sw = self.model.apply(variables, rgb, depth, pcl,
                                       frame, self.cfg.feature_para[0],
                                       False)
        return results

    def process_depth(self, cube_size, depth, center_uvd):
        """Crop + normalize + sample the point cloud
        (demo_RGBD.py:305-343)."""
        depth_crop, M = pp.crop_area_3d(depth.astype(np.float32),
                                        center_uvd, cube_size,
                                        (self.img_size, self.img_size),
                                        self.cam_para)
        imgD = pp.normalize_img(depth_crop.max(), depth_crop, center_uvd,
                                cube_size)
        com3d = pp.joint_img_to_3d(center_uvd, self.cam_para)
        pcl = pp.get_pcl(imgD.copy(), com3d, np.asarray(cube_size), M,
                         self.cam_para)
        pcl = np.clip(pp.sample_pcl(pcl, self.sample_num, self.np_rng),
                      -1, 1)
        return imgD, pcl, com3d, M, np.asarray(cube_size, np.float32)

    def estimate_pose_rgbd(self, inputs: Sequence[Dict]
                           ) -> Tuple[List[Dict], List[Dict]]:
        meta_info_list, outputs_list = [], []
        for inp in inputs:
            rgb_full, depth_full = inp['rgb'], inp['depth']
            bbox = inp['bbox']
            center_uvd = get_center_from_bbox(depth_full, bbox)

            crop_rgb, _ = pp.crop_area_3d(
                rgb_full.astype(np.float32), center_uvd, self.cube,
                (self.img_size, self.img_size), self.cam_para,
                thresh_z=False)
            imgD, pcl, com3d, M, cube = self.process_depth(
                self.cube, depth_full.astype(np.float32), center_uvd)

            rgb_in = (crop_rgb / 255.0)[None].astype(np.float32)
            depth_in = imgD[None, ..., None].astype(np.float32)
            pcl_in = pcl[None]
            frame = CropFrame.from_batch(
                np.asarray(self.cam_para, np.float32)[None],
                com3d[None].astype(np.float32), M[None].astype(np.float32),
                cube[None], img_size=self.img_size)

            results = self._forward(self.variables, jnp.asarray(rgb_in),
                                    jnp.asarray(depth_in),
                                    jnp.asarray(pcl_in), frame)

            joint_uvd_list, joint_xyz_list = [], []
            for index, stage in enumerate(self.cfg.stage_type):
                if stage == 1:
                    joint_uvd = offset_to_joint_weight(
                        results[index], jnp.asarray(depth_in),
                        self.cfg.feature_para[0])
                    joint_xyz = uvd_nl_to_xyz_nl(joint_uvd, frame)
                else:
                    joint_xyz = results[index]
                    joint_uvd = xyz_nl_to_uvd_nl(joint_xyz, frame)
                joint_uvd_list.append(np.asarray(joint_uvd)[0])
                joint_xyz_list.append(np.asarray(joint_xyz)[0])

            joint_xyz_world = (joint_xyz_list[-1] * cube / 2 + com3d)
            joint_xyz_world = joint_xyz_world[MANO2HO3D] \
                * np.array([1, -1, -1]) / 1000

            # index 2 = first KFAM 3D stage, as in demo_RGBD.py:144
            joint_uvd = joint_uvd_list[2].copy()
            pose_d = draw_2d_pose(depth_in[0], joint_uvd, 'dexycb')
            pose_rgb = draw_2d_pose_rgb(rgb_in[0], joint_uvd, 'dexycb')

            joint_uvd[:, :2] = (joint_uvd[:, :2] + 1) / 2 * self.img_size
            joint_uvd[:, 2] = joint_uvd[:, 2] * cube[0] / 2 + com3d[2]
            coord_uvd_full = pp.transform_points_2d(joint_uvd,
                                                    np.linalg.inv(M))

            meta_info_list.append({
                'crop_img': (rgb_in[0] * 255).astype(np.uint8),
                'crop_img_d': ((depth_in[0, ..., 0] + 1) / 2 * 255).astype(
                    np.uint8),
                'img2bb_trans': M,
                'bb2img_trans': np.linalg.inv(M),
                'center': com3d,
                'pose_rgb': pose_rgb,
                'pose_d': pose_d,
            })
            outputs_list.append({
                'mesh_uvd': None,
                'mesh_xyz': None,
                'joint_uvd': coord_uvd_full,
                'joint_xyz': joint_xyz_world,
            })
        return meta_info_list, outputs_list


def _main():
    """Smoke demo on a synthetic frame (no checkpoint → random weights)."""
    rng = np.random.RandomState(0)
    depth = np.zeros((720, 1280), np.float32)
    depth[300:420, 560:680] = rng.uniform(400, 600, (120, 120))
    rgb = rng.randint(0, 255, (720, 1280, 3)).astype(np.uint8)
    bbox = [560, 300, 120, 120]
    cfg = Config(phase='test')
    model = ModelRGBD(cfg, cam_para=(906.96, 906.79, 956.75, 547.23))
    meta, out = model.estimate_pose_rgbd(
        [{'rgb': rgb, 'depth': depth, 'bbox': bbox, 'hand_type': 'right'}])
    print('joint_xyz:', out[0]['joint_xyz'].shape,
          'joint_uvd:', out[0]['joint_uvd'].shape)
    cv2.imwrite('/tmp/kpf_demo_pose_d.png', meta[0]['pose_d'])
    cv2.imwrite('/tmp/kpf_demo_pose_rgb.png', meta[0]['pose_rgb'])
    print('overlays written to /tmp/kpf_demo_pose_{d,rgb}.png')


if __name__ == '__main__':
    _main()
