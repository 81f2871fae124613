"""In-the-wild RGB-D demo entry point — the reference's
`python demo_RGBD.py` preserved (reference demo_RGBD.py:572-592).

Reads an RGB + depth pair, estimates the hand pose inside the given bbox,
and writes crop/pose overlays.
"""

import argparse
import os

import cv2
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--rgb', default='./visualization/box.png')
    parser.add_argument('--depth', default='./visualization/box_d.png')
    parser.add_argument('--bbox', nargs=4, type=float,
                        default=[885, 515.5, 178.0, 127.0],
                        help='cx cy w h (center-style, like the reference)')
    parser.add_argument('--out_dir', default='./visualization')
    parser.add_argument('--load_model', default='')
    parser.add_argument('--fx', type=float, default=906.96)
    parser.add_argument('--fy', type=float, default=906.79)
    parser.add_argument('--fu', type=float, default=956.75)
    parser.add_argument('--fv', type=float, default=547.23)
    args = parser.parse_args()

    from keypointfusion_tpu.config import Config
    from keypointfusion_tpu.demo import ModelRGBD

    bbox = list(args.bbox)
    bbox[0] -= bbox[2] / 2
    bbox[1] -= bbox[3] / 2

    if os.path.exists(args.rgb):
        rgb = cv2.imread(args.rgb)
        depth = cv2.imread(args.depth, cv2.IMREAD_ANYDEPTH).astype(
            np.float32)
    else:
        print(f'{args.rgb} not found — running on a synthetic frame')
        rng = np.random.RandomState(0)
        depth = np.zeros((1080, 1920), np.float32)
        y, x = int(bbox[1]), int(bbox[0])
        depth[y:y + int(bbox[3]), x:x + int(bbox[2])] = rng.uniform(
            400, 600, (int(bbox[3]), int(bbox[2])))
        rgb = rng.randint(0, 255, (1080, 1920, 3)).astype(np.uint8)

    cfg = Config(phase='test', load_model=args.load_model)
    model = ModelRGBD(cfg, cam_para=(args.fx, args.fy, args.fu, args.fv))
    meta, result = model.estimate_pose_rgbd(
        [{'rgb': rgb, 'depth': depth, 'bbox': bbox, 'hand_type': 'right'}])

    os.makedirs(args.out_dir, exist_ok=True)
    cv2.imwrite(f'{args.out_dir}/box_cropRGB.png', meta[0]['crop_img'])
    cv2.imwrite(f'{args.out_dir}/box_cropD.png', meta[0]['crop_img_d'])
    cv2.imwrite(f'{args.out_dir}/box_poseRGB.png', meta[0]['pose_rgb'])
    cv2.imwrite(f'{args.out_dir}/box_poseD.png', meta[0]['pose_d'])
    print('joint_xyz (m):', result[0]['joint_xyz'][:3], '...')
    print(f'overlays written to {args.out_dir}/')


if __name__ == '__main__':
    main()
