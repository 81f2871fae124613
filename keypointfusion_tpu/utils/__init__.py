from keypointfusion_tpu.utils.vis import draw_pose, draw_2d_pose, draw_2d_pose_rgb
