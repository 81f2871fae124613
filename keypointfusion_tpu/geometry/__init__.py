from keypointfusion_tpu.geometry.camera import (
    CropFrame,
    inv3x3,
    points_img_to_3d,
    points_3d_to_img,
    transform_points_2d,
    uvd_nl_to_xyz,
    uvd_nl_to_xyz_nl,
    xyz_nl_to_uvd_nl,
)
from keypointfusion_tpu.geometry.grid import uv_grid, img_uvd_points
from keypointfusion_tpu.geometry.pcl import (
    img_to_pcl_index,
    img_to_anchor_dis,
    depth_to_pcl_fixed,
)
