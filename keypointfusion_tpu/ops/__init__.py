from keypointfusion_tpu.ops.codecs import (
    joint_to_offset,
    offset_to_joint_weight,
    offset_to_joint_softmax,
    joint_to_heatmap,
    pcl_joint_to_offset,
    pcl_offset_to_joint_weight,
)
from keypointfusion_tpu.ops.loss import smooth_l1_loss
from keypointfusion_tpu.ops.resize import resize_nearest_torch, upsample_bilinear_x2
from keypointfusion_tpu.ops.ball_query import ball_query_group, group_features
from keypointfusion_tpu.ops.pairwise import pairwise_sqdist
from keypointfusion_tpu.ops.codecs_extra import (
    joint_to_feature, feature_to_joint, offset_to_joint_topk,
    offset_to_joint_weight_nosoftmax, heatmap_to_joint_softmax,
)
