from keypointfusion_tpu.models.resnet import ResNet
from keypointfusion_tpu.models.unet import Residual, ResNetUNet
from keypointfusion_tpu.models.transformer import KeypointEncoder, KPInteraction, CrossDecoder
from keypointfusion_tpu.models.desa import DESA
from keypointfusion_tpu.models.fusion_block import FusionBlock
from keypointfusion_tpu.models.kpfusion import KPFusion
from keypointfusion_tpu.models.convnext import ConvNeXt, ConvNeXtUNet
from keypointfusion_tpu.models.legacy import PoseNet, Hourglass, CBAM, CenterNetRegressor
from keypointfusion_tpu.models.rgbd_fusion import RGBDResNet, RGBDResNetUNet, RGBDFusion, ACFusion, FSP
from keypointfusion_tpu.models.transformer_extra import DetrDecoder, SpatialAggregateTR
