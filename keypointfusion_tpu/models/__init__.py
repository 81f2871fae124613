from keypointfusion_tpu.models.resnet import ResNet
from keypointfusion_tpu.models.unet import Residual, ResNetUNet
from keypointfusion_tpu.models.transformer import KeypointEncoder, KPInteraction, CrossDecoder
from keypointfusion_tpu.models.desa import DESA
from keypointfusion_tpu.models.fusion_block import FusionBlock
from keypointfusion_tpu.models.kpfusion import KPFusion
