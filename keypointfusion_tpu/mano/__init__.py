from keypointfusion_tpu.mano.assets import ManoModel, load_mano_model
from keypointfusion_tpu.mano.manolayer import mano_forward, batch_rodrigues
