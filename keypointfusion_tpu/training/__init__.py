from keypointfusion_tpu.training.losses import compute_losses
from keypointfusion_tpu.training.train_step import (
    TrainState, create_train_state, make_train_step, make_eval_step,
)
