from keypointfusion_tpu.kernels.desa_pallas import (
    fold_bn, grouped_mlp_pool, desa_apply_inference,
)
