"""KeypointFusion-TPU: a TPU-native JAX/Flax/Pallas framework for RGB-D 3D hand
pose estimation with the capabilities of ru1ven/KeypointFusion (AAAI 2024).

Design stance (TPU-first, not a torch translation):
  * one functional core — pure jitted functions over pytrees, static shapes
    everywhere (128x128 crops, 1024 points, 21 joints);
  * the reference's "dataset object passed into model.forward" pattern
    (reference model/model.py:395-426) is replaced by an explicit `CropFrame`
    pytree argument so the model stays pure and shardable;
  * batch-axis SPMD via jax.sharding.Mesh + jit shardings (the TPU-native
    equivalent of the reference's torch.nn.DataParallel, train.py:81);
  * hot small-op chains (ball-query grouping, dense codecs) are fused XLA ops
    with Pallas kernels where profitable.
"""

__version__ = "0.1.0"

from keypointfusion_tpu.config import Config
