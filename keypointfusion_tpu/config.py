"""Configuration for KeypointFusion-TPU.

Field names and defaults mirror the reference config singleton
(reference config.py:2-82) so users of the reference find the same knobs,
but this is an immutable dataclass rather than a global mutable singleton.
"""

import dataclasses
import os.path as osp
from typing import List, Tuple

JOINT = {
    'STB': 21,
    'nyu': 14,
    'dexycb': 21,
    'ho3d': 21,
}

STEP = {
    'STB': 20,
    'nyu': 25,
    'dexycb': 10,
    'ho3d': 19,
}

EPOCH = {
    'STB': 30,
    'nyu': 30,
    'dexycb': 15,
    'ho3d': 24,
}

CUBE = {
    'STB': [200, 200, 200],
    'nyu': [250, 250, 250],
    'dexycb': [250, 250, 250],
    'ho3d': [280, 280, 280],
}


@dataclasses.dataclass(frozen=True)
class Config:
    phase: str = 'train'              # ['train', 'test', 'eval']
    root_dir: str = './data'

    net: str = 'KPFusion-resnet-18'   # ['KPFusion-resnet-18', 'KPFusion-convnext-T']

    dataset: str = 'dexycb'           # ['nyu', 'STB', 'dexycb', 'ho3d']
    ho3d_version: str = 'v2'
    model_save: str = ''
    save_dir: str = './'
    dexycb_setup: str = 's0'
    pretrain: str = '1k'
    # on-disk ImageNet checkpoint (file or directory) backing `pretrain`;
    # when empty the conventional torch hub cache is searched and a miss
    # falls back to random init (the reference downloads over the network,
    # resnetUnet.py:278-288 — this environment cannot). Setting this to a
    # path with no matching checkpoint is an error.
    pretrain_dir: str = ''
    point_num: int = 1024

    load_model: str = ''
    finetune_dir: str = ''
    resume: bool = False       # full resume from the latest checkpoint

    batch_size: int = 64
    input_size: int = 128
    center_type: str = 'refine'
    loss_type: str = 'L1Loss'         # ['L1Loss', 'Mse', 'GHM']
    augment_para: Tuple[float, float, float] = (10., 0.2, 180.)
    color_factor: float = 0.2

    lr: float = 8e-4
    opt: str = 'adamw'                # ['sgd', 'adam', 'adamw']
    scheduler: str = 'step'           # ['auto', 'step', 'constant']
    step_gamma: float = 0.1
    # accepted for config-surface compatibility; dead in the reference too
    # (defined at reference config.py:65,67 but never read anywhere)
    downsample: int = 2               # [1, 2, 4, 8]
    awr: bool = True
    coord_weight: float = 100.
    deconv_weight: float = 1.
    spatial_weight: Tuple[float, ...] = (10., 10., 10.)
    spatial_epoch: Tuple[int, ...] = (24, 24, 24)

    feature_type: Tuple[str, ...] = ('weight_offset',)
    feature_para: Tuple[float, ...] = (0.8,)

    # per-output supervision targets: 1 = dense pixel stage (backbones),
    # 2/3 = 3D / 2D-refined KFAM joint stages (reference config.py:77)
    stage_type: Tuple[int, ...] = (1, 1, 2, 3, 2, 3)

    mano_path: str = osp.join('.', 'assets', 'mano')

    # TPU-specific knobs (no reference equivalent)
    compute_dtype: str = 'float32'     # 'bfloat16' (serving) | 'mixed' (training)
    mesh_axis: str = 'data'            # 1-D data-parallel mesh axis name
    sync_batchnorm: bool = True        # pjit global-batch BN stats (see parallel/)
    seed: int = 23455                  # reference loader RNG seed (loader.py:208)
    # approx_min_k pcl->pixel neighbor selection (geometry/pcl.py) — 7x
    # faster on TPU, measured recall 1.0; keep False for exact-parity eval
    fast_topk: bool = False
    # rematerialize the forward in the training backward (jax.checkpoint):
    # trades ~1/3 more FLOPs for activation memory on very large batches.
    # (bs=256 no longer needs it: the dense pixel sampler recomputes its
    # [B,N,HW] weight matrix in the backward — geometry/pcl.py)
    remat: bool = False
    # train steps fused into one device dispatch via lax.scan
    # (train_step.make_train_step_scan): per-step dispatch is host-latency
    # bound (~23 ms of the 56 ms python-loop step over the remote tunnel,
    # artifacts/train_profile_r04_bs64.json); G>1 amortizes it away. Same
    # ops/rng stream as G single steps (bitwise only up to XLA's
    # per-executable fusion rounding — see test_resume_equivalence).
    # 1 = classic per-step dispatch.
    steps_per_dispatch: int = 1
    # Run the optimizer update on ONE raveled parameter vector
    # (optax.flatten) instead of ~230 per-leaf updates. True keeps
    # trace+compile small (the per-leaf unroll is 43% of the step's jaxpr
    # — minutes of XLA CPU compile in tests/dryrun); False removes the
    # per-step ravel/unravel data movement: measured 44.8 -> 40.4 ms/step
    # device time on v5e at bs=64 'mixed'
    # (artifacts/train_trace_r05_bs64_leafopt.json vs the flattened
    # trace). Math is identical either way (elementwise
    # optimizers commute with ravel); checkpoints store whichever
    # opt_state layout the run used, so restore with the same setting.
    flatten_opt: bool = True

    @property
    def joint_num(self) -> int:
        return JOINT[self.dataset]

    @property
    def cube_size(self) -> List[int]:
        return CUBE[self.dataset]

    @property
    def max_epoch(self) -> int:
        return EPOCH[self.dataset]

    @property
    def step_size(self) -> int:
        return STEP[self.dataset]

    def replace(self, **kw) -> 'Config':
        return dataclasses.replace(self, **kw)
