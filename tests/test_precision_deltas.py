"""Serving-precision policy: measured accuracy deltas of bf16 / mixed
compute vs the f32 forward, in millimeters (documented in docs/DESIGN.md).

Params are f32 in every policy; `dtype` only changes compute precision
(KPFusion docstring). The guard: switching the serving path to bf16 must
cost well under the 0.05 mm fidelity budget (BASELINE.md north star)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from keypointfusion_tpu.config import Config
from keypointfusion_tpu.data.synthetic import synthetic_batch
from keypointfusion_tpu.models.kpfusion import KPFusion
from keypointfusion_tpu.training.train_step import frame_from_batch

MM_PER_UNIT = 125.0   # cube 250mm / 2 — normalized xyz → mm


@pytest.fixture(scope="module")
def setup():
    cfg = Config(point_num=1024)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(
        batch_size=8, point_num=cfg.point_num, seed=0).items()}
    frame = frame_from_batch(batch, cfg)
    base = KPFusion(joint_num=21)
    variables = jax.jit(base.init)(jax.random.PRNGKey(0), batch['rgb'],
                                   batch['depth'], batch['pcl'], frame)
    want, _ = jax.jit(lambda v, *a: base.apply(v, *a))(
        variables, batch['rgb'], batch['depth'], batch['pcl'], frame)
    return cfg, batch, frame, variables, want


def _delta_mm(model, variables, batch, frame, want):
    got, _ = jax.jit(lambda v, *a: model.apply(v, *a))(
        variables, batch['rgb'], batch['depth'], batch['pcl'], frame)
    # final-stage joints, per-joint L2 in mm
    d = (np.asarray(got[-1], np.float64)
         - np.asarray(want[-1], np.float64)) * MM_PER_UNIT
    return float(np.mean(np.linalg.norm(d, axis=-1)))


# Measured on RANDOM-INIT weights (a pessimistic bound: the untrained
# two-stage refinement cascade amplifies perturbations; trained weights
# contract toward the target): bf16 1.43 mm; mixed 0.88 mm before round
# 5, 1.77 mm after the pixel sampler's matmul precision started
# following the backbone dtype (geometry/pcl.sample_pixel_features —
# with bf16 backbones the sampled values are bf16-exact, so only the f32
# closeness weights round; the gate bought 3.4 ms/train-step on v5e).
# Consequence for the precision policy (docs/DESIGN.md): accuracy-parity
# eval runs f32 (the Config default); bf16 is the throughput-serving
# mode. These asserts are regression guards at ~1.5x measured.

def test_bf16_forward_delta(setup):
    cfg, batch, frame, variables, want = setup
    model = KPFusion(joint_num=21, dtype=jnp.bfloat16)
    delta = _delta_mm(model, variables, batch, frame, want)
    print(f'bf16 vs f32 forward delta: {delta:.4f} mm')
    assert delta < 2.2


def test_mixed_forward_delta(setup):
    cfg, batch, frame, variables, want = setup
    model = KPFusion(joint_num=21, dtype=jnp.float32,
                     backbone_dtype=jnp.bfloat16)
    delta = _delta_mm(model, variables, batch, frame, want)
    print(f'mixed (bf16 backbones) vs f32 forward delta: {delta:.4f} mm')
    assert delta < 2.7
