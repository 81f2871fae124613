"""Streaming engine functional test (small frames, CPU)."""

import numpy as np

from keypointfusion_tpu.config import Config
from keypointfusion_tpu.serving import StreamingEngine


def test_streaming_engine_contract():
    cfg = Config(phase='test', point_num=128)
    bs = 4
    eng = StreamingEngine(cfg, batch_size=bs, img_hw=(120, 160))
    rng = np.random.RandomState(0)

    def gen(n):
        for _ in range(n):
            depth = np.zeros((bs, 120, 160), np.uint16)
            depth[:, 40:80, 60:100] = rng.randint(
                500, 700, (bs, 40, 40)).astype(np.uint16)
            rgb = rng.randint(0, 255, (bs, 120, 160, 3)).astype(np.uint8)
            centers = np.tile(np.array([[80, 60, 600]], np.float32),
                              (bs, 1))
            cube = np.full((bs, 3), 250, np.float32)
            cam = np.tile(np.array([[150, 150, 80, 60]], np.float32),
                          (bs, 1))
            yield {'depth': depth, 'rgb': rgb, 'centers': centers,
                   'cube': cube, 'cam': cam}

    outs = list(eng.process_stream(gen(3)))
    assert len(outs) == 3
    for o in outs:
        assert o['joint_xyz_mm'].shape == (bs, 21, 3)
        assert o['joint_uvd'].shape == (bs, 21, 3)
        assert np.isfinite(o['joint_xyz_mm']).all()


def test_kpfusion_pallas_desa_path_matches_xla():
    """The use_pallas_desa eval path must match the XLA module path on the
    full model (interpret mode on CPU)."""
    import jax
    import jax.numpy as jnp
    from keypointfusion_tpu.data.synthetic import synthetic_batch
    from keypointfusion_tpu.models.kpfusion import KPFusion
    from keypointfusion_tpu.training.train_step import frame_from_batch

    cfg = Config(point_num=128)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(
        batch_size=2, point_num=128, seed=0).items()}
    frame = frame_from_batch(batch, cfg)
    base = KPFusion(joint_num=21)
    variables = base.init(jax.random.PRNGKey(0), batch['rgb'],
                          batch['depth'], batch['pcl'], frame)
    pallas = KPFusion(joint_num=21, use_pallas_desa=True,
                      pallas_interpret=True)
    want, _ = base.apply(variables, batch['rgb'], batch['depth'],
                         batch['pcl'], frame)
    got, _ = pallas.apply(variables, batch['rgb'], batch['depth'],
                          batch['pcl'], frame)
    for i, (a, b) in enumerate(zip(got, want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, err_msg=f'result_{i}')


def test_streaming_engine_multichip_matches_single():
    """Multi-chip serving: the mesh-sharded pipeline (batch sharded over 8
    virtual devices, params replicated) must produce the same joints as the
    single-device engine on identical inputs — SPMD partitioning is a
    layout change, not a numeric one, on this batch-parallel path.

    Compared at f32: partitioning changes XLA's fusion/tiling choices,
    which changes bf16 rounding enough (measured up to ~3.7 mm on the
    default bf16 engine) to flip soft selections downstream — a precision
    artifact, not a sharding bug. f32 matches to ~1e-4 mm."""
    import jax
    import jax.numpy as jnp
    from keypointfusion_tpu.parallel.mesh import make_mesh

    cfg = Config(phase='test', point_num=128)
    bs = 8
    rng = np.random.RandomState(1)
    depth = np.zeros((bs, 120, 160), np.uint16)
    depth[:, 40:80, 60:100] = rng.randint(
        500, 700, (bs, 40, 40)).astype(np.uint16)
    batch = {
        'depth': depth,
        'rgb': rng.randint(0, 255, (bs, 120, 160, 3)).astype(np.uint8),
        'centers': np.tile(np.array([[80, 60, 600]], np.float32), (bs, 1)),
        'cube': np.full((bs, 3), 250, np.float32),
        'cam': np.tile(np.array([[150, 150, 80, 60]], np.float32),
                       (bs, 1)),
    }

    single = StreamingEngine(cfg, batch_size=bs, img_hw=(120, 160),
                             dtype=jnp.float32)
    mesh = make_mesh(len(jax.devices()))
    sharded = StreamingEngine(cfg, variables=single.variables,
                              batch_size=bs, img_hw=(120, 160),
                              dtype=jnp.float32, mesh=mesh)

    out_s = list(single.process_stream(iter([batch])))[0]
    out_m = list(sharded.process_stream(iter([batch])))[0]
    np.testing.assert_allclose(out_m['joint_xyz_mm'],
                               out_s['joint_xyz_mm'], atol=1e-3)
    np.testing.assert_allclose(out_m['joint_uvd'], out_s['joint_uvd'],
                               atol=1e-4)


def test_streaming_engine_mesh_rejects_indivisible_batch():
    import jax
    from keypointfusion_tpu.parallel.mesh import make_mesh
    import pytest

    mesh = make_mesh(len(jax.devices()))
    if mesh.devices.size == 1:
        pytest.skip('needs >1 device')
    with pytest.raises(ValueError, match='not divisible'):
        StreamingEngine(Config(point_num=128), batch_size=3,
                        img_hw=(120, 160), mesh=mesh)
