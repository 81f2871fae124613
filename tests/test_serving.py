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
