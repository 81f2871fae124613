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
