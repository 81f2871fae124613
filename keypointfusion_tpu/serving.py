"""Batched streaming RGB-D inference engine (throughput mode).

The reference has no serving stack (its demo runs one frame at a time
through DataParallel, demo_RGBD.py:65-173). This engine is the
production-path counterpart the BASELINE north star asks for: full frames
stream in, on-device fused preprocessing (data/device_preprocess.py) +
the jitted KPFusion forward run as ONE compiled program per batch, and
dispatch is asynchronous — the host enqueues batch k+1 while batch k runs,
keeping the chip saturated (double-buffered host→HBM).
"""

from __future__ import annotations

import collections
from typing import Dict, Iterator, Optional

import numpy as np
import jax
import jax.numpy as jnp

from keypointfusion_tpu.config import Config
from keypointfusion_tpu.data.device_preprocess import device_preprocess
from keypointfusion_tpu.geometry.camera import xyz_nl_to_uvd_nl
from keypointfusion_tpu.models.kpfusion import KPFusion


class StreamingEngine:
    """Fixed-batch streaming inference: full frames in, joints out."""

    def __init__(self, cfg: Config, variables: Optional[dict] = None,
                 batch_size: int = 64, img_hw=(480, 640),
                 dtype=jnp.bfloat16, use_pallas_desa: bool = False,
                 use_pallas_sampler: bool = False,
                 pallas_interpret: bool = False,
                 mesh=None):
        """use_pallas_desa routes the eval-path DESA through the
        whole-DESA fused Pallas kernel (kernels/desa_dense_pallas.py);
        use_pallas_sampler fuses the point->pixel sampling
        (kernels/pixel_sampler_pallas.py) — both are the serving-mode
        defaults in bench.py (see docs/DESIGN.md).

        mesh: optional jax.sharding.Mesh for multi-chip serving — the
        whole pipeline (preprocessing + forward) runs SPMD with the batch
        sharded over the mesh's first axis and params replicated; XLA
        partitions every op and no collectives are needed on this purely
        batch-parallel path (the serving counterpart of the training
        mesh in training/train_step.py). batch_size must be divisible by
        the mesh size."""
        if mesh is not None and batch_size % mesh.devices.size:
            raise ValueError(
                f'batch_size {batch_size} not divisible by mesh size '
                f'{mesh.devices.size}')
        self.cfg = cfg
        self.batch_size = batch_size
        self.img_hw = img_hw
        self.model = KPFusion(net=cfg.net, joint_num=cfg.joint_num,
                              dtype=dtype, use_pallas_desa=use_pallas_desa,
                              use_pallas_sampler=use_pallas_sampler,
                              pallas_interpret=pallas_interpret,
                              fast_topk=cfg.fast_topk)

        if variables is None:
            from keypointfusion_tpu.data.synthetic import synthetic_batch
            from keypointfusion_tpu.training.train_step import \
                frame_from_batch
            b = {k: jnp.asarray(v) for k, v in synthetic_batch(
                batch_size=2, point_num=cfg.point_num).items()}
            variables = jax.jit(self.model.init)(
                jax.random.PRNGKey(0), b['rgb'], b['depth'], b['pcl'],
                frame_from_batch(b, cfg))
        self.variables = variables

        kernel = cfg.feature_para[0]
        point_num = cfg.point_num
        img_size = cfg.input_size

        j = cfg.joint_num

        def pipeline(variables, depth_full, rgb_full, centers, cube, cam,
                     key):
            # ingest compact dtypes (uint16 depth mm, uint8 rgb) — host→HBM
            # bandwidth is the streaming bottleneck, so convert on device
            depth_full = depth_full.astype(jnp.float32)
            rgb_full = rgb_full.astype(jnp.float32)
            rgb, depth, pcl, frame = device_preprocess(
                depth_full, rgb_full, centers, cube, cam, key,
                img_size, point_num)
            results, _ = self.model.apply(variables, rgb, depth, pcl,
                                          frame, kernel, False)
            joint_xyz = results[-1]
            joint_uvd = xyz_nl_to_uvd_nl(joint_xyz, frame)
            # world-mm joints
            world = joint_xyz * frame.cube[:, None] / 2.0 \
                + frame.center[:, None]
            # ONE packed output: every host fetch is a round trip over the
            # device link, and three small fetches per batch tripled the
            # per-batch latency floor (measured: the dominant streaming
            # cost on a high-latency link)
            b = world.shape[0]
            return jnp.concatenate(
                [world.reshape(b, -1).astype(jnp.float32),
                 joint_uvd.reshape(b, -1).astype(jnp.float32),
                 frame.M.reshape(b, -1).astype(jnp.float32)], axis=-1)

        self._joint_num = j
        self._mesh = mesh
        if mesh is None:
            self._pipeline = jax.jit(pipeline)
        else:
            from keypointfusion_tpu.parallel.mesh import (
                batch_sharding, replicated_sharding,
            )
            bsh = batch_sharding(mesh)
            rsh = replicated_sharding(mesh)
            # variables + rng key replicated, every [B,...] input and the
            # packed output batch-sharded
            self._pipeline = jax.jit(
                pipeline,
                in_shardings=(rsh, bsh, bsh, bsh, bsh, bsh, rsh),
                out_shardings=bsh)
        self._key = jax.random.PRNGKey(cfg.seed)

    def submit(self, depth_full: np.ndarray, rgb_full: np.ndarray,
               centers: np.ndarray, cube: np.ndarray, cam: np.ndarray):
        """Enqueue one batch (async; returns a packed device future
        [B, 2*3J+9] — world joints | uvd joints | crop M)."""
        self._key, k = jax.random.split(self._key)
        return self._pipeline(self.variables, jnp.asarray(depth_full),
                              jnp.asarray(rgb_full), jnp.asarray(centers),
                              jnp.asarray(cube), jnp.asarray(cam), k)

    def _unpack(self, packed: np.ndarray) -> Dict[str, np.ndarray]:
        j = self._joint_num
        b = packed.shape[0]
        return {'joint_xyz_mm': packed[:, :3 * j].reshape(b, j, 3),
                'joint_uvd': packed[:, 3 * j:6 * j].reshape(b, j, 3),
                'M': packed[:, 6 * j:].reshape(b, 3, 3)}

    def process_stream(self, batches: Iterator[Dict[str, np.ndarray]],
                       depth: int = 8,
                       fetch_workers: int = 6
                       ) -> Iterator[Dict[str, np.ndarray]]:
        """Pipelined streaming: keeps `depth` batches in flight and
        overlaps the host fetches in a small thread pool (device→host
        transfers release the GIL; on a high-latency link the serial
        fetch, not device compute, is the throughput floor). Results are
        yielded in submission order."""
        from concurrent.futures import ThreadPoolExecutor
        buf = collections.deque()
        it = iter(batches)
        with ThreadPoolExecutor(fetch_workers) as pool:
            def enqueue(b):
                fut = self.submit(b['depth'], b['rgb'], b['centers'],
                                  b['cube'], b['cam'])
                buf.append(pool.submit(lambda f: np.asarray(f), fut))
            try:
                for _ in range(depth):
                    enqueue(next(it))
            except StopIteration:
                pass
            for b in it:
                packed = buf.popleft().result()
                enqueue(b)
                yield self._unpack(packed)
            while buf:
                yield self._unpack(buf.popleft().result())
