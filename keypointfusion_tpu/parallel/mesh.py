"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's torch.nn.DataParallel (reference train.py:81, demo_RGBD.py:49).

KPFusion is a small-activation CNN pipeline over 128x128 crops, so the
scaling axis is the batch: a 1-D mesh with batch-axis sharding. Under jit,
XLA inserts the gradient all-reduce over ICI automatically; BatchNorm
statistics become global-batch (sync-BN) because reductions follow SPMD
semantics — a quality upgrade over the reference's per-GPU BN, noted in
SURVEY.md §5.8 (parity-exact per-shard BN would require shard_map; exposed
via Config.sync_batchnorm for future use).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None,
              axis: str = 'data') -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def auto_mesh(batch_size: int, axis: str = 'data') -> Mesh:
    """Largest mesh (<= available devices) whose size divides batch_size —
    keeps batch-axis sharding legal for any configured batch."""
    ndev = len(jax.devices())
    n = max(d for d in range(1, ndev + 1) if batch_size % d == 0)
    return make_mesh(n, axis)


def batch_sharding(mesh: Mesh, axis: str = None) -> NamedSharding:
    return NamedSharding(mesh, P(axis or mesh.axis_names[0]))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def stacked_batch_sharding(mesh: Mesh, axis: str = None) -> NamedSharding:
    """Sharding for [G, B, ...] step-stacked batches (make_train_step_scan):
    the scan axis G is unsharded, the batch axis B sharded over the mesh."""
    return NamedSharding(mesh, P(None, axis or mesh.axis_names[0]))


def shard_batch(batch, mesh: Mesh, axis: str = None):
    """Place every [B, ...] array in the pytree with its batch dim sharded
    over the mesh."""
    sh = batch_sharding(mesh, axis or mesh.axis_names[0])
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
