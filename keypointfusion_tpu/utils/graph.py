"""Skeleton graph utilities (reference util/graph_util.py — GCN leftovers,
unused by the flagship path but part of the inventory)."""

from __future__ import annotations

import numpy as np


def adj_matrix_from_edges(num_joints: int, edges, sparse: bool = False):
    """Symmetric normalized adjacency from an edge list
    (graph_util.py:27, adj_mx_from_edges)."""
    a = np.zeros((num_joints, num_joints), np.float32)
    for i, j in edges:
        a[i, j] = 1.0
        a[j, i] = 1.0
    a += np.eye(num_joints, dtype=np.float32)
    d = a.sum(1)
    d_inv_sqrt = 1.0 / np.sqrt(np.maximum(d, 1e-12))
    norm = a * d_inv_sqrt[:, None] * d_inv_sqrt[None, :]
    if sparse:
        import scipy.sparse as sp
        return sp.csr_matrix(norm)
    return norm


def hand_adjacency(num_joints: int = 21) -> np.ndarray:
    """Adjacency of the MANO-order hand skeleton (utils/vis.py)."""
    from keypointfusion_tpu.utils.vis import HAND_SKELETON
    return adj_matrix_from_edges(num_joints, HAND_SKELETON)
