"""Pixel-coordinate grids shared by the dense codecs and point-cloud indexers.

The reference builds its coordinate mesh as
    coord_u = 2*(col + 0.5)/S - 1,   coord_v = 2*(row + 0.5)/S - 1
with channel order (u, v) (reference model/model.py:477-482 — note the
reference's `mesh_y` varies along columns, i.e. is the u/x coordinate).
"""

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _uv_grid_np(size: int) -> np.ndarray:
    # cached as concrete numpy (never a traced value — caching jnp arrays
    # built under jit would leak tracers across traces)
    r = (np.arange(size, dtype=np.float32) + 0.5) / size * 2.0 - 1.0
    u = np.broadcast_to(r[None, :], (size, size))
    v = np.broadcast_to(r[:, None], (size, size))
    return np.ascontiguousarray(np.stack([u, v], axis=-1))


def uv_grid(size: int) -> jnp.ndarray:
    """[S, S, 2] grid of normalized (u, v) pixel-center coordinates."""
    return jnp.asarray(_uv_grid_np(int(size)))


def img_uvd_points(depth: jnp.ndarray) -> jnp.ndarray:
    """Depth map [B,H,W,1] → per-pixel normalized uvd points [B,H*W,3]
    (reference loader.py:993-1005)."""
    b, h, w, _ = depth.shape
    assert h == w, "square crops only"
    grid = jnp.broadcast_to(uv_grid(h)[None], (b, h, w, 2))
    uvd = jnp.concatenate([grid, depth], axis=-1)
    return uvd.reshape(b, h * w, 3)
