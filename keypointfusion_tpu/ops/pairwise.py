"""Pairwise squared distances as a single MXU matmul with f32 accumulation.

The ||a||^2 + ||b||^2 - 2ab form turns the O(N*M*3) distance field into one
batched matmul; precision is pinned to HIGHEST because neighbor selection and
1/d weights are numerically sensitive (default TPU matmul precision is
bfloat16-based).
"""

import jax
import jax.numpy as jnp


def pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a [B,N,3], b [B,M,3] → [B,N,M] squared Euclidean distances (>= 0)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    d2 = (jnp.sum(a ** 2, -1)[:, :, None]
          + jnp.sum(b ** 2, -1)[:, None, :]
          - 2.0 * jnp.einsum('bnc,bmc->bnm', a, b,
                             precision=jax.lax.Precision.HIGHEST))
    return jnp.maximum(d2, 0.0)
