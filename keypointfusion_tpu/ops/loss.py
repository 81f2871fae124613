"""Losses (reference model/loss.py:3-27)."""

import jax.numpy as jnp


def smooth_l1_loss(x, y, size_average: bool = True):
    """Smooth-L1 with a 0.01 knee: 0.5*z^2 inside, 0.01*(|z|-0.005) outside.

    Matches the reference `SmoothL1Loss` exactly (its per-last-dim means of
    two disjointly masked terms reduce to one elementwise mean)."""
    z = (x - y).astype(jnp.float32)
    az = jnp.abs(z)
    per_elem = jnp.where(az < 0.01, 0.5 * z * z, 0.01 * (az - 0.005))
    per_row = jnp.mean(per_elem, axis=-1)
    return jnp.mean(per_row) if size_average else jnp.sum(per_row)
