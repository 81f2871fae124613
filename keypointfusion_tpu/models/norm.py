"""BatchNorm with torch's exact running-statistics semantics.

torch.nn.BatchNorm2d normalizes with the BIASED batch variance but updates
the running variance with the UNBIASED one (Bessel n/(n-1) correction);
flax's nn.BatchNorm stores the biased variance. The difference is
var/(n-1) per update — small, but it is a silent divergence from the
reference's training dynamics (caught by
tests/test_training_dynamics_parity.py::test_batchnorm_running_stat_update_parity)
and it compounds over an epoch, so eval-mode outputs drift from a
reference-trained model's. This module replicates torch exactly.

Drop-in for nn.BatchNorm: same param ('scale','bias') and batch_stats
('mean','var') structure, so checkpoints and the torch converter are
unaffected. momentum follows the flax convention (decay of the OLD value:
new = momentum*old + (1-momentum)*batch), i.e. momentum=0.9 == torch's
momentum=0.1.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn


class TorchBatchNorm(nn.Module):
    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        features = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (features,),
                           jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (features,),
                          jnp.float32)
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((features,), jnp.float32))

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axes)
            # biased variance for normalization (torch semantics)
            var = jnp.mean(jnp.square(xf - mean), axes)
            if not self.is_initializing():
                n = x.size // features
                bessel = n / max(n - 1, 1)
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1. - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1. - self.momentum) * var * bessel)

        dtype = self.dtype or x.dtype
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return y.astype(dtype)


class WeightedTorchBatchNorm(nn.Module):
    """TorchBatchNorm over a WEIGHTED multiset: training statistics use
    sum(w·x)/sum(w) with Bessel correction n = sum(w). Same param and
    batch_stats tree as TorchBatchNorm ('scale','bias' / 'mean','var'), so
    it is checkpoint- and converter-compatible.

    Used by the dense DESA training path (models/desa.py): the gather
    formulation's BatchNorms see a [B,J,S,C] tensor whose slots are the
    first-S-in-ball points plus out-of-ball fill slots — the dense
    formulation reproduces the exact same statistics by weighting each
    support point with its slot multiplicity (every group contributes
    exactly S weight)."""
    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x, weights=None):
        """x [..., C]; weights broadcastable to x.shape[:-1] (None = all
        ones, reducing to plain TorchBatchNorm)."""
        features = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (features,),
                           jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (features,),
                          jnp.float32)
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((features,), jnp.float32))

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            if weights is None:
                n = x.size // features
                mean = jnp.mean(xf, axes)
                var = jnp.mean(jnp.square(xf - mean), axes)
            else:
                w = jax.lax.stop_gradient(
                    jnp.broadcast_to(weights, x.shape[:-1])
                    .astype(jnp.float32))[..., None]
                n = jnp.sum(w)
                mean = jnp.sum(w * xf, axes) / n
                var = jnp.sum(w * jnp.square(xf - mean), axes) / n
            if not self.is_initializing():
                bessel = n / jnp.maximum(n - 1, 1)
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1. - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1. - self.momentum) * var * bessel)

        dtype = self.dtype or x.dtype
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return y.astype(dtype)
