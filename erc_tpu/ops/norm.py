"""Masked normalization layers.

The reference applies ``nn.BatchNorm1d`` to the *flat list of valid nodes*
(cogmen.py:67,72) — in padded-dense form that is a batch norm whose
statistics are computed over valid positions only, which
``MaskedBatchNorm`` reproduces exactly (biased variance, torch momentum
semantics, running stats for eval)."""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    features: int
    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, mask, use_running_average: bool = False):
        """x: [B, L, F]; mask: [B, L] (1 = valid)."""
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(self.features)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(self.features)
        )
        gamma = self.param("scale", nn.initializers.ones, (self.features,))
        beta = self.param("bias", nn.initializers.zeros, (self.features,))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            m = mask[..., None]
            n = jnp.maximum(m.sum(), 1.0)
            mean = (x * m).sum((0, 1)) / n
            var = (((x - mean) ** 2) * m).sum((0, 1)) / n  # biased, as torch uses for normalization
            if not self.is_initializing():
                # torch tracks *unbiased* variance in running stats
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased

        y = (x - mean) / jnp.sqrt(var + self.eps) * gamma + beta
        return y * mask[..., None]
