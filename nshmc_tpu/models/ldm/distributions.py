"""Diagonal Gaussian posterior + EMA parameter averaging.

Re-designs of the reference utilities
(ref: ldm/modules/distributions/distributions.py:24-76
DiagonalGaussianDistribution; ldm/modules/ema.py:4-76 LitEma). Upstream
these sit on the KL-autoencoder / use_ema paths; provided here for
completeness of the LDM stack.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DiagonalGaussian(NamedTuple):
    """Posterior from a [mean | logvar] moment tensor (last-axis split)."""

    mean: jnp.ndarray
    logvar: jnp.ndarray

    @classmethod
    def from_moments(cls, moments: jnp.ndarray, clip: tuple = (-30.0, 20.0)):
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return cls(mean, jnp.clip(logvar, *clip))

    @property
    def std(self):
        return jnp.exp(0.5 * self.logvar)

    @property
    def var(self):
        return jnp.exp(self.logvar)

    def sample(self, key):
        return self.mean + self.std * jax.random.normal(
            key, self.mean.shape, self.mean.dtype
        )

    def mode(self):
        return self.mean

    def kl(self, other: "DiagonalGaussian | None" = None):
        """KL to `other` (or the standard normal), summed over non-batch
        axes (ref: distributions.py:47-60)."""
        axes = tuple(range(1, self.mean.ndim))
        if other is None:
            return 0.5 * jnp.sum(
                self.mean**2 + self.var - 1.0 - self.logvar, axis=axes
            )
        return 0.5 * jnp.sum(
            (self.mean - other.mean) ** 2 / other.var
            + self.var / other.var - 1.0 - self.logvar + other.logvar,
            axis=axes,
        )

    def nll(self, sample):
        axes = tuple(range(1, self.mean.ndim))
        log2pi = jnp.log(2.0 * jnp.pi)
        return 0.5 * jnp.sum(
            log2pi + self.logvar + (sample - self.mean) ** 2 / self.var,
            axis=axes,
        )


def ema_update(ema_params, params, decay: float = 0.9999):
    """One EMA step over a parameter pytree (ref: ldm/modules/ema.py:29-39:
    ema <- ema - (1 - decay) * (ema - param))."""
    return jax.tree.map(
        lambda e, p: e - (1.0 - decay) * (e - p), ema_params, params
    )
