"""Walsh-Hadamard compressive sensing operator.

Re-design of the reference `WalshHadamardCS` (ref: obs_functions/Hfuncs.py:611-653).
The in-place butterfly FWHT loop becomes a statically-unrolled, fully
vectorized log2(n) reshape/stack ladder that XLA fuses into a handful of VPU
passes (the transform is orthonormal and self-inverse with the reference's
1/img_dim scaling).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from .base import SVDOperator


def fwht(a: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Fast Walsh-Hadamard transform over the last axis (power-of-2 length),
    multiplied by `scale`. Matches obs_functions/Hfuncs.py:612-622 with
    scale = 1/img_dim (orthonormal, self-inverse)."""
    n = a.shape[-1]
    assert n & (n - 1) == 0, "FWHT length must be a power of 2"
    h = 1
    while h < n:
        x = a.reshape(a.shape[:-1] + (-1, 2, h))
        lo = x[..., 0, :] + x[..., 1, :]
        hi = x[..., 0, :] - x[..., 1, :]
        a = jnp.stack([lo, hi], axis=-2).reshape(a.shape)
        h *= 2
    return a * scale


class WalshHadamardCS(SVDOperator):
    """Subsampled Walsh-Hadamard measurement: keep the first D/ratio permuted
    Hadamard coefficients (all singular values 1). Spectral layout is
    pixel-major, matching the reference."""

    perm: jnp.ndarray  # (d^2,) permutation of Hadamard coefficients
    inv_perm: jnp.ndarray
    _channels: int = struct.field(pytree_node=False)
    _img_dim: int = struct.field(pytree_node=False)
    _ratio: int = struct.field(pytree_node=False)

    @property
    def channels(self):
        return self._channels

    @property
    def img_dim(self):
        return self._img_dim

    @classmethod
    def create(cls, channels: int, img_dim: int, ratio: int, perm) -> "WalshHadamardCS":
        perm = np.asarray(perm, np.int64)
        inv = np.empty_like(perm)
        inv[perm] = np.arange(perm.shape[0])
        return cls(
            perm=jnp.asarray(perm, jnp.int32),
            inv_perm=jnp.asarray(inv, jnp.int32),
            _channels=channels,
            _img_dim=img_dim,
            _ratio=ratio,
        )

    def _fwht(self, img):
        return fwht(img, 1.0 / self._img_dim)

    def V(self, vec):
        b = vec.shape[0]
        coeffs = vec.reshape(b, -1, self._channels).transpose(0, 2, 1)
        coeffs = coeffs[:, :, self.inv_perm]
        return self._fwht(coeffs).reshape(b, -1)

    def Vt(self, vec):
        b = vec.shape[0]
        img = vec.reshape(b, self._channels, -1)
        coeffs = self._fwht(img)[:, :, self.perm]
        return coeffs.transpose(0, 2, 1).reshape(b, -1)

    def U(self, vec):
        return vec.reshape(vec.shape[0], -1)

    Ut = U

    def singulars(self):
        return jnp.ones(self._channels * self._img_dim**2 // self._ratio, jnp.float32)

    def add_zeros(self, vec):
        b = vec.shape[0]
        out = jnp.zeros((b, self._channels * self._img_dim**2), vec.dtype)
        return out.at[:, : vec.shape[1]].set(vec.reshape(b, -1))
