"""Explicit-matrix SVD operator.

Capability re-homed from the reference's dead `GeneralH`
(ref: functions/svd_replacement.py:94-130, never imported by the mains): any
dense H gets a host-side SVD and matrix-free-style U/V applies. Primarily
used by the test-suite as ground truth for the structured operators.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from .base import SVDOperator


class GeneralH(SVDOperator):
    """Arbitrary dense measurement matrix H (m x n), SVD'd at construction."""

    u_mat: jnp.ndarray  # (m, m)
    v_mat: jnp.ndarray  # (n, n)
    sing: jnp.ndarray  # (min(m, n),)
    _channels: int = struct.field(pytree_node=False)
    _img_dim: int = struct.field(pytree_node=False)

    @property
    def channels(self):
        return self._channels

    @property
    def img_dim(self):
        return self._img_dim

    @classmethod
    def create(cls, h_mat, channels: int = 0, img_dim: int = 0) -> "GeneralH":
        h = np.asarray(h_mat, np.float64)
        u, s, vt = np.linalg.svd(h, full_matrices=True)
        return cls(
            u_mat=jnp.asarray(u, jnp.float32),
            v_mat=jnp.asarray(vt.T, jnp.float32),
            sing=jnp.asarray(s, jnp.float32),
            _channels=channels,
            _img_dim=img_dim,
        )

    def V(self, vec):
        return vec.reshape(vec.shape[0], -1) @ self.v_mat.T

    def Vt(self, vec):
        return vec.reshape(vec.shape[0], -1) @ self.v_mat

    def U(self, vec):
        return vec.reshape(vec.shape[0], -1) @ self.u_mat.T

    def Ut(self, vec):
        return vec.reshape(vec.shape[0], -1) @ self.u_mat

    def singulars(self):
        return self.sing

    def add_zeros(self, vec):
        b = vec.shape[0]
        out = jnp.zeros((b, self.v_mat.shape[0]), vec.dtype)
        return out.at[:, : vec.shape[1]].set(vec.reshape(b, -1))
