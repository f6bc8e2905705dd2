"""Matrix-free SVD forward-operator interface.

TPU-native re-design of the reference `H_functions` class
(ref: obs_functions/Hfuncs.py:22-116). Operators are flax PyTreeNodes: their
tensor state (index maps, small SVD factors) are pytree leaves, their shape
metadata are static fields, so an operator can be passed straight into jitted,
vmapped, or shard_mapped functions.

Vector convention (matches the reference): all inputs/outputs of H/Ht/V/Vt/...
are flat `(batch, dim)` arrays flattened from channel-first `(B, C, H, W)`
images. Images elsewhere in this framework are NHWC; use `flatten_image` /
`unflatten_image` at the boundary (a transpose is negligible next to the
U-Net work and keeps the spectral orderings identical to the reference,
which several algorithms — DDRM/DDNM — rely on).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct


def flatten_image(x_nhwc: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, C*H*W) with channel-first flattening order."""
    b = x_nhwc.shape[0]
    return jnp.transpose(x_nhwc, (0, 3, 1, 2)).reshape(b, -1)


def unflatten_image(vec: jnp.ndarray, channels: int, img_dim: int) -> jnp.ndarray:
    """(B, C*H*W) channel-first flat -> (B, H, W, C)."""
    b = vec.shape[0]
    return jnp.transpose(
        vec.reshape(b, channels, img_dim, img_dim), (0, 2, 3, 1)
    )


class Operator(struct.PyTreeNode):
    """Base forward operator: y = H(x) (+ noise). Nonlinear operators override
    `H` / `H_pinv` / `is_linear` directly (ref: Hfuncs.py:318-445)."""

    def H(self, vec: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def H_pinv(self, vec: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def is_linear(self) -> bool:
        return True

    # -- NHWC image-space convenience wrappers ------------------------------
    @property
    def channels(self) -> int:  # overridden by subclasses with static fields
        raise NotImplementedError

    @property
    def img_dim(self) -> int:
        raise NotImplementedError

    def H_img(self, x_nhwc: jnp.ndarray) -> jnp.ndarray:
        """Forward operator applied to an NHWC image batch -> (B, d_y)."""
        return self.H(flatten_image(x_nhwc))

    def H_pinv_img(self, y: jnp.ndarray) -> jnp.ndarray:
        """Pseudo-inverse back to NHWC image space."""
        return unflatten_image(self.H_pinv(y), self.channels, self.img_dim)


class SVDOperator(Operator):
    """Operator with a matrix-free SVD H = U S V^T.

    Subclasses provide V/Vt/U/Ut/singulars/add_zeros; the composite maps are
    derived here exactly as in the reference (Hfuncs.py:65-116).
    """

    def V(self, vec: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def Vt(self, vec: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def U(self, vec: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def Ut(self, vec: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def singulars(self) -> jnp.ndarray:
        """Singular values, shape (rank_dim,) — the 'small' dimension."""
        raise NotImplementedError

    def add_zeros(self, vec: jnp.ndarray) -> jnp.ndarray:
        """Pad a small-dimension vector with trailing zeros to the big dim."""
        raise NotImplementedError

    # -- derived maps -------------------------------------------------------
    def H(self, vec: jnp.ndarray) -> jnp.ndarray:
        temp = self.Vt(vec)
        s = self.singulars()
        return self.U(s * temp[:, : s.shape[0]])

    def Ht(self, vec: jnp.ndarray) -> jnp.ndarray:
        temp = self.Ut(vec)
        s = self.singulars()
        return self.V(self.add_zeros(s * temp[:, : s.shape[0]]))

    def H_pinv(self, vec: jnp.ndarray) -> jnp.ndarray:
        temp = self.Ut(vec)
        s = self.singulars()
        s_inv = jnp.where(s != 0, 1.0 / jnp.where(s != 0, s, 1.0), 0.0)
        temp = temp.at[:, : s.shape[0]].multiply(s_inv)
        return self.V(self.add_zeros(temp))

    def H_scaled_inv(self, vec: jnp.ndarray, scale) -> jnp.ndarray:
        """(H H^T + scale^2 I)^{-1} in U-space, for PiGDM
        (ref: Hfuncs.py:92-100)."""
        temp = self.Ut(vec)
        s = self.singulars()
        rescale = 1.0 / (s**2 + scale**2)
        return temp.at[:, : rescale.shape[0]].multiply(rescale)

    def H_dmps_guidance(self, vec, y, at, sigma_y) -> jnp.ndarray:
        """Closed-form pseudo-likelihood score for DMPS
        (ref: Hfuncs.py:102-113)."""
        temp = y - self.H(vec) / jnp.sqrt(at)
        temp = self.Ut(temp)
        s = self.singulars()
        rescale = 1.0 / ((1 - at) / at * s**2 + sigma_y**2)
        rescale = jnp.where(
            (sigma_y == 0) & (s == 0), 0.0, rescale
        )
        temp = temp.at[:, : rescale.shape[0]].multiply(rescale * s)
        return self.V(self.add_zeros(temp)) / jnp.sqrt(at)
