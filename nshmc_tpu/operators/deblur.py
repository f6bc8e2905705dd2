"""Separable-convolution SVD operators: Gaussian / anisotropic deblurring and
strided-convolution super-resolution.

Re-designs of the reference operators (cites into obs_functions/Hfuncs.py):
  Deblurring   (Hfuncs.py:236-316) — separable 1D conv, Kronecker SVD
  Deblurring2D (Hfuncs.py:448-525) — anisotropic separable conv
  SRConv       (Hfuncs.py:527-609) — strided conv with reflective padding

The 1D conv matrices are built and SVD'd host-side in NumPy at construction;
runtime applies are batched einsums that XLA maps onto the MXU.

DEVIATION (documented): the reference `Deblurring.singulars()` tiles the
sorted Kronecker singulars as [s, s, s] (Hfuncs.py:236 `repeat(1,3)`) while
its V/Vt use a pixel-major coefficient layout — the combination channel-mixes
and its H is NOT the true separable blur (verified numerically). Here the
spectral layout is channel-major with per-channel tiled singulars, which is
internally consistent AND equals the exact separable convolution. All
spectral-domain algorithms (DDRM/DDNM/...) are invariant to the layout choice
as long as V/Vt/singulars agree, which they do here.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from .base import SVDOperator


def _conv1d_matrix(kernel: np.ndarray, img_dim: int) -> np.ndarray:
    """Dense 1D convolution matrix with zero padding
    (ref: Hfuncs.py:244-250)."""
    k = np.asarray(kernel, np.float64)
    h = np.zeros((img_dim, img_dim))
    half = k.shape[0] // 2
    for i in range(img_dim):
        for j in range(i - half, i + half):
            if 0 <= j < img_dim:
                h[i, j] = k[j - i + half]
    return h


def _srconv_matrix(kernel: np.ndarray, img_dim: int, stride: int) -> np.ndarray:
    """Strided 1D conv matrix with reflective padding (ref: Hfuncs.py:537-549)."""
    k = np.asarray(kernel, np.float64)
    small = img_dim // stride
    h = np.zeros((small, img_dim))
    half = k.shape[0] // 2
    for i in range(stride // 2, img_dim + stride // 2, stride):
        for j in range(i - half, i + half):
            j_eff = j
            if j_eff < 0:
                j_eff = -j_eff - 1
            if j_eff >= img_dim:
                j_eff = (img_dim - 1) - (j_eff - img_dim)
            h[i // stride, j_eff] += k[j - i + half]
    return h


class _SeparableDeblur(SVDOperator):
    """Shared machinery for separable-conv SVD operators on square images.

    H(x) = U1 @ X @ U2^T applied after spectral scaling; spectral layout is
    channel-major: flat index = c * d^2 + spectral_pixel (sorted descending
    by singular value via `perm`).
    """

    u1: jnp.ndarray
    u2: jnp.ndarray
    v1: jnp.ndarray
    v2: jnp.ndarray
    sing_sorted: jnp.ndarray  # (d^2,) descending
    perm: jnp.ndarray  # spectral sort permutation (gather for Vt)
    inv_perm: jnp.ndarray  # inverse permutation (gather for V)
    _channels: int = struct.field(pytree_node=False)
    _img_dim: int = struct.field(pytree_node=False)

    @property
    def channels(self):
        return self._channels

    @property
    def img_dim(self):
        return self._img_dim

    def _img(self, vec):
        b = vec.shape[0]
        d = self._img_dim
        return vec.reshape(b, self._channels, d, d)

    def V(self, vec):
        b = vec.shape[0]
        d = self._img_dim
        spec = vec.reshape(b, self._channels, d * d)[:, :, self.inv_perm]
        x = spec.reshape(b, self._channels, d, d)
        out = jnp.einsum("ij,bcjk,lk->bcil", self.v1, x, self.v2)
        return out.reshape(b, -1)

    def Vt(self, vec):
        b = vec.shape[0]
        x = self._img(vec)
        spec = jnp.einsum("ji,bcjk,kl->bcil", self.v1, x, self.v2)
        spec = spec.reshape(b, self._channels, -1)[:, :, self.perm]
        return spec.reshape(b, -1)

    def U(self, vec):
        b = vec.shape[0]
        d = self._img_dim
        spec = vec.reshape(b, self._channels, d * d)[:, :, self.inv_perm]
        x = spec.reshape(b, self._channels, d, d)
        out = jnp.einsum("ij,bcjk,lk->bcil", self.u1, x, self.u2)
        return out.reshape(b, -1)

    def Ut(self, vec):
        b = vec.shape[0]
        x = self._img(vec)
        spec = jnp.einsum("ji,bcjk,kl->bcil", self.u1, x, self.u2)
        spec = spec.reshape(b, self._channels, -1)[:, :, self.perm]
        return spec.reshape(b, -1)

    def singulars(self):
        return jnp.tile(self.sing_sorted, self._channels)

    def add_zeros(self, vec):
        return vec.reshape(vec.shape[0], -1)


def _build_separable(k1, k2, channels, img_dim, zero_thresh=3e-2):
    h1 = _conv1d_matrix(k1, img_dim)
    h2 = _conv1d_matrix(k2, img_dim)
    u1, s1, v1t = np.linalg.svd(h1, full_matrices=True)
    u2, s2, v2t = np.linalg.svd(h2, full_matrices=True)
    s1 = np.where(s1 < zero_thresh, 0.0, s1)
    s2 = np.where(s2 < zero_thresh, 0.0, s2)
    sing = np.outer(s1, s2).reshape(-1)
    order = np.argsort(-sing, kind="stable")
    inv = np.empty_like(order)
    inv[order] = np.arange(order.shape[0])
    return dict(
        u1=jnp.asarray(u1, jnp.float32),
        u2=jnp.asarray(u2, jnp.float32),
        v1=jnp.asarray(v1t.T, jnp.float32),
        v2=jnp.asarray(v2t.T, jnp.float32),
        sing_sorted=jnp.asarray(sing[order], jnp.float32),
        perm=jnp.asarray(order, jnp.int32),
        inv_perm=jnp.asarray(inv, jnp.int32),
        _channels=channels,
        _img_dim=img_dim,
    )


class Deblurring(_SeparableDeblur):
    """Isotropic separable deblurring (ref: Hfuncs.py:236-316)."""

    @classmethod
    def create(cls, kernel, channels: int, img_dim: int, zero_thresh: float = 3e-2):
        kernel = np.asarray(kernel, np.float64)
        kernel = kernel / kernel.sum()
        return cls(**_build_separable(kernel, kernel, channels, img_dim, zero_thresh))

    @classmethod
    def gaussian(cls, channels: int = 3, img_dim: int = 256, sigma: float = 10.0):
        """5-tap Gaussian kernel as in the reference run config
        (ref: main_sampling.py:308-314)."""
        xs = np.arange(-2, 3, dtype=np.float64)
        k = np.exp(-0.5 * (xs / sigma) ** 2)
        return cls.create(k, channels, img_dim)


class Deblurring2D(_SeparableDeblur):
    """Anisotropic separable deblurring: kernel1 along rows, kernel2 along
    columns (ref: Hfuncs.py:448-525)."""

    @classmethod
    def create(cls, kernel1, kernel2, channels: int, img_dim: int, zero_thresh: float = 3e-2):
        k1 = np.asarray(kernel1, np.float64)
        k2 = np.asarray(kernel2, np.float64)
        return cls(
            **_build_separable(k1 / k1.sum(), k2 / k2.sum(), channels, img_dim, zero_thresh)
        )

    @classmethod
    def aniso(cls, channels: int = 3, img_dim: int = 256):
        """9-tap sigma=1 x sigma=20 anisotropic pair
        (ref: main_sampling.py:327-335)."""
        xs = np.arange(-4, 5, dtype=np.float64)
        k1 = np.exp(-0.5 * (xs / 1.0) ** 2)
        k2 = np.exp(-0.5 * (xs / 20.0) ** 2)
        return cls.create(k1, k2, channels, img_dim)


class _ReferenceLayoutMixin:
    """Pixel-major spectral layout with the reference's tiled singulars —
    bit-compatible with obs_functions/Hfuncs.py Deblurring/Deblurring2D
    (including their channel-mixing H; see module docstring). Use only when
    exact parity with upstream measurements is required.

    NOTE: because the layout misaligns singulars with coefficients, the
    resulting operator depends on the exact SVD basis — use
    `create_with_factors` with factors from the same SVD routine as the
    run being reproduced (torch.svd for upstream measurements).
    """

    @classmethod
    def create_with_factors(cls, u1, s1, v1, u2, s2, v2, channels, img_dim,
                            zero_thresh: float = 3e-2, order=None):
        """Build from explicit 1D-conv SVD factors (u @ diag(s) @ v.T).
        `order` optionally injects the descending-sort permutation (the
        misaligned layout is tie-break-sensitive; pass torch's sort indices
        to reproduce upstream exactly)."""
        s1 = np.where(np.asarray(s1) < zero_thresh, 0.0, s1)
        s2 = np.where(np.asarray(s2) < zero_thresh, 0.0, s2)
        sing = np.outer(s1, s2).reshape(-1)
        order = np.asarray(order) if order is not None \
            else np.argsort(-sing, kind="stable")
        inv = np.empty_like(order)
        inv[order] = np.arange(order.shape[0])
        return cls(
            u1=jnp.asarray(u1, jnp.float32),
            u2=jnp.asarray(u2, jnp.float32),
            v1=jnp.asarray(v1, jnp.float32),
            v2=jnp.asarray(v2, jnp.float32),
            sing_sorted=jnp.asarray(sing[order], jnp.float32),
            perm=jnp.asarray(order, jnp.int32),
            inv_perm=jnp.asarray(inv, jnp.int32),
            _channels=channels,
            _img_dim=img_dim,
        )

    def V(self, vec):
        b = vec.shape[0]
        d = self._img_dim
        spec = vec.reshape(b, d * d, self._channels)[:, self.inv_perm, :]
        x = spec.transpose(0, 2, 1).reshape(b, self._channels, d, d)
        out = jnp.einsum("ij,bcjk,lk->bcil", self.v1, x, self.v2)
        return out.reshape(b, -1)

    def Vt(self, vec):
        b = vec.shape[0]
        d = self._img_dim
        x = vec.reshape(b, self._channels, d, d)
        spec = jnp.einsum("ji,bcjk,kl->bcil", self.v1, x, self.v2)
        spec = spec.reshape(b, self._channels, -1)[:, :, self.perm]
        return spec.transpose(0, 2, 1).reshape(b, -1)

    def U(self, vec):
        b = vec.shape[0]
        d = self._img_dim
        spec = vec.reshape(b, d * d, self._channels)[:, self.inv_perm, :]
        x = spec.transpose(0, 2, 1).reshape(b, self._channels, d, d)
        out = jnp.einsum("ij,bcjk,lk->bcil", self.u1, x, self.u2)
        return out.reshape(b, -1)

    def Ut(self, vec):
        b = vec.shape[0]
        d = self._img_dim
        x = vec.reshape(b, self._channels, d, d)
        spec = jnp.einsum("ji,bcjk,kl->bcil", self.u1, x, self.u2)
        spec = spec.reshape(b, self._channels, -1)[:, :, self.perm]
        return spec.transpose(0, 2, 1).reshape(b, -1)


class DeblurringReferenceLayout(_ReferenceLayoutMixin, Deblurring):
    """Deblurring with the reference's exact (pixel-major) spectral layout
    and `[s, s, s]`-tiled singulars (Hfuncs.py:283-305)."""


class Deblurring2DReferenceLayout(_ReferenceLayoutMixin, Deblurring2D):
    """Deblurring2D with the reference's exact spectral layout
    (Hfuncs.py:489-525)."""


class SRConv(SVDOperator):
    """Strided-convolution super-resolution with reflective padding
    (ref: Hfuncs.py:527-609). Spectral layout is pixel-major (matching the
    reference, which is internally consistent here): the first small_dim^2
    spectral pixels carry the rank block, mapped into the top-left block of
    the image grid by `perm` (the P_1 permutation of DDRM Appendix D.5).
    """

    u_small: jnp.ndarray  # (small, small)
    v_small: jnp.ndarray  # (d, d)
    sing: jnp.ndarray  # (small^2,)
    full_perm: jnp.ndarray  # (d^2,)
    inv_full_perm: jnp.ndarray
    _channels: int = struct.field(pytree_node=False)
    _img_dim: int = struct.field(pytree_node=False)
    _ratio: int = struct.field(pytree_node=False)

    @property
    def channels(self):
        return self._channels

    @property
    def img_dim(self):
        return self._img_dim

    @property
    def small_dim(self):
        return self._img_dim // self._ratio

    @classmethod
    def create(cls, kernel, channels: int, img_dim: int, stride: int,
               zero_thresh: float = 3e-2):
        kernel = np.asarray(kernel, np.float64)
        h = _srconv_matrix(kernel, img_dim, stride)
        u, s, vt = np.linalg.svd(h, full_matrices=True)
        s = np.where(s < zero_thresh, 0.0, s)
        small = img_dim // stride
        sing = np.outer(s, s).reshape(-1)
        # P_1: spectral pixel (i, j), i < small, maps to image position d*i+j
        perm = np.asarray(
            [img_dim * i + j for i in range(small) for j in range(small)]
            + [img_dim * i + j for i in range(small) for j in range(small, img_dim)],
            np.int64,
        )
        full_perm = np.arange(img_dim**2)
        full_perm[: perm.shape[0]] = perm
        inv = np.empty_like(full_perm)
        inv[full_perm] = np.arange(img_dim**2)
        return cls(
            u_small=jnp.asarray(u, jnp.float32),
            v_small=jnp.asarray(vt.T, jnp.float32),
            sing=jnp.asarray(sing, jnp.float32),
            full_perm=jnp.asarray(full_perm, jnp.int32),
            inv_full_perm=jnp.asarray(inv, jnp.int32),
            _channels=channels,
            _img_dim=img_dim,
            _ratio=stride,
        )

    @classmethod
    def bicubic(cls, channels: int, img_dim: int, factor: int):
        """Bicubic downsampling kernel (ref: main_sampling.py:266-283)."""

        def bicubic_kernel(x, a=-0.5):
            ax = abs(x)
            if ax <= 1:
                return (a + 2) * ax**3 - (a + 3) * ax**2 + 1
            elif 1 < ax < 2:
                return a * ax**3 - 5 * a * ax**2 + 8 * a * ax - 4 * a
            return 0.0

        k = np.zeros(factor * 4)
        for i in range(factor * 4):
            x = (1 / factor) * (i - np.floor(factor * 4 / 2) + 0.5)
            k[i] = bicubic_kernel(x)
        k = k / k.sum()
        return cls.create(k, channels, img_dim, stride=factor)

    def V(self, vec):
        b = vec.shape[0]
        d = self._img_dim
        spec = vec.reshape(b, d * d, self._channels)[:, self.inv_full_perm, :]
        x = spec.transpose(0, 2, 1).reshape(b, self._channels, d, d)
        out = jnp.einsum("ij,bcjk,lk->bcil", self.v_small, x, self.v_small)
        return out.reshape(b, -1)

    def Vt(self, vec):
        b = vec.shape[0]
        d = self._img_dim
        x = vec.reshape(b, self._channels, d, d)
        spec = jnp.einsum("ji,bcjk,kl->bcil", self.v_small, x, self.v_small)
        spec = spec.reshape(b, self._channels, d * d)[:, :, self.full_perm]
        return spec.transpose(0, 2, 1).reshape(b, -1)

    def U(self, vec):
        b = vec.shape[0]
        s = self.small_dim
        x = vec.reshape(b, s * s, self._channels).transpose(0, 2, 1)
        x = x.reshape(b, self._channels, s, s)
        out = jnp.einsum("ij,bcjk,lk->bcil", self.u_small, x, self.u_small)
        return out.reshape(b, -1)

    def Ut(self, vec):
        b = vec.shape[0]
        s = self.small_dim
        x = vec.reshape(b, self._channels, s, s)
        spec = jnp.einsum("ji,bcjk,kl->bcil", self.u_small, x, self.u_small)
        return spec.reshape(b, self._channels, s * s).transpose(0, 2, 1).reshape(b, -1)

    def singulars(self):
        return jnp.repeat(self.sing, self._channels)

    def add_zeros(self, vec):
        b = vec.shape[0]
        out = jnp.zeros((b, vec.shape[1] * self._ratio**2), vec.dtype)
        return out.at[:, : vec.shape[1]].set(vec.reshape(b, -1))
