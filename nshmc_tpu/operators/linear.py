"""Pixel-selection and per-pixel-SVD linear operators.

TPU-native re-designs of the reference operators (file:line cites into
/root/reference/obs_functions/Hfuncs.py):
  Inpainting      (Hfuncs.py:119-155)  — index permutation SVD
  Denoising       (Hfuncs.py:157-178)  — identity
  SuperResolution (Hfuncs.py:180-234)  — r x r block averaging, patch SVD
  Colorization    (Hfuncs.py:655-696)  — per-pixel 1x3 averaging SVD

All use static gather/scatter index maps and reshape/einsum patterns that XLA
lowers to cheap vectorized memory ops — no Python loops over pixels.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from .base import SVDOperator


class Inpainting(SVDOperator):
    """Pixel masking. Spectral (V) space orders kept pixels first, missing
    last; all singular values are 1 (ref: Hfuncs.py:119-155).

    Index convention: `missing_indices` / `kept_indices` index the pixel-major
    interleaved flattening idx = (pixel * channels + channel), matching the
    reference's `3 * randperm(d^2) + c` construction (main_sampling.py:302-305).
    """

    missing_indices: jnp.ndarray
    kept_indices: jnp.ndarray
    _channels: int = struct.field(pytree_node=False)
    _img_dim: int = struct.field(pytree_node=False)

    @property
    def channels(self):
        return self._channels

    @property
    def img_dim(self):
        return self._img_dim

    @classmethod
    def create(cls, channels: int, img_dim: int, missing_indices) -> "Inpainting":
        missing = np.asarray(missing_indices, np.int32)
        total = channels * img_dim**2
        keep_mask = np.ones(total, bool)
        keep_mask[missing] = False
        kept = np.nonzero(keep_mask)[0].astype(np.int32)
        return cls(
            missing_indices=jnp.asarray(missing),
            kept_indices=jnp.asarray(kept),
            _channels=channels,
            _img_dim=img_dim,
        )

    def _to_pixel_major(self, vec):
        b = vec.shape[0]
        return (
            vec.reshape(b, self._channels, -1).transpose(0, 2, 1).reshape(b, -1)
        )

    def _from_pixel_major(self, vec):
        b = vec.shape[0]
        return (
            vec.reshape(b, -1, self._channels).transpose(0, 2, 1).reshape(b, -1)
        )

    def V(self, vec):
        b = vec.shape[0]
        temp = vec.reshape(b, -1)
        n_kept = self.kept_indices.shape[0]
        out = jnp.zeros_like(temp)
        out = out.at[:, self.kept_indices].set(temp[:, :n_kept])
        out = out.at[:, self.missing_indices].set(temp[:, n_kept:])
        return self._from_pixel_major(out)

    def Vt(self, vec):
        temp = self._to_pixel_major(vec)
        return jnp.concatenate(
            [temp[:, self.kept_indices], temp[:, self.missing_indices]], axis=1
        )

    def U(self, vec):
        return vec.reshape(vec.shape[0], -1)

    def Ut(self, vec):
        return vec.reshape(vec.shape[0], -1)

    def singulars(self):
        return jnp.ones(self.kept_indices.shape[0], jnp.float32)

    def add_zeros(self, vec):
        b = vec.shape[0]
        total = self._channels * self._img_dim**2
        out = jnp.zeros((b, total), vec.dtype)
        return out.at[:, : vec.shape[1]].set(vec)


def random_inpainting_indices(key, img_dim: int, frac_missing: float = 0.92):
    """Random-pixel inpainting mask, all channels of a chosen pixel dropped
    (ref: main_sampling.py:302-305)."""
    n_missing = int(img_dim**2 * frac_missing)
    perm = jax.random.permutation(key, img_dim**2)[:n_missing]
    missing_r = 3 * perm
    return np.sort(
        np.concatenate(
            [np.asarray(missing_r), np.asarray(missing_r + 1), np.asarray(missing_r + 2)]
        )
    )


def box_inpainting_indices(img_dim: int, channels: int, left: int, up: int, size: int = 128):
    """Box inpainting: the reference drops the pixels *outside* nonzero of the
    box mask? No — it keeps indices where mask==1 as `missing`
    (ref: main_sampling.py:290-298): the box region is missing."""
    mask = np.zeros((img_dim, img_dim, channels), np.float32)
    mask[left : left + size, up : up + size, :] = 1.0
    return np.nonzero(mask.reshape(-1))[0].astype(np.int32)


class Denoising(SVDOperator):
    """Identity operator (ref: Hfuncs.py:157-178)."""

    _channels: int = struct.field(pytree_node=False)
    _img_dim: int = struct.field(pytree_node=False)

    @property
    def channels(self):
        return self._channels

    @property
    def img_dim(self):
        return self._img_dim

    @classmethod
    def create(cls, channels: int, img_dim: int) -> "Denoising":
        return cls(_channels=channels, _img_dim=img_dim)

    def V(self, vec):
        return vec.reshape(vec.shape[0], -1)

    Vt = V
    U = V
    Ut = V
    add_zeros = V

    def singulars(self):
        return jnp.ones(self._channels * self._img_dim**2, jnp.float32)


class SuperResolution(SVDOperator):
    """r x r block-averaging downsampling via the SVD of the 1 x r^2 patch
    kernel (ref: Hfuncs.py:180-234).

    Spectral layout matches the reference: component 0 (the patch mean
    direction) of all channels*y_dim^2 patches first, then components 1..r^2-1
    laid out (channel, patch)-major.
    """

    u_sign: jnp.ndarray  # scalar U (1x1) entry, +-1
    singulars_small: jnp.ndarray  # (1,) — the single patch singular value 1/r
    v_small: jnp.ndarray  # (r^2, r^2)
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
    def y_dim(self):
        return self._img_dim // self._ratio

    @classmethod
    def create(cls, channels: int, img_dim: int, ratio: int) -> "SuperResolution":
        assert img_dim % ratio == 0
        h = np.full((1, ratio**2), 1.0 / ratio**2)
        u, s, vt = np.linalg.svd(h, full_matrices=True)
        # rank is 1: a single singular value 1/ratio per patch; singulars()
        # has length channels * y_dim^2, matching H's output width
        # (ref: Hfuncs.py:225-226)
        return cls(
            u_sign=jnp.asarray(u[0, 0], jnp.float32),
            singulars_small=jnp.asarray(s, jnp.float32),
            v_small=jnp.asarray(vt.T, jnp.float32),
            _channels=channels,
            _img_dim=img_dim,
            _ratio=ratio,
        )

    def _patches_to_spectral(self, patches):
        """(B, C, y^2, r^2) -> (B, D) reference coefficient ordering."""
        b = patches.shape[0]
        head = patches[..., 0].reshape(b, -1)
        tail = patches[..., 1:].reshape(b, -1)
        return jnp.concatenate([head, tail], axis=1)

    def _spectral_to_patches(self, vec):
        b = vec.shape[0]
        c, y2, r2 = self._channels, self.y_dim**2, self._ratio**2
        head = vec[:, : c * y2].reshape(b, c, y2, 1)
        tail = vec[:, c * y2 :].reshape(b, c, y2, r2 - 1)
        return jnp.concatenate([head, tail], axis=-1)

    def V(self, vec):
        b = vec.shape[0]
        patches = self._spectral_to_patches(vec.reshape(b, -1))
        patches = jnp.einsum("ij,bcpj->bcpi", self.v_small, patches)
        y, r = self.y_dim, self._ratio
        img = patches.reshape(b, self._channels, y, y, r, r)
        img = jnp.transpose(img, (0, 1, 2, 4, 3, 5))
        return img.reshape(b, -1)

    def Vt(self, vec):
        b = vec.shape[0]
        y, r = self.y_dim, self._ratio
        img = vec.reshape(b, self._channels, y, r, y, r)
        patches = jnp.transpose(img, (0, 1, 2, 4, 3, 5)).reshape(
            b, self._channels, y * y, r * r
        )
        patches = jnp.einsum("ji,bcpj->bcpi", self.v_small, patches)
        return self._patches_to_spectral(patches)

    def U(self, vec):
        return self.u_sign * vec.reshape(vec.shape[0], -1)

    Ut = U  # U is 1x1 so U^T = U

    def singulars(self):
        return jnp.tile(self.singulars_small, self._channels * self.y_dim**2)

    def add_zeros(self, vec):
        b = vec.shape[0]
        out = jnp.zeros((b, vec.shape[1] * self._ratio**2), vec.dtype)
        return out.at[:, : vec.shape[1]].set(vec.reshape(b, -1))


class Colorization(SVDOperator):
    """Grayscale observation: per-pixel 1x3 channel-averaging SVD
    (ref: Hfuncs.py:655-696). Spectral layout is component-major: component 0
    of every pixel first (the rank block), then components 1..2.
    """

    u_sign: jnp.ndarray
    singular0: jnp.ndarray  # scalar nonzero singular value
    v_small: jnp.ndarray  # (3, 3)
    _img_dim: int = struct.field(pytree_node=False)

    @property
    def channels(self):
        return 3

    @property
    def img_dim(self):
        return self._img_dim

    @classmethod
    def create(cls, img_dim: int) -> "Colorization":
        h = np.asarray([[0.3333, 0.3334, 0.3333]])
        u, s, vt = np.linalg.svd(h, full_matrices=True)
        return cls(
            u_sign=jnp.asarray(u[0, 0], jnp.float32),
            singular0=jnp.asarray(s[0], jnp.float32),
            v_small=jnp.asarray(vt.T, jnp.float32),
            _img_dim=img_dim,
        )

    def V(self, vec):
        b = vec.shape[0]
        needles = vec.reshape(b, 3, -1).transpose(0, 2, 1)  # (B, P, comp)
        needles = jnp.einsum("ij,bpj->bpi", self.v_small, needles)
        return needles.transpose(0, 2, 1).reshape(b, -1)

    def Vt(self, vec):
        b = vec.shape[0]
        needles = vec.reshape(b, 3, -1).transpose(0, 2, 1)  # (B, P, C)
        needles = jnp.einsum("ji,bpj->bpi", self.v_small, needles)
        return needles.transpose(0, 2, 1).reshape(b, -1)

    def U(self, vec):
        return self.u_sign * vec.reshape(vec.shape[0], -1)

    Ut = U

    def singulars(self):
        return jnp.full((self._img_dim**2,), self.singular0)

    def add_zeros(self, vec):
        b = vec.shape[0]
        out = jnp.zeros((b, 3 * self._img_dim**2), vec.dtype)
        return out.at[:, : self._img_dim**2].set(vec.reshape(b, -1))
