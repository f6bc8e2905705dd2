"""Nonlinear forward operators: phase retrieval and HDR clipping.

Re-designs of the reference operators:
  PhaseRetrievalOperator (ref: obs_functions/Hfuncs.py:318-367) — |FFT(pad(x))|
    with the fastmri centered-FFT convention (obs_functions/fastmri_utils.py:67-117)
  HDR (ref: obs_functions/Hfuncs.py:406-445) — clip(x / 0.5, -1, 1)

Both expose `proj` prox operators and `eq_var` measurement-variance rescalers
used by some samplers.
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from .base import Operator

# 2D-DFT lowering: "fft" uses jnp.fft.fftn (XLA's FFT op — native on CPU/GPU
# and standard TPU runtimes); "matmul" computes the orthonormal DFT as two
# complex matrix products, which rides the MXU and works on TPU backends
# whose runtime lacks the FFT custom-call (the axon single-chip tunnel
# reports it UNIMPLEMENTED). "auto" picks matmul only on such backends.
# At phase-retrieval shapes (384x384 padded grids) the matmul DFT is
# O(n^3) vs O(n^2 log n) but the constant rides the systolic array, so it
# is throughput-competitive for n <= ~1k.
_FFT_IMPL = os.environ.get("NSHMC_FFT_IMPL", "auto")


def set_fft_impl(impl: str) -> None:
    """Override the DFT lowering: 'fft', 'matmul', or 'auto'.

    Caveat: the choice is read at TRACE time, so functions that were
    already jit-compiled keep their cached lowering — call this before
    the first compile (startup/env configuration), not to switch
    implementations mid-run. Tests that flip it use fresh jit scopes.
    """
    global _FFT_IMPL
    assert impl in ("fft", "matmul", "auto"), impl
    _FFT_IMPL = impl


def _use_matmul() -> bool:
    if _FFT_IMPL == "matmul":
        return True
    if _FFT_IMPL == "fft":
        return False
    # the axon tunnel registers as plugin platform 'axon' but reports
    # default_backend() == 'tpu'; its identity shows only in the PJRT
    # platform_version string (env JAX_PLATFORMS is unreliable: this image
    # pins it to axon even for processes that override to CPU in-process)
    try:
        from jax._src import xla_bridge

        return "axon" in getattr(xla_bridge.get_backend(),
                                 "platform_version", "")
    except Exception:
        return False


def _dft_mat(n: int, inverse: bool) -> np.ndarray:
    """Orthonormal DFT matrix (symmetric), built host-side at trace time."""
    k = np.arange(n)
    sign = 2j if inverse else -2j
    w = np.exp(sign * np.pi * np.outer(k, k) / n) / np.sqrt(n)
    return w.astype(np.complex64)


def _fftn2_matmul(x: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    m, n = x.shape[-2], x.shape[-1]
    wm = jnp.asarray(_dft_mat(m, inverse))
    wn = jnp.asarray(_dft_mat(n, inverse))
    # DFT rows then columns: W_m @ X @ W_n (both W symmetric).
    # Precision.HIGHEST keeps the MXU in f32-accumulate mode: the default
    # bf16 passes lose ~3 decimal digits, which corrupts phase-retrieval
    # measurements and HMC gradients on TPU (the only backend where this
    # lowering activates).
    hi = jax.lax.Precision.HIGHEST
    return jnp.matmul(
        wm, jnp.matmul(x.astype(jnp.complex64), wn, precision=hi),
        precision=hi)


def _fftn2_matmul_pair(xr, xi, inverse: bool):
    """Real-pair 2D matmul-DFT: complex64 arrays are themselves
    UNIMPLEMENTED on some TPU runtimes (the axon tunnel rejects programs
    containing them even with the matmul lowering), so compute
    W_m (Xr + iXi) W_n entirely in f32 real/imaginary planes — the same
    real-view-of-complex representation the reference uses
    (fastmri_utils.py real (..., 2) pairs). xi may be None (real input)."""
    m, n = xr.shape[-2], xr.shape[-1]
    wm = _dft_mat(m, inverse)
    wn = _dft_mat(n, inverse)
    ar, ai = jnp.asarray(wm.real), jnp.asarray(wm.imag)
    br, bi = jnp.asarray(wn.real), jnp.asarray(wn.imag)
    hi = jax.lax.Precision.HIGHEST

    def mm(a, b):
        return jnp.matmul(a, b, precision=hi)

    xr = xr.astype(jnp.float32)
    # T = X @ W_n
    if xi is None:
        tr, ti = mm(xr, br), mm(xr, bi)
    else:
        xi = xi.astype(jnp.float32)
        tr = mm(xr, br) - mm(xi, bi)
        ti = mm(xr, bi) + mm(xi, br)
    # Y = W_m @ T
    yr = mm(ar, tr) - mm(ai, ti)
    yi = mm(ar, ti) + mm(ai, tr)
    return yr, yi


def _shift_pair(fn, pair):
    return tuple(None if p is None else fn(p, axes=(-2, -1)) for p in pair)


def fft2c_pair(xr, xi=None):
    """Centered orthonormal 2D FFT on (real, imag) f32 planes — the
    complex-free lowering for TPU runtimes without complex support.
    Matches fft2c on CPU bit-for-bit up to matmul-DFT rounding."""
    xr, xi = _shift_pair(jnp.fft.ifftshift, (xr, xi))
    yr, yi = _fftn2_matmul_pair(xr, xi, inverse=False)
    return _shift_pair(jnp.fft.fftshift, (yr, yi))


def ifft2c_pair(xr, xi=None):
    """Centered orthonormal 2D inverse FFT on (real, imag) f32 planes."""
    xr, xi = _shift_pair(jnp.fft.ifftshift, (xr, xi))
    yr, yi = _fftn2_matmul_pair(xr, xi, inverse=True)
    return _shift_pair(jnp.fft.fftshift, (yr, yi))


def fft2c(x: jnp.ndarray) -> jnp.ndarray:
    """Centered orthonormal 2D FFT over the last two axes
    (ref: fastmri_utils.py:67-90: ifftshift -> fftn(ortho) -> fftshift)."""
    x = jnp.fft.ifftshift(x, axes=(-2, -1))
    if _use_matmul():
        x = _fftn2_matmul(x, inverse=False)
    else:
        x = jnp.fft.fftn(x, axes=(-2, -1), norm="ortho")
    return jnp.fft.fftshift(x, axes=(-2, -1))


def ifft2c(x: jnp.ndarray) -> jnp.ndarray:
    """Centered orthonormal 2D inverse FFT (ref: fastmri_utils.py:92-117)."""
    x = jnp.fft.ifftshift(x, axes=(-2, -1))
    if _use_matmul():
        x = _fftn2_matmul(x, inverse=True)
    else:
        x = jnp.fft.ifftn(x, axes=(-2, -1), norm="ortho")
    return jnp.fft.fftshift(x, axes=(-2, -1))


class PhaseRetrieval(Operator):
    """Oversampled Fourier-magnitude measurement.

    H(x) = |FFT2c(zero_pad(x))| on each channel; measurement shape is
    (B, C * (d + 2*pad)^2) flattened channel-major. pad = oversample/8 * 256
    (ref: Hfuncs.py:320-321).
    """

    _channels: int = struct.field(pytree_node=False)
    _img_dim: int = struct.field(pytree_node=False)
    _pad: int = struct.field(pytree_node=False)

    @property
    def channels(self):
        return self._channels

    @property
    def img_dim(self):
        return self._img_dim

    @property
    def pad(self):
        return self._pad

    @classmethod
    def create(cls, channels: int = 3, img_dim: int = 256, oversample: float = 2.0):
        return cls(
            _channels=channels,
            _img_dim=img_dim,
            _pad=int((oversample / 8.0) * 256),
        )

    def is_linear(self):
        return False

    def _to_img(self, vec):
        b = vec.shape[0]
        return vec.reshape(b, self._channels, self._img_dim, self._img_dim)

    def _pad_img(self, img):
        p = self._pad
        return jnp.pad(img, ((0, 0), (0, 0), (p, p), (p, p)))

    def _crop(self, img):
        p = self._pad
        return img[:, :, p:-p, p:-p]

    def H(self, vec):
        padded = self._pad_img(self._to_img(vec))
        if _use_matmul():
            # complex-free path: some TPU runtimes reject complex64 programs
            yr, yi = fft2c_pair(padded.astype(jnp.float32))
            amplitude = jnp.sqrt(yr * yr + yi * yi)
        else:
            amplitude = jnp.abs(fft2c(padded.astype(jnp.complex64)))
        return amplitude.reshape(vec.shape[0], -1)

    def H_pinv(self, vec):
        b = vec.shape[0]
        big = self._img_dim + 2 * self._pad
        y = vec.reshape(b, self._channels, big, big)
        if _use_matmul():
            xr, xi = ifft2c_pair(y.astype(jnp.float32))
            x = jnp.sqrt(xr * xr + xi * xi)
        else:
            x = jnp.abs(ifft2c(y.astype(jnp.complex64)))
        return self._crop(x).reshape(b, -1)

    def proj(self, x_vec, y_vec, alpha_obs: float = 1.0, eps: float = 1e-8):
        """Magnitude-projection prox (ref: Hfuncs.py:347-360)."""
        b = x_vec.shape[0]
        big = self._img_dim + 2 * self._pad
        y = y_vec.reshape(b, self._channels, big, big) * np.sqrt(alpha_obs)
        padded = self._pad_img(self._to_img(x_vec))
        if _use_matmul():
            fr, fi = fft2c_pair(padded.astype(jnp.float32))
            mag = jnp.sqrt(fr * fr + fi * fi) + eps
            pr, pi = fr * y / mag, fi * y / mag
            prox = self._crop(ifft2c_pair(pr, pi)[0])
        else:
            fx = fft2c(padded.astype(jnp.complex64))
            fx_prox = fx * y / (jnp.abs(fx) + eps)
            prox = jnp.real(self._crop(ifft2c(fx_prox)))
        return prox.reshape(b, -1)

    def eq_var(self, var):
        big = self._img_dim + 2 * self._pad
        return var * big**2 / self._img_dim**2


class HDR(Operator):
    """Saturating dynamic-range compression: clip(x / 0.5, -1, 1)
    (ref: Hfuncs.py:406-445)."""

    _channels: int = struct.field(pytree_node=False, default=3)
    _img_dim: int = struct.field(pytree_node=False, default=256)

    @property
    def channels(self):
        return self._channels

    @property
    def img_dim(self):
        return self._img_dim

    @classmethod
    def create(cls, channels: int = 3, img_dim: int = 256):
        return cls(_channels=channels, _img_dim=img_dim)

    def is_linear(self):
        return False

    def H(self, vec):
        return jnp.clip(vec.reshape(vec.shape[0], -1) / 0.5, -1.0, 1.0)

    def H_pinv(self, vec):
        return vec.reshape(vec.shape[0], -1)

    def proj(self, x_vec, y_vec, alpha_obs: float = 1.0, thre: float = 1.0):
        """Selective replacement prox (ref: Hfuncs.py:424-440)."""
        x, y = x_vec, y_vec
        out = x
        mask1 = (jnp.abs(y) >= thre) & (jnp.abs(x) < thre / 2)
        if alpha_obs == 1.0:
            mask2 = jnp.abs(y) < 1
        else:
            mask2 = jnp.abs(y) < thre / 2
        out = jnp.where(mask1, y / 2, out)
        out = jnp.where(mask2, y / 2, out)
        return out

    def eq_var(self, var):
        return var / 4
