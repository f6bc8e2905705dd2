"""Image quality metrics: PSNR, SSIM, LPIPS.

TPU-native equivalents of the reference's runtime metrics
(ref: main_sampling.py:511-562): PSNR via inline MSE->dB, SSIM matching
skimage.structural_similarity defaults (gaussian_weights=False, 7x7 uniform
window, K1=0.01, K2=0.03), LPIPS-VGG when ported weights are available.

All metrics take [0, 1]-range NHWC images and are jittable/vmappable so
per-epoch metric computation never forces a host sync inside the sampler.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def psnr(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """10 log10(1 / mse) over all axes except the leading batch axis
    (ref: main_sampling.py:518-519, data_range fixed at 1)."""
    axes = tuple(range(1, a.ndim))
    mse = jnp.mean((a - b) ** 2, axis=axes)
    return 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12))


def _uniform_filter(x: jnp.ndarray, size: int = 7) -> jnp.ndarray:
    """Mean filter over spatial dims of (B, H, W, C), 'valid' padding —
    matches skimage's uniform_filter + crop-to-valid behavior."""
    kernel = jnp.ones((size, size, 1, 1), x.dtype) / (size * size)
    b, h, w, c = x.shape
    xt = x.transpose(0, 3, 1, 2).reshape(b * c, 1, h, w)
    out = jax.lax.conv_general_dilated(
        xt, kernel.transpose(3, 2, 0, 1), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    oh, ow = out.shape[2], out.shape[3]
    return out.reshape(b, c, oh, ow).transpose(0, 2, 3, 1)


def ssim(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0,
         win_size: int = 7, k1: float = 0.01, k2: float = 0.03) -> jnp.ndarray:
    """Mean structural similarity per batch element, matching
    skimage.metrics.structural_similarity defaults (uniform 7x7 window,
    channel-averaged; the reference passes channel_axis=0 on CHW arrays,
    main_sampling.py:520)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    # skimage cov_norm = n/(n-1) (sample covariance)
    n = win_size**2
    cov_norm = n / (n - 1)

    ux = _uniform_filter(a, win_size)
    uy = _uniform_filter(b, win_size)
    uxx = _uniform_filter(a * a, win_size)
    uyy = _uniform_filter(b * b, win_size)
    uxy = _uniform_filter(a * b, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux**2 + uy**2 + c1) * (vx + vy + c2)
    )
    return jnp.mean(s, axis=(1, 2, 3))


class RunningStats:
    """Host-side running mean/std accumulator matching the reference's
    per-image averaging + across-sample std bookkeeping
    (ref: main_sampling.py:526-542)."""

    def __init__(self):
        self.sums = {}
        self.stds = {}
        self.n = 0
        self.n_batches = 0

    def update(self, per_sample_values: dict):
        """per_sample_values: name -> array of per-sample metric values for
        one image's sample stack."""
        self.n += 1
        self.n_batches += 1
        for k, v in per_sample_values.items():
            v = np.asarray(v, np.float64)
            self.sums[k] = self.sums.get(k, 0.0) + float(v.mean())
            if v.size > 1:
                self.stds[k] = self.stds.get(k, 0.0) + float(v.std(ddof=1))

    def summary(self) -> dict:
        out = {}
        for k, s in self.sums.items():
            out[k] = s / max(self.n, 1)
            if k in self.stds:
                out[f"{k}_std"] = self.stds[k] / max(self.n_batches, 1)
        return out
