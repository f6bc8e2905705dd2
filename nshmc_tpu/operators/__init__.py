"""Forward-operator library and degradation registry.

`build_operator(deg, ...)` mirrors the reference's `prepare_measurement`
dispatch (ref: main_sampling.py:261-351) but returns a pure pytree operator.
NOTE: the reference doubles sigma_0 for the [-1,1] value range inside
prepare_measurement (main_sampling.py:348) — that scaling is the CALLER's
job here (see cli/measure), not hidden operator state.
"""
from __future__ import annotations

import numpy as np

from .base import Operator, SVDOperator, flatten_image, unflatten_image
from .linear import (
    Inpainting,
    Denoising,
    SuperResolution,
    Colorization,
    random_inpainting_indices,
    box_inpainting_indices,
)
from .deblur import Deblurring, Deblurring2D, SRConv
from .cs import WalshHadamardCS, fwht
from .nonlinear import PhaseRetrieval, HDR, fft2c, ifft2c, set_fft_impl
from .general import GeneralH

__all__ = [
    "Operator", "SVDOperator", "flatten_image", "unflatten_image",
    "Inpainting", "Denoising", "SuperResolution", "Colorization",
    "Deblurring", "Deblurring2D", "SRConv", "WalshHadamardCS",
    "PhaseRetrieval", "HDR", "GeneralH", "NonlinearBlur",
    "random_inpainting_indices", "box_inpainting_indices",
    "build_operator", "fwht", "fft2c", "ifft2c", "set_fft_impl",
]


def NonlinearBlur(*args, **kwargs):
    from .nonlinear_blur import NonlinearBlur as _NB

    return _NB.create(*args, **kwargs)


def build_operator(
    deg: str,
    channels: int = 3,
    img_dim: int = 256,
    rng: np.random.Generator | None = None,
):
    """Build a forward operator from a degradation string, mirroring
    main_sampling.py:261-344. Randomized degradations (inpainting masks, CS
    permutations, box position) draw from `rng` (default seeded 0)."""
    rng = rng or np.random.default_rng(0)

    if "sr" in deg:
        if deg.startswith("sr_bicubic"):
            factor = int(deg[len("sr_bicubic"):])
            return SRConv.bicubic(channels, img_dim, factor)
        ratio = int(deg[2:])
        return SuperResolution.create(channels, img_dim, ratio)
    if "inp" in deg:
        if "box" in deg:
            left = int(rng.integers(16, 113))
            up = int(rng.integers(16, 113))
            missing = box_inpainting_indices(img_dim, channels, left, up)
        else:
            perm = rng.permutation(img_dim**2)[: int(img_dim**2 * 0.92)]
            missing_r = 3 * perm
            missing = np.sort(
                np.concatenate([missing_r, missing_r + 1, missing_r + 2])
            )
        return Inpainting.create(channels, img_dim, missing)
    if "deblur_gauss" in deg:
        return Deblurring.gaussian(channels, img_dim, sigma=10.0)
    if "phase" in deg:
        return PhaseRetrieval.create(channels, img_dim, oversample=2.0)
    if "hdr" in deg:
        return HDR.create(channels, img_dim)
    if "cs" in deg:
        ratio = int(deg[2:])
        return WalshHadamardCS.create(
            channels, img_dim, ratio, rng.permutation(img_dim**2)
        )
    if deg == "deblur_aniso":
        return Deblurring2D.aniso(channels, img_dim)
    if deg == "deblur_nonlinear":
        return NonlinearBlur(channels=channels, img_dim=img_dim)
    if deg == "color":
        return Colorization.create(img_dim)
    if deg == "denoise":
        return Denoising.create(channels, img_dim)
    raise ValueError(f"degradation type not supported: {deg}")
