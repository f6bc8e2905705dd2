"""LPIPS perceptual metric (VGG16 backbone), Flax implementation.

The reference computes LPIPS via the `lpips` pip package with net='vgg'
(ref: main_sampling.py:440, 521). This module re-implements the metric
architecture natively: VGG16 feature stacks (relu1_2, relu2_2, relu3_3,
relu4_3, relu5_3), per-channel unit normalization, learned 1x1 linear
heads, spatial averaging, and the canonical input shift/scale.

Weights are NOT bundled (this environment has no network access and no
cached torchvision/lpips checkpoints). `port_lpips_weights` converts a
torchvision VGG16 state_dict + lpips linear-head state_dict when they are
available; `lpips_fn(params)` then returns a jittable distance function.
With random weights the metric is architecture-valid but not calibrated —
tests only exercise shapes/invariances.
"""
from __future__ import annotations

from typing import Any, List

import jax.numpy as jnp
import flax.linen as nn
import numpy as np

# VGG16 conv plan: (out_channels, n_convs) per stage; maxpool between stages
_VGG_STAGES = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]

# lpips input normalization (lpips/lpips.py ScalingLayer)
_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 up to relu5_3, returning the 5 LPIPS feature stacks."""

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        feats = []
        conv_idx = 0
        for stage, (ch, n) in enumerate(_VGG_STAGES):
            for i in range(n):
                x = nn.Conv(ch, (3, 3), padding=1, name=f"conv{conv_idx}")(x)
                x = nn.relu(x)
                conv_idx += 1
            feats.append(x)
            if stage != len(_VGG_STAGES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


class LPIPS(nn.Module):
    """Full LPIPS-VGG distance between [-1, 1]-range NHWC images."""

    @nn.compact
    def __call__(self, a, b):
        def norm_input(x):
            return (x - _SHIFT) / _SCALE

        vgg = VGG16Features(name="vgg")
        fa = vgg(norm_input(a))
        fb = vgg(norm_input(b))
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / jnp.sqrt(
                jnp.sum(xa**2, axis=-1, keepdims=True) + 1e-10
            )
            nb = xb / jnp.sqrt(
                jnp.sum(xb**2, axis=-1, keepdims=True) + 1e-10
            )
            diff = (na - nb) ** 2
            lin = nn.Conv(1, (1, 1), use_bias=False, name=f"lin{i}")(diff)
            total = total + jnp.mean(lin, axis=(1, 2, 3))
        return total


def port_lpips_weights(vgg_sd, lin_sd):
    """torchvision VGG16 `features.*` conv weights + lpips `lin*.model.1`
    1x1 weights -> Flax params for LPIPS. Conv kernels transpose
    (O,I,kh,kw) -> (kh,kw,I,O)."""
    params = {"vgg": {}}
    # torchvision vgg16.features indices of conv layers
    tv_conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    for my_idx, tv_idx in enumerate(tv_conv_idx):
        w = np.asarray(vgg_sd[f"features.{tv_idx}.weight"])
        b = np.asarray(vgg_sd[f"features.{tv_idx}.bias"])
        params["vgg"][f"conv{my_idx}"] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(b),
        }
    for i in range(5):
        w = np.asarray(lin_sd[f"lin{i}.model.1.weight"])  # (1, C, 1, 1)
        params[f"lin{i}"] = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}
    return {"params": params}


def try_load_lpips(dtype=jnp.float32):
    """Best-effort load: returns (apply_fn, params) or None when the lpips /
    torchvision weights aren't available in this environment."""
    try:
        import lpips as lpips_pkg  # noqa: F401
        import torch
        import torchvision

        vgg_sd = torchvision.models.vgg16(weights="IMAGENET1K_V1").state_dict()
        net = lpips_pkg.LPIPS(net="vgg")
        lin_sd = {
            f"lin{i}.model.1.weight": net.lins[i].model[1].weight.detach()
            for i in range(5)
        }
        params = port_lpips_weights(vgg_sd, lin_sd)
        model = LPIPS()
        return (lambda a, b: model.apply(params, a, b)), params
    except Exception:
        return None
