"""Shared NN primitives for the score networks.

TPU-native equivalents of the reference helpers (ref: guided_diffusion/nn.py):
  timestep_embedding (nn.py:103-121) — sinusoidal features
  GroupNorm32        (nn.py:17-19)   — normalization in float32 islands
  zero-init convs    (nn.py:68-74)   — zero_module final projections

Everything is NHWC and dtype-polymorphic: `param_dtype` holds master weights
(float32 for parity with ported checkpoints), `dtype` is the compute type
(bfloat16 on TPU for MXU throughput). Norms always reduce in float32,
mirroring the reference's fp32 GroupNorm islands.

conv/dense are factory functions returning plain nn.Conv/nn.Dense so the
parameter tree stays flat (one level per named layer) for weight porting.
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax.ad_checkpoint import checkpoint_name

Dtype = Any


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: float = 10000.0):
    """Sinusoidal timestep embedding, [cos | sin] ordering matching the
    reference (guided_diffusion/nn.py:103-121). timesteps: (B,) float."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class GroupNorm32(nn.GroupNorm):
    """GroupNorm computed in float32 regardless of activation dtype
    (ref: guided_diffusion/nn.py:17-19). Param names stay 'scale'/'bias'."""

    @nn.compact
    def __call__(self, x):
        y = super().__call__(x.astype(jnp.float32))
        return y.astype(x.dtype)


class ChanStatsGroupNorm(nn.Module):
    """GroupNorm with per-CHANNEL moment accumulation (fp32), NHWC.

    Numerically the same normalization as GroupNorm32 (fp32 stats,
    var = E[x^2] - E[x]^2 over each group), but restructured for the TPU
    memory system: the big reduction runs over the spatial (sublane-major)
    axes only, keeping the 128-wide channel lane dimension intact, and the
    tiny group combine happens on (B, C) arrays. flax's group-reshape
    formulation reduces over 4-channel lane segments, which XLA lowers to
    slow strided reduce fusions — round-2 trace attribution put ~51% of
    flagship energy+grad device time in those (scripts/trace_classify.json).

    Param names/shapes match GroupNorm32 ('scale'/'bias', (C,)) so ported
    checkpoints load unchanged.
    """

    num_groups: int = 32
    epsilon: float = 1e-5
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = self.num_groups
        cg = c // g
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)

        xf = x.astype(jnp.float32)
        red_axes = tuple(range(1, x.ndim - 1))
        s = jnp.sum(xf, axis=red_axes)          # (B, C)
        s2 = jnp.sum(xf * xf, axis=red_axes)    # (B, C)
        n = (x.size // (x.shape[0] * c)) * cg
        gs = s.reshape(-1, g, cg).sum(-1)
        gs2 = s2.reshape(-1, g, cg).sum(-1)
        mean = gs / n
        var = gs2 / n - mean**2
        # Name the (B, G) moments so a remat policy can save them as
        # residuals (save_only_these_names("gn_stats")): the backward
        # recompute then skips the full-activation stats reduce and the
        # normalize fuses with its producer in one pass. Values unchanged.
        mean = checkpoint_name(mean, "gn_stats")
        var = checkpoint_name(var, "gn_stats")
        inv = jax.lax.rsqrt(var + self.epsilon)
        shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (c,)
        mean_c = jnp.repeat(mean, cg, axis=1).reshape(shape)
        inv_c = jnp.repeat(inv, cg, axis=1).reshape(shape)
        y = (xf - mean_c) * inv_c * scale.astype(jnp.float32) \
            + bias.astype(jnp.float32)
        return y.astype(x.dtype)


def groupnorm32(name: str, param_dtype: Dtype = jnp.float32,
                fp32: bool = True, impl: str = "flax"):
    """fp32=True is the parity default (reference GroupNorm32 islands);
    fp32=False keeps the activation dtype end-to-end (perf experiment —
    the fp32 islands force f32 materialization of every norm output in a
    bandwidth-bound model). impl='chan' selects the per-channel-stats
    formulation (same numerics, faster TPU lowering; see ChanStatsGroupNorm)."""
    if impl == "chan":
        return ChanStatsGroupNorm(num_groups=32, epsilon=1e-5,
                                  param_dtype=param_dtype, name=name)
    if fp32:
        return GroupNorm32(
            num_groups=32, epsilon=1e-5, dtype=jnp.float32,
            param_dtype=param_dtype, name=name,
        )
    return nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=None,
                        param_dtype=param_dtype, name=name)


def conv(features: int, kernel: int = 3, stride: int = 1, padding: int = 1,
         zero_init: bool = False, dtype: Dtype = jnp.float32,
         param_dtype: Dtype = jnp.float32, name: str | None = None) -> nn.Conv:
    init = nn.initializers.zeros if zero_init else nn.initializers.lecun_normal()
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        kernel_init=init,
        dtype=dtype,
        param_dtype=param_dtype,
        name=name,
    )


def dense(features: int, zero_init: bool = False, dtype: Dtype = jnp.float32,
          param_dtype: Dtype = jnp.float32, name: str | None = None) -> nn.Dense:
    init = nn.initializers.zeros if zero_init else nn.initializers.lecun_normal()
    return nn.Dense(
        features, kernel_init=init, dtype=dtype, param_dtype=param_dtype, name=name
    )


def silu(x):
    return jax.nn.silu(x)


def avg_pool_2x(x):
    """2x2 stride-2 average pool, NHWC (ref: unet_ffhq.py Downsample)."""
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def nearest_upsample_2x(x):
    """Nearest-neighbor 2x upsample, NHWC (ref: unet_ffhq.py Upsample)."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)
