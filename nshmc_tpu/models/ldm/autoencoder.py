"""VQ-f4 autoencoder (first stage) in Flax, NHWC.

Re-design of the reference LDM first stage:
  Encoder/Decoder blocks (ref: ldm/modules/diffusionmodules/model.py:368-564,
    ResnetBlock :82, AttnBlock :150, Up/Downsample :42-79; GroupNorm eps=1e-6)
  VQModelInterface (ref: ldm/models/autoencoder.py:264-283: encode skips
    quantization, decode quantizes unless force_not_quantize)
  VectorQuantizer (replaces the external `taming` VectorQuantizer2
    dependency, autoencoder.py:6,39): nearest-neighbor codebook lookup with
    a straight-through gradient — this is what makes the reference's
    `differentiable_decode_first_stage` differentiable through quantization.

vq-f4 config (ref: configs/config_ffhq_latent.yml:70-83): ch=128,
ch_mult=(1,2,4), num_res_blocks=2, no attention except the mid block,
z_channels=3, embed_dim=3, n_embed=8192, 256 -> 64 spatial.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn import conv, nearest_upsample_2x, silu

Dtype = Any


def _norm(name, param_dtype=jnp.float32):
    """AE GroupNorm: 32 groups, eps=1e-6, float32 compute
    (ref: model.py:37-39 Normalize)."""

    class _GN(nn.GroupNorm):
        @nn.compact
        def __call__(self, x):
            return super().__call__(x.astype(jnp.float32)).astype(x.dtype)

    return _GN(num_groups=32, epsilon=1e-6, dtype=jnp.float32,
               param_dtype=param_dtype, name=name)


@dataclasses.dataclass(frozen=True)
class AutoencoderConfig:
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 2
    in_channels: int = 3
    out_ch: int = 3
    z_channels: int = 3
    embed_dim: int = 3
    n_embed: int = 8192
    resolution: int = 256
    attn_resolutions: Tuple[int, ...] = ()
    double_z: bool = False


class AEResnetBlock(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = silu(_norm("norm1", self.param_dtype)(x))
        h = conv(self.out_channels, dtype=self.dtype,
                 param_dtype=self.param_dtype, name="conv1")(h)
        h = silu(_norm("norm2", self.param_dtype)(h))
        h = conv(self.out_channels, dtype=self.dtype,
                 param_dtype=self.param_dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = conv(self.out_channels, kernel=1, padding=0, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="nin_shortcut")(x)
        return x + h


class AEAttnBlock(nn.Module):
    """Single-head spatial attention (ref: model.py:150-188 AttnBlock):
    1x1-conv q/k/v, logits scaled by c^-0.5, softmax in fp32."""

    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = _norm("norm", self.param_dtype)(x)
        q = conv(c, kernel=1, padding=0, dtype=self.dtype,
                 param_dtype=self.param_dtype, name="q")(h)
        k = conv(c, kernel=1, padding=0, dtype=self.dtype,
                 param_dtype=self.param_dtype, name="k")(h)
        v = conv(c, kernel=1, padding=0, dtype=self.dtype,
                 param_dtype=self.param_dtype, name="v")(h)
        q = q.reshape(b, hh * ww, c)
        k = k.reshape(b, hh * ww, c)
        v = v.reshape(b, hh * ww, c)
        w = jnp.einsum("btc,bsc->bts", q, k) * (c ** -0.5)
        w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(v.dtype)
        h = jnp.einsum("bts,bsc->btc", w, v).reshape(b, hh, ww, c)
        h = conv(c, kernel=1, padding=0, dtype=self.dtype,
                 param_dtype=self.param_dtype, name="proj_out")(h)
        return x + h


class AEDownsample(nn.Module):
    """Asymmetric-padded stride-2 conv (ref: model.py:59-79)."""

    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(x.shape[-1], (3, 3), strides=(2, 2), padding="VALID",
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="conv")(x)


class AEUpsample(nn.Module):
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nearest_upsample_2x(x)
        return conv(x.shape[-1], dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv")(x)


class Encoder(nn.Module):
    config: AutoencoderConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = conv(cfg.ch, name="conv_in", **kw)(x)
        curr_res = cfg.resolution
        for i, mult in enumerate(cfg.ch_mult):
            for j in range(cfg.num_res_blocks):
                h = AEResnetBlock(cfg.ch * mult, name=f"down_{i}_block_{j}", **kw)(h)
                if curr_res in cfg.attn_resolutions:
                    h = AEAttnBlock(name=f"down_{i}_attn_{j}", **kw)(h)
            if i != len(cfg.ch_mult) - 1:
                h = AEDownsample(name=f"down_{i}_downsample", **kw)(h)
                curr_res //= 2
        h = AEResnetBlock(h.shape[-1], name="mid_block_1", **kw)(h, )
        h = AEAttnBlock(name="mid_attn_1", **kw)(h)
        h = AEResnetBlock(h.shape[-1], name="mid_block_2", **kw)(h)
        h = silu(_norm("norm_out", self.param_dtype)(h))
        out_c = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return conv(out_c, name="conv_out", **kw)(h)


class Decoder(nn.Module):
    config: AutoencoderConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        block_in = cfg.ch * cfg.ch_mult[-1]
        curr_res = cfg.resolution // 2 ** (len(cfg.ch_mult) - 1)
        h = conv(block_in, name="conv_in", **kw)(z)
        h = AEResnetBlock(block_in, name="mid_block_1", **kw)(h)
        h = AEAttnBlock(name="mid_attn_1", **kw)(h)
        h = AEResnetBlock(block_in, name="mid_block_2", **kw)(h)
        for i in reversed(range(len(cfg.ch_mult))):
            out_ch = cfg.ch * cfg.ch_mult[i]
            for j in range(cfg.num_res_blocks + 1):
                h = AEResnetBlock(out_ch, name=f"up_{i}_block_{j}", **kw)(h)
                if curr_res in cfg.attn_resolutions:
                    h = AEAttnBlock(name=f"up_{i}_attn_{j}", **kw)(h)
            if i != 0:
                h = AEUpsample(name=f"up_{i}_upsample", **kw)(h)
                curr_res *= 2
        h = silu(_norm("norm_out", self.param_dtype)(h))
        return conv(cfg.out_ch, name="conv_out", **kw)(h)


class VectorQuantizer(nn.Module):
    """Nearest-neighbor codebook with straight-through gradients
    (replaces taming VectorQuantizer2)."""

    n_embed: int
    embed_dim: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        codebook = self.param(
            "embedding",
            nn.initializers.uniform(scale=2.0 / self.n_embed),
            (self.n_embed, self.embed_dim),
            self.param_dtype,
        )
        flat = z.reshape(-1, self.embed_dim)
        d = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            - 2 * flat @ codebook.T
            + jnp.sum(codebook**2, axis=1)[None]
        )
        idx = jnp.argmin(d, axis=1)
        z_q = codebook[idx].reshape(z.shape)
        # straight-through estimator
        return z + jax.lax.stop_gradient(z_q - z)


class AutoencoderKL(nn.Module):
    """KL-regularized first stage (ref: ldm/models/autoencoder.py:285-443):
    encode returns a DiagonalGaussian over the latent; decode is plain.
    Use an AutoencoderConfig with double_z=True."""

    config: AutoencoderConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        assert cfg.double_z, "AutoencoderKL requires double_z=True"
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.encoder = Encoder(cfg, **kw)
        self.decoder = Decoder(cfg, **kw)
        self.quant_conv = conv(2 * cfg.embed_dim, kernel=1, padding=0, **kw)
        self.post_quant_conv = conv(cfg.z_channels, kernel=1, padding=0, **kw)

    def encode(self, x):
        from .distributions import DiagonalGaussian

        moments = self.quant_conv(self.encoder(x))
        return DiagonalGaussian.from_moments(moments)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, key):
        posterior = self.encode(x)
        return self.decode(posterior.sample(key))


class VQModel(nn.Module):
    """VQ first stage with the reference's interface semantics
    (ref: ldm/models/autoencoder.py:264-283)."""

    config: AutoencoderConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.encoder = Encoder(cfg, **kw)
        self.decoder = Decoder(cfg, **kw)
        self.quantize = VectorQuantizer(cfg.n_embed, cfg.embed_dim,
                                        self.param_dtype)
        self.quant_conv = conv(cfg.embed_dim, kernel=1, padding=0, **kw)
        self.post_quant_conv = conv(cfg.z_channels, kernel=1, padding=0, **kw)

    def encode(self, x):
        """No quantization on encode (ref: autoencoder.py:269-272)."""
        return self.quant_conv(self.encoder(x))

    def decode(self, h, force_not_quantize: bool = False):
        quant = h if force_not_quantize else self.quantize(h)
        return self.decoder(self.post_quant_conv(quant))

    def __call__(self, x):
        return self.decode(self.encode(x))
