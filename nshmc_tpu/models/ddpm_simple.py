"""DDPM "simple" U-Net (pesser/pytorch_diffusion family) in Flax, NHWC.

Re-design of the reference CelebA-HQ prior (ref: models/diffusion.py:192-341
`Model`, selected by model_type 'simple', main_sampling.py:76-99). Shares
the taming-style block zoo with the LDM autoencoder (GroupNorm eps=1e-6,
swish, asymmetric-pad downsampling) but with timestep conditioning:
  temb = dense2(swish(dense1(sincos_emb(t))));  h += temb_proj(swish(temb))

NOTE the embedding differs from ADM's: [sin | cos] ordering and a
1/(half_dim - 1) frequency spacing (models/diffusion.py:6-24) — parity
tests cover this.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Tuple

import jax.numpy as jnp
import flax.linen as nn

from .nn import conv, dense, silu
from .ldm.autoencoder import (
    AEAttnBlock,
    AEDownsample,
    AEUpsample,
    _norm,
)

Dtype = Any


def ddpm_timestep_embedding(timesteps, dim):
    """[sin | cos] embedding with 1/(half-1) spacing
    (ref: models/diffusion.py:6-24)."""
    half = dim // 2
    emb = math.log(10000) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


@dataclasses.dataclass(frozen=True)
class DDPMConfig:
    """CelebA-HQ defaults (pesser config via config.model, ref:
    main_sampling.py:76-99 + pytorch_diffusion celeba_hq)."""

    ch: int = 128
    out_ch: int = 3
    ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    dropout: float = 0.0
    in_channels: int = 3
    resolution: int = 256
    resamp_with_conv: bool = True


class TembResBlock(nn.Module):
    """AE ResnetBlock + timestep conditioning (ref: models/diffusion.py:77-135)."""

    out_channels: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        in_ch = x.shape[-1]
        h = silu(_norm("norm1", self.param_dtype)(x))
        h = conv(self.out_channels, dtype=self.dtype,
                 param_dtype=self.param_dtype, name="conv1")(h)
        h = h + dense(self.out_channels, dtype=self.dtype,
                      param_dtype=self.param_dtype,
                      name="temb_proj")(silu(temb))[:, None, None, :]
        h = silu(_norm("norm2", self.param_dtype)(h))
        h = conv(self.out_channels, dtype=self.dtype,
                 param_dtype=self.param_dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = conv(self.out_channels, kernel=1, padding=0, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="nin_shortcut")(x)
        return x + h


class DDPMModel(nn.Module):
    config: DDPMConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t):
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        temb = ddpm_timestep_embedding(t, cfg.ch)
        temb = dense(cfg.ch * 4, name="temb_dense_0", **kw)(temb)
        temb = dense(cfg.ch * 4, name="temb_dense_1", **kw)(silu(temb))

        hs = [conv(cfg.ch, name="conv_in", **kw)(x.astype(self.dtype))]
        curr_res = cfg.resolution
        for i, mult in enumerate(cfg.ch_mult):
            for j in range(cfg.num_res_blocks):
                h = TembResBlock(cfg.ch * mult, name=f"down_{i}_block_{j}",
                                 **kw)(hs[-1], temb)
                if curr_res in cfg.attn_resolutions:
                    h = AEAttnBlock(name=f"down_{i}_attn_{j}", **kw)(h)
                hs.append(h)
            if i != len(cfg.ch_mult) - 1:
                hs.append(AEDownsample(name=f"down_{i}_downsample", **kw)(hs[-1]))
                curr_res //= 2

        h = hs[-1]
        h = TembResBlock(h.shape[-1], name="mid_block_1", **kw)(h, temb)
        h = AEAttnBlock(name="mid_attn_1", **kw)(h)
        h = TembResBlock(h.shape[-1], name="mid_block_2", **kw)(h, temb)

        for i in reversed(range(len(cfg.ch_mult))):
            for j in range(cfg.num_res_blocks + 1):
                skip = hs.pop()
                h = TembResBlock(
                    cfg.ch * cfg.ch_mult[i], name=f"up_{i}_block_{j}", **kw
                )(jnp.concatenate([h, skip.astype(h.dtype)], axis=-1), temb)
                if curr_res in cfg.attn_resolutions:
                    h = AEAttnBlock(name=f"up_{i}_attn_{j}", **kw)(h)
            if i != 0:
                h = AEUpsample(name=f"up_{i}_upsample", **kw)(h)
                curr_res *= 2
        assert not hs

        h = silu(_norm("norm_out", self.param_dtype)(h))
        return conv(cfg.out_ch, name="conv_out", **kw)(h).astype(jnp.float32)


def ddpm_param_mapping(cfg: DDPMConfig):
    """flax path -> (torch prefix, kind) for models/diffusion.py state dicts
    (e.g. the celeba_hq.ckpt fetched by main_sampling.py:90-97)."""
    from .ldm.port import _ae_block_entries, _ae_attn_entries

    def temb_block(flax_prefix, torch_prefix, has_shortcut):
        out = _ae_block_entries(flax_prefix, torch_prefix, has_shortcut)
        out[f"{flax_prefix}/temb_proj"] = (f"{torch_prefix}.temb_proj", "dense")
        return out

    m = {
        "temb_dense_0": ("temb.dense.0", "dense"),
        "temb_dense_1": ("temb.dense.1", "dense"),
        "conv_in": ("conv_in", "conv"),
        "norm_out": ("norm_out", "groupnorm"),
        "conv_out": ("conv_out", "conv"),
    }
    curr_res = cfg.resolution
    block_in = cfg.ch
    for i, mult in enumerate(cfg.ch_mult):
        block_out = cfg.ch * mult
        for j in range(cfg.num_res_blocks):
            m.update(temb_block(f"down_{i}_block_{j}",
                                f"down.{i}.block.{j}",
                                block_in != block_out))
            block_in = block_out
            if curr_res in cfg.attn_resolutions:
                m.update(_ae_attn_entries(f"down_{i}_attn_{j}",
                                          f"down.{i}.attn.{j}"))
        if i != len(cfg.ch_mult) - 1:
            m[f"down_{i}_downsample/conv"] = (f"down.{i}.downsample.conv", "conv")
            curr_res //= 2

    m.update(temb_block("mid_block_1", "mid.block_1", False))
    m.update(_ae_attn_entries("mid_attn_1", "mid.attn_1"))
    m.update(temb_block("mid_block_2", "mid.block_2", False))

    in_ch_mult = (1,) + tuple(cfg.ch_mult)
    for i in reversed(range(len(cfg.ch_mult))):
        block_out = cfg.ch * cfg.ch_mult[i]
        skip_in = cfg.ch * cfg.ch_mult[i]
        for j in range(cfg.num_res_blocks + 1):
            if j == cfg.num_res_blocks:
                skip_in = cfg.ch * in_ch_mult[i]
            m.update(temb_block(f"up_{i}_block_{j}", f"up.{i}.block.{j}",
                                block_in + skip_in != block_out))
            block_in = block_out
            if curr_res in cfg.attn_resolutions:
                m.update(_ae_attn_entries(f"up_{i}_attn_{j}", f"up.{i}.attn.{j}"))
        if i != 0:
            m[f"up_{i}_upsample/conv"] = (f"up.{i}.upsample.conv", "conv")
            curr_res *= 2
    return m


def port_ddpm_state_dict(sd, cfg: DDPMConfig, dtype=jnp.float32):
    import numpy as np
    from .port import _convert

    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "cpu") else v)
          for k, v in sd.items()}
    mapping = ddpm_param_mapping(cfg)
    params: dict = {}
    used = set()
    for path, (tprefix, kind) in mapping.items():
        leaves = _convert(kind, tprefix, sd)
        used.update({f"{tprefix}.weight", f"{tprefix}.bias"})
        node = params
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = {k: jnp.asarray(v, dtype) for k, v in leaves.items()}
    unused = sorted(k for k in set(sd) - used if k != "logvar")
    if unused:
        raise ValueError(f"unported DDPM keys ({len(unused)}): {unused[:10]}")
    return {"params": params}
