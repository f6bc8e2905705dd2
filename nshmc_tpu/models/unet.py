"""ADM-style U-Net score network, TPU-native (Flax, NHWC).

Architecture mirrors the reference pixel prior exactly
(ref: guided_diffusion/unet_ffhq.py:467-734 `UNetModel`, configured by
configs/config_ffhq.yml:17-35: 256^2, ch=128, mult (1,1,2,2,4,4),
num_res_blocks=1, attention at ds16, 4 heads / 64 head-channels,
scale-shift norm, resblock up/down, learn_sigma -> 6 output channels), and
also instantiates the LDM latent U-Net (ldm/modules/diffusionmodules/
openaimodel.py:413, configs/config_ffhq_latent.yml:42-58: 64^2, ch=224,
mult (1,2,3,4), attention at ds 8/4/2, 32 head-channels).

TPU-first choices:
  - NHWC layout end-to-end so convs hit the MXU conv path without layout
    transposes; the weight-port script transposes torch NCHW checkpoints.
  - dtype-polymorphic compute (bfloat16 torso) with float32 GroupNorm
    islands matching the reference's GroupNorm32 (nn.py:17-19).
  - per-unit `nn.remat` instead of the reference's CheckpointFunction
    (nn.py:124-176): each encoder/middle/decoder unit recomputes in the
    backward pass, making HMC's backprop through 3 chained U-Nets at 256^2
    memory-feasible.
  - attention via the fused kernel in ops/attention.py.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .nn import (
    conv,
    dense,
    groupnorm32,
    avg_pool_2x,
    nearest_upsample_2x,
    silu,
    timestep_embedding,
)
from ..ops.attention import attention

Dtype = Any


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    image_size: int = 256
    in_channels: int = 3
    model_channels: int = 128
    out_channels: int = 6  # learn_sigma -> [eps | sigma]
    num_res_blocks: int = 1
    attention_ds: Tuple[int, ...] = (16,)
    dropout: float = 0.0
    channel_mult: Tuple[float, ...] = (1, 1, 2, 2, 4, 4)
    conv_resample: bool = True
    num_classes: Optional[int] = None
    num_heads: int = 4
    num_head_channels: int = 64
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    # remat policy: "full" (every unit recomputes in backward — minimal
    # memory, the default for HMC through chained U-Nets), "attn" (only
    # attention-bearing units — mirrors the reference, which always
    # checkpoints attention but not ResBlocks, unet_ffhq.py:367-368),
    # "big" (remat only units whose input resolution >= remat_min_res —
    # low-resolution activations are cheap to store, skipping their
    # backward recompute; round-2 A/B: +7% flagship energy+grad over
    # "full" at identical numerics, and the default), "none" (store
    # everything — fastest backward when memory allows). bool accepted
    # for compatibility (True -> "full").
    remat: object = "big"
    remat_min_res: int = 128
    # Save GroupNorm (B, G) moments as remat residuals
    # (save_only_these_names("gn_stats")): the backward recompute of a
    # rematted unit then skips every full-activation stats reduce (the
    # dominant device-time class in the round-2 trace attribution) and the
    # normalize fuses with its producer. Bitwise-identical outputs; costs
    # ~1 kB per GN. Only effective with gn_impl="chan" (the tagged path).
    remat_save_gn_stats: bool = False
    # fp32 GroupNorm islands (parity default; False = keep activation dtype)
    norm_fp32: bool = True
    # conditional LDM: when context_dim is set, attention positions use the
    # cross-attention SpatialTransformer (ref: openaimodel.py:413
    # use_spatial_transformer path) instead of AttnBlock
    context_dim: Optional[int] = None
    transformer_depth: int = 1
    # GroupNorm lowering: "chan" (per-channel stats + tiny group combine —
    # same numerics, faster TPU reduce path; round-2 A/B: +7% flagship
    # energy+grad) or "flax" (group-reshape). Bitwise-identical on CPU,
    # differs only in f32 accumulation order on TPU.
    gn_impl: str = "chan"

    @classmethod
    def from_model_yaml(cls, **kw) -> "UNetConfig":
        """Build from the reference model-config keys
        (ref: guided_diffusion/unet_ffhq.py:25-91 `create_model`)."""
        image_size = kw.get("image_size", 256)
        channel_mult = kw.get("channel_mult", "") or ""
        if channel_mult == "":
            channel_mult = {
                512: (0.5, 1, 1, 2, 2, 4, 4),
                256: (1, 1, 2, 2, 4, 4),
                128: (1, 1, 2, 3, 4),
                64: (1, 2, 3, 4),
            }[image_size]
        elif isinstance(channel_mult, str):
            channel_mult = tuple(int(m) for m in channel_mult.split(","))
        attn = kw.get("attention_resolutions", "16")
        if isinstance(attn, int):
            attn = [attn]
        elif isinstance(attn, str):
            attn = [int(r) for r in attn.split(",")]
        attention_ds = tuple(image_size // int(r) for r in attn)
        return cls(
            image_size=image_size,
            in_channels=kw.get("in_channels", 3),
            model_channels=kw.get("num_channels", 128),
            out_channels=6 if kw.get("learn_sigma", False) else 3,
            num_res_blocks=kw.get("num_res_blocks", 1),
            attention_ds=attention_ds,
            dropout=kw.get("dropout", 0.0),
            channel_mult=tuple(channel_mult),
            num_classes=1000 if kw.get("class_cond", False) else None,
            num_heads=kw.get("num_heads", 4),
            num_head_channels=kw.get("num_head_channels", -1),
            num_heads_upsample=kw.get("num_heads_upsample", -1),
            use_scale_shift_norm=kw.get("use_scale_shift_norm", False),
            resblock_updown=kw.get("resblock_updown", False),
        )


class ResBlock(nn.Module):
    """Residual block with timestep conditioning
    (ref: unet_ffhq.py:214-328). `up`/`down` fold the 2x resampling into the
    block (resblock_updown path)."""

    out_channels: int
    use_scale_shift_norm: bool = True
    up: bool = False
    down: bool = False
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    norm_fp32: bool = True
    gn_impl: str = "flax"

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True):
        in_ch = x.shape[-1]
        h = groupnorm32("in_norm", self.param_dtype, self.norm_fp32, self.gn_impl)(x)
        h = silu(h)
        if self.up:
            h = nearest_upsample_2x(h)
            x = nearest_upsample_2x(x)
        elif self.down:
            h = avg_pool_2x(h)
            x = avg_pool_2x(x)
        h = conv(self.out_channels, dtype=self.dtype,
                 param_dtype=self.param_dtype, name="in_conv")(h)

        emb_out = dense(
            2 * self.out_channels if self.use_scale_shift_norm else self.out_channels,
            dtype=self.dtype, param_dtype=self.param_dtype, name="emb_proj",
        )(silu(emb))
        emb_out = emb_out[:, None, None, :].astype(h.dtype)

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = groupnorm32("out_norm", self.param_dtype, self.norm_fp32, self.gn_impl)(h)
            h = h * (1 + scale) + shift
        else:
            h = h + emb_out
            h = groupnorm32("out_norm", self.param_dtype, self.norm_fp32, self.gn_impl)(h)
        h = silu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = conv(self.out_channels, zero_init=True, dtype=self.dtype,
                 param_dtype=self.param_dtype, name="out_conv")(h)

        if in_ch != self.out_channels:
            x = conv(self.out_channels, kernel=1, padding=0, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="skip")(x)
        return x + h


class AttentionBlock(nn.Module):
    """Spatial self-attention over flattened tokens
    (ref: unet_ffhq.py:330-460; QKVAttentionLegacy numerics: qkv layout is
    heads-major with (q|k|v) within each head, q/k pre-scaled by ch^-1/4,
    softmax in float32)."""

    num_heads: int = 4
    num_head_channels: int = -1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    norm_fp32: bool = True
    gn_impl: str = "flax"

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        if self.num_head_channels == -1:
            heads = self.num_heads
        else:
            assert c % self.num_head_channels == 0
            heads = c // self.num_head_channels
        ch = c // heads

        h = groupnorm32("norm", self.param_dtype, self.norm_fp32, self.gn_impl)(x)
        tokens = h.reshape(b, hh * ww, c)
        qkv = dense(3 * c, dtype=self.dtype, param_dtype=self.param_dtype,
                    name="qkv")(tokens)
        qkv = qkv.reshape(b, hh * ww, heads, 3, ch)
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
        a = attention(q, k, v)
        a = a.reshape(b, hh * ww, c)
        a = dense(c, zero_init=True, dtype=self.dtype,
                  param_dtype=self.param_dtype, name="proj_out")(a)
        return x + a.reshape(b, hh, ww, c)


class Downsample(nn.Module):
    out_channels: int
    use_conv: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.use_conv:
            return conv(self.out_channels, stride=2, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="conv")(x)
        return avg_pool_2x(x)


class Upsample(nn.Module):
    out_channels: int
    use_conv: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nearest_upsample_2x(x)
        if self.use_conv:
            x = conv(self.out_channels, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="conv")(x)
        return x




def _attention_unit(cfg: UNetConfig, heads: int, dtype, param_dtype,
                    name: str):
    """AttnBlock (unconditional) or SpatialTransformer (context_dim set),
    mirroring openaimodel.py's use_spatial_transformer switch."""
    if cfg.context_dim is not None:
        from .ldm.transformer import SpatialTransformer

        def apply(h, context=None, _name=name):
            ch = h.shape[-1]
            if cfg.num_head_channels == -1:
                n_heads, d_head = heads, ch // heads
            else:
                n_heads, d_head = ch // cfg.num_head_channels, \
                    cfg.num_head_channels
            return SpatialTransformer(
                ch, n_heads, d_head, depth=cfg.transformer_depth,
                context_dim=cfg.context_dim, dtype=dtype,
                param_dtype=param_dtype, name=_name)(h, context=context)

        return apply

    def apply(h, context=None, _name=name):
        return AttentionBlock(heads, cfg.num_head_channels, dtype=dtype,
                              param_dtype=param_dtype,
                              norm_fp32=cfg.norm_fp32, gn_impl=cfg.gn_impl,
                              name=_name)(h)

    return apply


class EncoderUnit(nn.Module):
    """One encoder stage: ResBlock (+ optional attention)."""

    out_channels: int
    use_attn: bool
    config: UNetConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h, emb, context=None):
        cfg = self.config
        h = ResBlock(self.out_channels, cfg.use_scale_shift_norm,
                     dropout=cfg.dropout, dtype=self.dtype,
                     param_dtype=self.param_dtype,
                     norm_fp32=cfg.norm_fp32, gn_impl=cfg.gn_impl, name="res")(h, emb)
        if self.use_attn:
            h = _attention_unit(cfg, cfg.num_heads, self.dtype,
                                self.param_dtype, "attn")(h, context)
        return h


class MiddleUnit(nn.Module):
    config: UNetConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h, emb, context=None):
        cfg = self.config
        ch = h.shape[-1]
        h = ResBlock(ch, cfg.use_scale_shift_norm, dropout=cfg.dropout,
                     dtype=self.dtype, param_dtype=self.param_dtype,
                     norm_fp32=cfg.norm_fp32, gn_impl=cfg.gn_impl, name="res1")(h, emb)
        h = _attention_unit(cfg, cfg.num_heads, self.dtype,
                            self.param_dtype, "attn")(h, context)
        h = ResBlock(ch, cfg.use_scale_shift_norm, dropout=cfg.dropout,
                     dtype=self.dtype, param_dtype=self.param_dtype,
                     norm_fp32=cfg.norm_fp32, gn_impl=cfg.gn_impl, name="res2")(h, emb)
        return h


class DecoderUnit(nn.Module):
    """One decoder stage: ResBlock on the skip-concat input (+ attention,
    + optional up-resampling ResBlock/Upsample)."""

    out_channels: int
    use_attn: bool
    do_up: bool
    config: UNetConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h, emb, context=None):
        cfg = self.config
        h = ResBlock(self.out_channels, cfg.use_scale_shift_norm,
                     dropout=cfg.dropout, dtype=self.dtype,
                     param_dtype=self.param_dtype,
                     norm_fp32=cfg.norm_fp32, gn_impl=cfg.gn_impl, name="res")(h, emb)
        if self.use_attn:
            heads_attr = cfg.num_heads_upsample if cfg.num_heads_upsample != -1 \
                else cfg.num_heads
            h = _attention_unit(cfg, heads_attr, self.dtype,
                                self.param_dtype, "attn")(h, context)
        if self.do_up:
            if cfg.resblock_updown:
                h = ResBlock(h.shape[-1], cfg.use_scale_shift_norm, up=True,
                             dropout=cfg.dropout, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             norm_fp32=cfg.norm_fp32, gn_impl=cfg.gn_impl, name="upres")(h, emb)
            else:
                h = Upsample(h.shape[-1], cfg.conv_resample, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="upsample")(h)
        return h


class UNetModel(nn.Module):
    """The full ADM U-Net (ref: unet_ffhq.py:467-734).

    Input/output are NHWC; timesteps are float (B,). Output channels follow
    the config (6 with learn_sigma — callers slice [..., :3] for epsilon,
    matching algos/unconditional.py:18-19).
    """

    config: UNetConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps, y=None, deterministic: bool = True,
                 context=None):
        cfg = self.config
        assert (y is not None) == (cfg.num_classes is not None)

        policy = {True: "full", False: "none"}.get(cfg.remat, cfg.remat)
        full = policy == "full"
        attn_only = policy == "attn"
        big_only = policy == "big"

        if cfg.remat_save_gn_stats:
            _remat = functools.partial(
                nn.remat,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "gn_stats"))
        else:
            _remat = nn.remat

        def _big(res):
            return big_only and res >= cfg.remat_min_res

        def enc_cls(use_attn, res):
            return _remat(EncoderUnit) \
                if (full or (attn_only and use_attn) or _big(res)) \
                else EncoderUnit

        def dec_cls(use_attn, res):
            return _remat(DecoderUnit) \
                if (full or (attn_only and use_attn) or _big(res)) \
                else DecoderUnit

        def mid_cls(res):
            return _remat(MiddleUnit) if (full or attn_only or _big(res)) \
                else MiddleUnit

        def downres_cls(res):
            return _remat(ResBlock) if (full or _big(res)) else ResBlock

        time_dim = cfg.model_channels * 4
        emb = timestep_embedding(timesteps, cfg.model_channels)
        emb = dense(time_dim, dtype=self.dtype, param_dtype=self.param_dtype,
                    name="time_embed_1")(emb)
        emb = dense(time_dim, dtype=self.dtype, param_dtype=self.param_dtype,
                    name="time_embed_2")(silu(emb))
        if cfg.num_classes is not None:
            emb = emb + nn.Embed(cfg.num_classes, time_dim,
                                 param_dtype=self.param_dtype, name="label_emb")(y)

        h = x.astype(self.dtype)
        h = conv(int(cfg.channel_mult[0] * cfg.model_channels),
                 dtype=self.dtype, param_dtype=self.param_dtype,
                 name="in_conv")(h)

        # --- encoder ---
        hs = [h]
        ds = 1
        for level, mult in enumerate(cfg.channel_mult):
            out_ch = int(mult * cfg.model_channels)
            for i in range(cfg.num_res_blocks):
                use_attn = ds in cfg.attention_ds
                h = enc_cls(use_attn, cfg.image_size // ds)(
                    out_ch, use_attn, cfg,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"down_{level}_{i}")(h, emb, context)
                hs.append(h)
            if level != len(cfg.channel_mult) - 1:
                if cfg.resblock_updown:
                    h = downres_cls(cfg.image_size // ds)(
                        h.shape[-1], cfg.use_scale_shift_norm, down=True,
                        dropout=cfg.dropout, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        norm_fp32=cfg.norm_fp32, gn_impl=cfg.gn_impl,
                        name=f"down_{level}_downres")(h, emb)
                else:
                    h = Downsample(h.shape[-1], cfg.conv_resample,
                                   dtype=self.dtype, param_dtype=self.param_dtype,
                                   name=f"down_{level}_downsample")(h)
                hs.append(h)
                ds *= 2

        # --- middle ---
        h = mid_cls(cfg.image_size // ds)(
            cfg, dtype=self.dtype, param_dtype=self.param_dtype,
            name="middle")(h, emb, context)

        # --- decoder ---
        for level, mult in reversed(list(enumerate(cfg.channel_mult))):
            out_ch = int(mult * cfg.model_channels)
            for i in range(cfg.num_res_blocks + 1):
                skip = hs.pop()
                h = jnp.concatenate([h, skip.astype(h.dtype)], axis=-1)
                do_up = (level != 0) and (i == cfg.num_res_blocks)
                use_attn = ds in cfg.attention_ds
                h = dec_cls(use_attn, cfg.image_size // ds)(
                    out_ch, use_attn, do_up, cfg,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"up_{level}_{i}")(h, emb, context)
                if do_up:
                    ds //= 2
        assert not hs

        h = groupnorm32("out_norm", self.param_dtype, cfg.norm_fp32, cfg.gn_impl)(h)
        h = silu(h)
        h = conv(cfg.out_channels, zero_init=True, dtype=self.dtype,
                 param_dtype=self.param_dtype, name="out_conv")(h)
        return h.astype(jnp.float32)
