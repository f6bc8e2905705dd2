"""PyTorch -> Flax porting for the LDM stack (VQ autoencoder + latent U-Net).

Maps the reference checkpoint naming (ldm/modules/diffusionmodules/model.py
Encoder/Decoder trees, ldm/models/autoencoder.py quant convs + taming
codebook, and the `model.diffusion_model.*` openaimodel U-Net inside the
Lightning checkpoint loaded by ldm_loader.py:11-26).
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax.numpy as jnp

from .autoencoder import AutoencoderConfig
from ..unet import UNetConfig
from ..port import _convert, adm_param_mapping
from .ldm import latent_unet_config


def _ae_block_entries(flax_prefix, torch_prefix, has_shortcut):
    out = {
        f"{flax_prefix}/norm1": (f"{torch_prefix}.norm1", "groupnorm"),
        f"{flax_prefix}/conv1": (f"{torch_prefix}.conv1", "conv"),
        f"{flax_prefix}/norm2": (f"{torch_prefix}.norm2", "groupnorm"),
        f"{flax_prefix}/conv2": (f"{torch_prefix}.conv2", "conv"),
    }
    if has_shortcut:
        out[f"{flax_prefix}/nin_shortcut"] = (
            f"{torch_prefix}.nin_shortcut", "conv")
    return out


def _ae_attn_entries(flax_prefix, torch_prefix):
    return {
        f"{flax_prefix}/norm": (f"{torch_prefix}.norm", "groupnorm"),
        f"{flax_prefix}/q": (f"{torch_prefix}.q", "conv"),
        f"{flax_prefix}/k": (f"{torch_prefix}.k", "conv"),
        f"{flax_prefix}/v": (f"{torch_prefix}.v", "conv"),
        f"{flax_prefix}/proj_out": (f"{torch_prefix}.proj_out", "conv"),
    }


def ae_param_mapping(cfg: AutoencoderConfig) -> Dict[str, Tuple[str, str]]:
    m: Dict[str, Tuple[str, str]] = {}

    # encoder
    m["encoder/conv_in"] = ("encoder.conv_in", "conv")
    block_in = cfg.ch
    curr_res = cfg.resolution
    for i, mult in enumerate(cfg.ch_mult):
        block_out = cfg.ch * mult
        for j in range(cfg.num_res_blocks):
            m.update(_ae_block_entries(
                f"encoder/down_{i}_block_{j}", f"encoder.down.{i}.block.{j}",
                has_shortcut=(block_in != block_out)))
            block_in = block_out
            if curr_res in cfg.attn_resolutions:
                m.update(_ae_attn_entries(
                    f"encoder/down_{i}_attn_{j}", f"encoder.down.{i}.attn.{j}"))
        if i != len(cfg.ch_mult) - 1:
            m["encoder/down_{0}_downsample/conv".format(i)] = (
                f"encoder.down.{i}.downsample.conv", "conv")
            curr_res //= 2
    m.update(_ae_block_entries("encoder/mid_block_1", "encoder.mid.block_1", False))
    m.update(_ae_attn_entries("encoder/mid_attn_1", "encoder.mid.attn_1"))
    m.update(_ae_block_entries("encoder/mid_block_2", "encoder.mid.block_2", False))
    m["encoder/norm_out"] = ("encoder.norm_out", "groupnorm")
    m["encoder/conv_out"] = ("encoder.conv_out", "conv")

    # decoder
    m["decoder/conv_in"] = ("decoder.conv_in", "conv")
    block_in = cfg.ch * cfg.ch_mult[-1]
    curr_res = cfg.resolution // 2 ** (len(cfg.ch_mult) - 1)
    m.update(_ae_block_entries("decoder/mid_block_1", "decoder.mid.block_1", False))
    m.update(_ae_attn_entries("decoder/mid_attn_1", "decoder.mid.attn_1"))
    m.update(_ae_block_entries("decoder/mid_block_2", "decoder.mid.block_2", False))
    for i in reversed(range(len(cfg.ch_mult))):
        block_out = cfg.ch * cfg.ch_mult[i]
        for j in range(cfg.num_res_blocks + 1):
            m.update(_ae_block_entries(
                f"decoder/up_{i}_block_{j}", f"decoder.up.{i}.block.{j}",
                has_shortcut=(block_in != block_out)))
            block_in = block_out
            if curr_res in cfg.attn_resolutions:
                m.update(_ae_attn_entries(
                    f"decoder/up_{i}_attn_{j}", f"decoder.up.{i}.attn.{j}"))
        if i != 0:
            m[f"decoder/up_{i}_upsample/conv"] = (
                f"decoder.up.{i}.upsample.conv", "conv")
            curr_res *= 2
    m["decoder/norm_out"] = ("decoder.norm_out", "groupnorm")
    m["decoder/conv_out"] = ("decoder.conv_out", "conv")

    m["quant_conv"] = ("quant_conv", "conv")
    m["post_quant_conv"] = ("post_quant_conv", "conv")
    m["quantize"] = ("quantize.embedding", "embed")
    return m


def port_ae_state_dict(sd, cfg: AutoencoderConfig, dtype=jnp.float32,
                       strict: bool = True):
    """VQ autoencoder torch state_dict -> Flax params for VQModel(cfg)."""
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "cpu") else v)
          for k, v in sd.items()}
    mapping = ae_param_mapping(cfg)
    params: dict = {}
    used = set()
    for path, (tprefix, kind) in mapping.items():
        leaves = _convert(kind, tprefix, sd)
        used.add(f"{tprefix}.weight")
        if kind != "embed":
            used.add(f"{tprefix}.bias")
        node = params
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = {k: jnp.asarray(v, dtype) for k, v in leaves.items()}
    if strict:
        unused = sorted(set(sd) - used)
        # allow known dead training-only keys (loss nets etc.)
        unused = [k for k in unused if not k.startswith("loss.")]
        if unused:
            raise ValueError(f"unported AE keys ({len(unused)}): {unused[:10]}")
    return {"params": params}


def port_ldm_checkpoint(sd, unet_cfg: UNetConfig | None = None,
                        ae_cfg: AutoencoderConfig | None = None,
                        dtype=jnp.float32):
    """Split a Lightning LatentDiffusion state_dict into (unet_params,
    ae_params, alphas_cumprod) with the reference's prefixes
    (model.diffusion_model.*, first_stage_model.*, registered schedule
    buffers; ref: ldm_loader.py:11-26, ddpm.py:117-169)."""
    from ..port import port_adm_state_dict

    unet_cfg = unet_cfg or latent_unet_config()
    ae_cfg = ae_cfg or AutoencoderConfig()
    unet_sd = {
        k[len("model.diffusion_model."):]: v
        for k, v in sd.items() if k.startswith("model.diffusion_model.")
    }
    ae_sd = {
        k[len("first_stage_model."):]: v
        for k, v in sd.items() if k.startswith("first_stage_model.")
    }
    unet_params = port_adm_state_dict(unet_sd, unet_cfg, dtype)
    ae_params = port_ae_state_dict(ae_sd, ae_cfg, dtype)
    ac = sd.get("alphas_cumprod")
    alphas_cumprod = (
        np.asarray(ac.detach().cpu().numpy() if hasattr(ac, "cpu") else ac)
        if ac is not None else None
    )
    return unet_params, ae_params, alphas_cumprod
