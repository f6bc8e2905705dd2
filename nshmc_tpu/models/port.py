"""PyTorch checkpoint -> Flax parameter porting for the ADM U-Net.

The reference stores torch `state_dict`s (models/ffhq_10m.pt, loaded at
guided_diffusion/unet_ffhq.py:87-90). This module rebuilds the reference's
module-list indexing (unet_ffhq.py:538-700) to map every torch key onto the
named Flax layers of `nshmc_tpu.models.unet.UNetModel`, with the layout
conversions:

  conv2d   (O, I, kh, kw) -> (kh, kw, I, O)  [NCHW -> NHWC HWIO]
  conv1d   (O, I, 1)      -> (I, O)          [attention qkv/proj as Dense]
  linear   (O, I)         -> (I, O)
  groupnorm weight/bias   -> scale/bias      [unchanged]

The attention qkv width layout (heads-major, q|k|v within head,
unet_ffhq.py:399-430 QKVAttentionLegacy) matches the Flax module's
(B, T, heads, 3, ch) reshape, so no channel shuffling is needed.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax.numpy as jnp

from .unet import UNetConfig


def _resblock_entries(flax_prefix: str, torch_prefix: str, has_skip: bool):
    out = {
        f"{flax_prefix}/in_norm": (f"{torch_prefix}.in_layers.0", "groupnorm"),
        f"{flax_prefix}/in_conv": (f"{torch_prefix}.in_layers.2", "conv"),
        f"{flax_prefix}/emb_proj": (f"{torch_prefix}.emb_layers.1", "dense"),
        f"{flax_prefix}/out_norm": (f"{torch_prefix}.out_layers.0", "groupnorm"),
        f"{flax_prefix}/out_conv": (f"{torch_prefix}.out_layers.3", "conv"),
    }
    if has_skip:
        out[f"{flax_prefix}/skip"] = (f"{torch_prefix}.skip_connection", "conv")
    return out


def _attn_entries(flax_prefix: str, torch_prefix: str):
    return {
        f"{flax_prefix}/norm": (f"{torch_prefix}.norm", "groupnorm"),
        f"{flax_prefix}/qkv": (f"{torch_prefix}.qkv", "conv1d"),
        f"{flax_prefix}/proj_out": (f"{torch_prefix}.proj_out", "conv1d"),
    }


def adm_param_mapping(cfg: UNetConfig) -> Dict[str, Tuple[str, str]]:
    """flax layer path -> (torch module prefix, kind), replicating the
    block enumeration of unet_ffhq.py:538-700."""
    m: Dict[str, Tuple[str, str]] = {
        "time_embed_1": ("time_embed.0", "dense"),
        "time_embed_2": ("time_embed.2", "dense"),
        "in_conv": ("input_blocks.0.0", "conv"),
        "out_norm": ("out.0", "groupnorm"),
        "out_conv": ("out.2", "conv"),
    }
    if cfg.num_classes is not None:
        m["label_emb"] = ("label_emb", "embed")

    mc = cfg.model_channels
    ch = int(cfg.channel_mult[0] * mc)
    input_chans = [ch]
    idx = 1
    ds = 1
    for level, mult in enumerate(cfg.channel_mult):
        out_ch = int(mult * mc)
        for i in range(cfg.num_res_blocks):
            m.update(
                _resblock_entries(
                    f"down_{level}_{i}/res", f"input_blocks.{idx}.0",
                    has_skip=(ch != out_ch),
                )
            )
            ch = out_ch
            if ds in cfg.attention_ds:
                m.update(_attn_entries(f"down_{level}_{i}/attn",
                                       f"input_blocks.{idx}.1"))
            input_chans.append(ch)
            idx += 1
        if level != len(cfg.channel_mult) - 1:
            if cfg.resblock_updown:
                m.update(
                    _resblock_entries(f"down_{level}_downres",
                                      f"input_blocks.{idx}.0", has_skip=False)
                )
            else:
                m[f"down_{level}_downsample/conv"] = (
                    f"input_blocks.{idx}.0.op", "conv")
            input_chans.append(ch)
            idx += 1
            ds *= 2

    m.update(_resblock_entries("middle/res1", "middle_block.0", has_skip=False))
    m.update(_attn_entries("middle/attn", "middle_block.1"))
    m.update(_resblock_entries("middle/res2", "middle_block.2", has_skip=False))

    idx = 0
    for level, mult in reversed(list(enumerate(cfg.channel_mult))):
        out_ch = int(mult * mc)
        for i in range(cfg.num_res_blocks + 1):
            ich = input_chans.pop()
            m.update(
                _resblock_entries(
                    f"up_{level}_{i}/res", f"output_blocks.{idx}.0",
                    has_skip=(ch + ich != out_ch),
                )
            )
            ch = out_ch
            j = 1
            if ds in cfg.attention_ds:
                m.update(_attn_entries(f"up_{level}_{i}/attn",
                                       f"output_blocks.{idx}.{j}"))
                j += 1
            if level and i == cfg.num_res_blocks:
                if cfg.resblock_updown:
                    m.update(
                        _resblock_entries(f"up_{level}_{i}/upres",
                                          f"output_blocks.{idx}.{j}",
                                          has_skip=False)
                    )
                else:
                    m[f"up_{level}_{i}/upsample/conv"] = (
                        f"output_blocks.{idx}.{j}.conv", "conv")
                ds //= 2
            idx += 1
    return m


def _convert(kind: str, torch_prefix: str, sd) -> Dict[str, np.ndarray]:
    w = np.asarray(sd[f"{torch_prefix}.weight"])
    if kind == "embed":
        return {"embedding": w}
    b = np.asarray(sd[f"{torch_prefix}.bias"])
    if kind == "conv":
        return {"kernel": w.transpose(2, 3, 1, 0), "bias": b}
    if kind == "conv1d":
        return {"kernel": w[:, :, 0].T, "bias": b}
    if kind == "dense":
        return {"kernel": w.T, "bias": b}
    if kind == "groupnorm":
        return {"scale": w, "bias": b}
    raise ValueError(kind)


def port_adm_state_dict(sd, cfg: UNetConfig, dtype=jnp.float32):
    """Convert a torch state_dict (tensors or numpy arrays) into the Flax
    params tree for UNetModel(cfg). Raises if any torch key is unused."""
    sd = {k: np.asarray(getattr(v, "detach", lambda: v)().cpu().numpy()
                        if hasattr(v, "cpu") else v)
          for k, v in sd.items()}
    mapping = adm_param_mapping(cfg)

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

    unused = sorted(set(sd) - used)
    if unused:
        raise ValueError(f"unported torch keys ({len(unused)}): {unused[:10]}")
    return {"params": params}


def load_adm_checkpoint(path: str, cfg: UNetConfig, dtype=jnp.float32):
    """torch.load a reference checkpoint file and port it."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return port_adm_state_dict(sd, cfg, dtype)
