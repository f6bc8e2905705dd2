"""Cross-attention SpatialTransformer stack for conditional LDMs.

TPU-native (Flax/NHWC) equivalent of the reference's transformer blocks
(ref: ldm/modules/attention.py:36-63 GEGLU/FeedForward, :150-192
CrossAttention, :194-215 BasicTransformerBlock, :218-261
SpatialTransformer). The repo's live configs are unconditional (the
latent U-Net uses plain AttnBlock paths), so this closes the conditional
surface: SpatialTransformer is what openaimodel.UNetModel inserts when
`context_dim` is set (ldm/modules/diffusionmodules/openaimodel.py:413).

Numerics match the reference:
  - attention scale d_head^-0.5 (applied as ch^-1/4 on q and k inside
    ops/attention.py, identical math), softmax in float32
  - GEGLU feedforward: Linear -> (x, gate) split -> x * gelu(gate)
  - pre-LayerNorm residual blocks in the torch order
    (self-attn -> cross-attn -> ff)
  - GroupNorm(32, eps=1e-6) + 1x1 conv in/out, zero-init proj_out

Weight porting from the torch layout is `port_spatial_transformer`
(tested against a synthetic state_dict with the exact reference key
names in tests/test_transformer.py).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops.attention import attention_xla
from ..nn import conv, dense

Dtype = Any


class GEGLU(nn.Module):
    """x * gelu(gate) with a fused 2x projection
    (ref: ldm/modules/attention.py:36-43)."""

    dim_out: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(2 * self.dim_out, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="proj")(x)
        x, gate = jnp.split(h, 2, axis=-1)
        return x * nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    """Gated (GEGLU) feedforward, mult=4
    (ref: ldm/modules/attention.py:46-63; dropout inert at inference)."""

    dim: int
    mult: int = 4
    glu: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = int(self.dim * self.mult)
        if self.glu:
            h = GEGLU(inner, dtype=self.dtype, param_dtype=self.param_dtype,
                      name="in_proj")(x)
        else:
            h = nn.Dense(inner, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="in_proj")(x)
            h = nn.gelu(h, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="out_proj")(h)


class CrossAttention(nn.Module):
    """Multi-head cross-attention; self-attention when context is None
    (ref: ldm/modules/attention.py:150-192). q/k/v projections are
    bias-free; output projection has bias. Softmax runs in float32 with the
    d_head^-0.5 scale (ops/attention.py applies it as ch^-1/4 on q and k)."""

    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="to_v")(ctx)
        b, t, _ = q.shape
        s = k.shape[1]
        q = q.reshape(b, t, self.heads, self.dim_head)
        k = k.reshape(b, s, self.heads, self.dim_head)
        v = v.reshape(b, s, self.heads, self.dim_head)
        out = attention_xla(q, k, v).reshape(b, t, inner)
        return nn.Dense(self.query_dim, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="to_out")(out)


class BasicTransformerBlock(nn.Module):
    """Pre-norm self-attn -> cross-attn -> GEGLU-ff residual block
    (ref: ldm/modules/attention.py:194-215)."""

    dim: int
    n_heads: int
    d_head: int
    context_dim: Optional[int] = None
    gated_ff: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        attn_kw = dict(heads=self.n_heads, dim_head=self.d_head,
                       dtype=self.dtype, param_dtype=self.param_dtype)
        x = CrossAttention(self.dim, name="attn1", **attn_kw)(
            nn.LayerNorm(param_dtype=self.param_dtype, name="norm1")(x)) + x
        x = CrossAttention(self.dim, context_dim=self.context_dim,
                           name="attn2", **attn_kw)(
            nn.LayerNorm(param_dtype=self.param_dtype, name="norm2")(x),
            context=context) + x
        x = FeedForward(self.dim, glu=self.gated_ff, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="ff")(
            nn.LayerNorm(param_dtype=self.param_dtype, name="norm3")(x)) + x
        return x


class SpatialTransformer(nn.Module):
    """Image-shaped transformer: GroupNorm -> 1x1 proj_in -> token blocks
    -> zero-init 1x1 proj_out, residual (ref: ldm/modules/attention.py:
    218-261). Input/output NHWC."""

    in_channels: int
    n_heads: int
    d_head: int
    depth: int = 1
    context_dim: Optional[int] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        b, h, w, c = x.shape
        inner = self.n_heads * self.d_head
        x_in = x
        # reference Normalize: GroupNorm(32, eps=1e-6), computed fp32
        hx = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32,
                          param_dtype=self.param_dtype, name="norm")(
            x.astype(jnp.float32)).astype(x.dtype)
        hx = conv(inner, kernel=1, padding=0, dtype=self.dtype,
                  param_dtype=self.param_dtype, name="proj_in")(hx)
        tokens = hx.reshape(b, h * w, inner)
        for i in range(self.depth):
            tokens = BasicTransformerBlock(
                inner, self.n_heads, self.d_head,
                context_dim=self.context_dim, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"block_{i}")(
                tokens, context=context)
        hx = tokens.reshape(b, h, w, inner)
        hx = conv(self.in_channels, kernel=1, padding=0, zero_init=True,
                  dtype=self.dtype, param_dtype=self.param_dtype,
                  name="proj_out")(hx)
        return hx + x_in


def port_spatial_transformer(sd: dict, prefix: str = "") -> dict:
    """Map a torch SpatialTransformer state_dict subtree (reference key
    layout, ldm/modules/attention.py:218-261) onto the Flax param tree.

    torch -> flax:
      norm.{weight,bias}                  -> norm.{scale,bias}
      proj_in.{weight,bias}   (1x1 conv)  -> proj_in.{kernel HWIO, bias}
      transformer_blocks.{i}.attn{1,2}.to_{q,k,v}.weight -> block_{i}.attn{1,2}.to_{q,k,v}.kernel (transposed)
      transformer_blocks.{i}.attn{1,2}.to_out.0.{weight,bias} -> ...to_out.{kernel,bias}
      transformer_blocks.{i}.ff.net.0.proj.* -> block_{i}.ff.in_proj.proj.*
      transformer_blocks.{i}.ff.net.2.*      -> block_{i}.ff.out_proj.*
      transformer_blocks.{i}.norm{1,2,3}.*   -> block_{i}.norm{1,2,3}.{scale,bias}
    """
    import numpy as np

    def g(name):
        return np.asarray(sd[prefix + name])

    def lin(name, bias=True):
        out = {"kernel": g(name + ".weight").T}
        if bias:
            out["bias"] = g(name + ".bias")
        return out

    def conv1x1(name):
        # torch (O, I, 1, 1) -> flax HWIO (1, 1, I, O)
        wt = g(name + ".weight")
        return {"kernel": wt.transpose(2, 3, 1, 0), "bias": g(name + ".bias")}

    def ln(name):
        return {"scale": g(name + ".weight"), "bias": g(name + ".bias")}

    params = {
        "norm": ln("norm"),
        "proj_in": conv1x1("proj_in"),
        "proj_out": conv1x1("proj_out"),
    }
    i = 0
    while any(key.startswith(f"{prefix}transformer_blocks.{i}.")
              for key in sd):
        tb = f"transformer_blocks.{i}."
        params[f"block_{i}"] = {
            "norm1": ln(tb + "norm1"),
            "norm2": ln(tb + "norm2"),
            "norm3": ln(tb + "norm3"),
            "attn1": {
                "to_q": lin(tb + "attn1.to_q", bias=False),
                "to_k": lin(tb + "attn1.to_k", bias=False),
                "to_v": lin(tb + "attn1.to_v", bias=False),
                "to_out": lin(tb + "attn1.to_out.0"),
            },
            "attn2": {
                "to_q": lin(tb + "attn2.to_q", bias=False),
                "to_k": lin(tb + "attn2.to_k", bias=False),
                "to_v": lin(tb + "attn2.to_v", bias=False),
                "to_out": lin(tb + "attn2.to_out.0"),
            },
            "ff": {
                "in_proj": {"proj": lin(tb + "ff.net.0.proj")},
                "out_proj": lin(tb + "ff.net.2"),
            },
        }
        i += 1
    return {"params": params}
