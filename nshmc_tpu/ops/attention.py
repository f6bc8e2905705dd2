"""Spatial self-attention for the U-Net attention blocks.

The reference computes full quadratic attention over flattened spatial tokens
(guided_diffusion/unet_ffhq.py:399-460 QKVAttentionLegacy; token counts are
256 at pixel ds16 and 64/256/1024 for the latent U-Net). Numerics match the
reference: q and k are pre-scaled by ch^(-1/4) and the softmax runs in
float32.

Two paths:
  - `attention_xla`: einsum attention; at these token counts XLA already fuses
    this well onto the MXU.
  - `attention_pallas`: a fused single-kernel attention (VMEM-resident,
    online-softmax-free since T <= 1024 fits easily) used on TPU for the hot
    256-token / 512-channel pixel shape.
`attention` dispatches by platform/shape.
"""
from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp

try:  # Pallas is TPU-only; keep import soft for CPU test runs
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def attention_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """q, k, v: (B, T, H, ch) -> (B, T, H, ch)."""
    ch = q.shape[-1]
    scale = 1.0 / math.sqrt(math.sqrt(ch))
    logits = jnp.einsum("bthc,bshc->bhts", q * scale, k * scale)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bshc->bthc", weights, v)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref):
    # Block shapes: (ch, T) per (batch*head) grid step — tokens live in the
    # 128-lane minor dimension (T is a multiple of 128), head channels in
    # sublanes. Full T x T logits stay in VMEM/registers.
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    ch = q.shape[0]
    scale = 1.0 / math.sqrt(math.sqrt(ch))
    # logits[t, s] = sum_c q[c, t] k[c, s]
    logits = jax.lax.dot_general(
        (q * scale), (k * scale),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    # out[c, t] = sum_s v[c, s] weights[t, s]
    o_ref[:] = jax.lax.dot_general(
        v, weights,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=())
def attention_pallas(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Fused attention: one grid step per (batch, head), everything in VMEM.

    Requires T % 128 == 0 and T*ch VMEM-resident (T <= 1024, ch <= 128 —
    the framework's attention shapes). Returns (B, T, H, ch).
    """
    b, t, h, ch = q.shape

    def to_bh(x):  # (B, T, H, ch) -> (B*H, ch, T)
        return x.transpose(0, 2, 3, 1).reshape(b * h, ch, t)

    qh, kh, vh = to_bh(q), to_bh(k), to_bh(v)
    spec = pl.BlockSpec((1, ch, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        lambda qr, kr, vr, orf: _attn_kernel(
            qr.at[0], kr.at[0], vr.at[0], orf.at[0]
        ),
        grid=(b * h,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b * h, ch, t), q.dtype),
    )(qh, kh, vh)
    return out.reshape(b, h, ch, t).transpose(0, 3, 1, 2)


@jax.custom_vjp
def attention_fused(q, k, v):
    """Pallas forward with a hand-written backward (pallas_call has no
    automatic vjp). The backward recomputes the softmax weights with XLA
    einsums — cheap relative to the convs, and recomputation keeps the
    residual memory at just (q, k, v), mirroring the reference's
    checkpointed attention (guided_diffusion/unet_ffhq.py:367-368)."""
    return attention_pallas(q, k, v)


def _attention_fwd(q, k, v):
    return attention_pallas(q, k, v), (q, k, v)


def _attention_bwd(res, g):
    q, k, v = res
    ch = q.shape[-1]
    scale2 = 1.0 / math.sqrt(ch)  # (ch^-1/4)^2
    z = jnp.einsum("bthc,bshc->bhts", q, k) * scale2
    w = jax.nn.softmax(z.astype(jnp.float32), axis=-1)
    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dv = jnp.einsum("bhts,bthc->bshc", w, g32)
    dw = jnp.einsum("bthc,bshc->bhts", g32, v32)
    dz = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
    dq = jnp.einsum("bhts,bshc->bthc", dz, k.astype(jnp.float32)) * scale2
    dk = jnp.einsum("bhts,bthc->bshc", dz, q.astype(jnp.float32)) * scale2
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


attention_fused.defvjp(_attention_fwd, _attention_bwd)


def attention(q, k, v, use_pallas: bool | None = None):
    """Dispatch fused attention. q/k/v: (B, T, H, ch)."""
    if use_pallas is None:
        b, t, h, ch = q.shape
        use_pallas = (
            _HAS_PALLAS
            and os.environ.get("NSHMC_DISABLE_PALLAS", "") != "1"
            and jax.default_backend() == "tpu"
            and t % 128 == 0
            and ch % 8 == 0
            and t * ch * 4 <= 4 * 1024 * 1024
        )
    if use_pallas:
        return attention_fused(q, k, v)
    return attention_xla(q, k, v)
