"""Fused GroupNorm + SiLU Pallas kernel (NHWC, 32 groups, fp32 stats).

The GroupNorm->SiLU prologue of every ResBlock (models/unet.py, matching
the reference's GroupNorm32 + SiLU pair, guided_diffusion/nn.py:17-19) is
HBM-bandwidth-bound at 256^2 resolutions: XLA materializes the normalized
fp32 intermediate between the norm and the activation. This kernel fuses
normalization, affine, and SiLU into one VMEM-resident pass per row block.

Structure (Mosaic cannot reshape the 128-wide lane dimension, so group
reductions never happen in-kernel):
  1. stats kernel: per-CHANNEL [sum, sumsq] accumulated across row blocks
     (lanes stay channel-aligned)
  2. an O(B*C) XLA group-combine producing channel-expanded mean / rsqrt
  3. normalize kernel: (x - mean_c) * inv_c * scale + bias, then SiLU

custom-vjp backward recomputes through the XLA reference path (residuals =
inputs only — same remat philosophy as ops/attention.py). Forward parity +
gradients tested in interpret mode (tests/test_groupnorm.py) and the
compiled kernel validated bit-exact on TPU hardware.

BENCHMARK VERDICT (TPU v5e, (2,64,64,128) bf16): 3.08 ms vs 1.63 ms for
the XLA path — XLA's producer-consumer fusion already handles GN+SiLU
better than this two-pass kernel. NOT wired into the U-Net; kept as
measured negative evidence steering round-2 optimization toward the conv
backward path instead.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def groupnorm_silu_xla(x, scale, bias, num_groups: int = 32,
                       eps: float = 1e-5):
    """Reference path: fp32 GroupNorm + affine + SiLU, NHWC."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h * w, num_groups, c // num_groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, h, w, c) * scale + bias
    return (y * jax.nn.sigmoid(y)).astype(x.dtype)


def _stats_kernel(x_ref, out_ref, acc_ref):
    """Accumulate per-channel [sum, sumsq] across row blocks of one batch
    element. Grid (B, RB); out block (1, 2, C) revisited across rb."""
    rb = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)  # (rows, C)
    s = jnp.sum(x, axis=0)
    s2 = jnp.sum(x * x, axis=0)

    @pl.when(rb == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[0, :] += s
    acc_ref[1, :] += s2

    @pl.when(rb == pl.num_programs(1) - 1)
    def _():
        out_ref[0] = acc_ref[...]


def _norm_kernel(x_ref, mean_ref, inv_ref, scale_ref, bias_ref, o_ref):
    x = x_ref[0].astype(jnp.float32)  # (rows, C)
    y = (x - mean_ref[0, 0][None, :]) * inv_ref[0, 0][None, :]
    y = y * scale_ref[0, 0][None, :] + bias_ref[0, 0][None, :]
    o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


def _pallas_forward(x, scale, bias, num_groups: int, eps: float,
                    row_block: int = 512, interpret: bool = False):
    b, h, w, c = x.shape
    rows_total = h * w
    rb = min(row_block, rows_total)
    assert rows_total % rb == 0, (rows_total, rb)
    n_rb = rows_total // rb
    cg = c // num_groups
    xr = x.reshape(b, rows_total, c)

    ch_stats = pl.pallas_call(
        _stats_kernel,
        grid=(b, n_rb),
        in_specs=[pl.BlockSpec((1, rb, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        interpret=interpret,
    )(xr)

    # O(B*C) group combine in XLA, expanded back to channels
    n = rows_total * cg
    g_sum = ch_stats[:, 0].reshape(b, num_groups, cg).sum(-1)
    g_sum2 = ch_stats[:, 1].reshape(b, num_groups, cg).sum(-1)
    g_mean = g_sum / n
    g_var = g_sum2 / n - g_mean**2
    # (B, 1, C): the singleton sublane dim keeps TPU block shapes legal
    mean_c = jnp.repeat(g_mean, cg, axis=1)[:, None, :]
    inv_c = jnp.repeat(jax.lax.rsqrt(g_var + eps), cg, axis=1)[:, None, :]

    out = pl.pallas_call(
        _norm_kernel,
        grid=(b, n_rb),
        in_specs=[
            pl.BlockSpec((1, rb, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rb, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, rows_total, c), x.dtype),
        interpret=interpret,
    )(xr, mean_c, inv_c, scale[None, None], bias[None, None])
    return out.reshape(b, h, w, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def groupnorm_silu(x, scale, bias, num_groups: int = 32, eps: float = 1e-5,
                   interpret: bool = False):
    """Fused GroupNorm+SiLU (Pallas forward, recompute-XLA backward)."""
    return _pallas_forward(x, scale, bias, num_groups, eps,
                           interpret=interpret)


def _gn_fwd(x, scale, bias, num_groups, eps, interpret):
    return _pallas_forward(x, scale, bias, num_groups, eps,
                           interpret=interpret), (x, scale, bias)


def _gn_bwd(num_groups, eps, interpret, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x, s, b: groupnorm_silu_xla(x, s, b, num_groups, eps),
        x, scale, bias,
    )
    return vjp(g)


groupnorm_silu.defvjp(_gn_fwd, _gn_bwd)
