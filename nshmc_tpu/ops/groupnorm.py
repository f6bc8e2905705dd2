"""Fused GroupNorm + SiLU Pallas kernel (NHWC, 32 groups, fp32 stats).

The GroupNorm->SiLU prologue of every ResBlock (models/unet.py, matching
the reference's GroupNorm32 + SiLU pair, guided_diffusion/nn.py:17-19) is
HBM-bandwidth-bound at 256^2 resolutions: XLA materializes the normalized
fp32 intermediate between the norm and the activation. This kernel fuses
normalization, affine, and SiLU into one VMEM-resident pass per row block,
with a separate single-pass statistics kernel (two passes total, reading x
twice but writing once — vs three-plus materializations unfused).

Status: forward parity + custom-vjp gradient tested in interpret mode
(tests/test_groupnorm.py); the backward recomputes through the XLA
reference path (residuals = just x, scale, bias — same remat philosophy as
ops/attention.py). Not yet wired into the U-Net by default — flipping
models/nn.py to call `groupnorm_silu` is a round-2 benchmark decision.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

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


def _stats_kernel(x_ref, out_ref, acc_ref, *, num_groups, rows_total):
    """Accumulate per-group [sum, sumsq] across row blocks of one batch
    element. Grid (B, RB); out block (1, 2, G) revisited across rb."""
    rb = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)  # (rows, C)
    rows, c = x.shape
    cg = c // num_groups
    xg = x.reshape(rows, num_groups, cg)
    s = jnp.sum(xg, axis=(0, 2))  # (G,)
    s2 = jnp.sum(xg * xg, axis=(0, 2))

    @pl.when(rb == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[0, :] += s
    acc_ref[1, :] += s2

    @pl.when(rb == pl.num_programs(1) - 1)
    def _():
        out_ref[0] = acc_ref[...]


def _norm_kernel(x_ref, stats_ref, scale_ref, bias_ref, o_ref, *,
                 num_groups, rows_total, eps):
    x = x_ref[0].astype(jnp.float32)  # (rows, C)
    rows, c = x.shape
    cg = c // num_groups
    n = rows_total * cg
    s = stats_ref[0, 0, :]  # (G,)
    s2 = stats_ref[0, 1, :]
    mean = s / n
    var = s2 / n - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, cg)[None, :]  # (1, C)
    inv_c = jnp.repeat(inv, cg)[None, :]
    y = (x - mean_c) * inv_c * scale_ref[0][None, :] + bias_ref[0][None, :]
    o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


def _pallas_forward(x, scale, bias, num_groups: int, eps: float,
                    row_block: int = 512, interpret: bool = False):
    b, h, w, c = x.shape
    rows_total = h * w
    rb = min(row_block, rows_total)
    assert rows_total % rb == 0, (rows_total, rb)
    n_rb = rows_total // rb
    xr = x.reshape(b, rows_total, c)

    stats = pl.pallas_call(
        functools.partial(_stats_kernel, num_groups=num_groups,
                          rows_total=rows_total),
        grid=(b, n_rb),
        in_specs=[pl.BlockSpec((1, rb, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, num_groups), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2, num_groups), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, num_groups), jnp.float32)],
        interpret=interpret,
    )(xr)

    out = pl.pallas_call(
        functools.partial(_norm_kernel, num_groups=num_groups,
                          rows_total=rows_total, eps=eps),
        grid=(b, n_rb),
        in_specs=[
            pl.BlockSpec((1, rb, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, num_groups), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rb, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, rows_total, c), x.dtype),
        interpret=interpret,
    )(xr, stats, scale[None], bias[None])
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
