"""Streaming-bandwidth probe: minimal Pallas kernels vs XLA at the
flagship hot shape (8, 256*256, 128) bf16.

Measures, each inside ONE jitted fori_loop(iters) program:
  xla_reduce      jnp.sum(x^2) per channel
  pallas_reduce   row-blocked channel-sum kernel (f32 VMEM accumulator)
  pallas_gn_fwd   two-pass fused GroupNorm+SiLU (stats pass + apply pass)
  xla_gn_fwd      the XLA GroupNorm32+SiLU for the same math

Prints s/iter and effective GB/s for the minimal traffic of each op.
Usage: python scripts/pallas_stream_probe.py [iters]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    B, R, C = 8, 256, 128
    HW = R * R
    NB = B * HW * C * 2

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from nshmc_tpu.utils.profiling import enable_persistent_cache
    enable_persistent_cache()

    x = jax.random.normal(jax.random.PRNGKey(0), (B, HW, C), jnp.bfloat16)
    scale = jnp.ones((C,), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)

    RB = 2048  # rows per block: (2048, 128) bf16 = 512 KB block

    # ---- pallas channel-sum+sumsq over the whole array -------------------
    def stats_kernel(x_ref, out_ref, acc_ref):
        i = pl.program_id(0)
        xf = x_ref[0].astype(jnp.float32)

        @pl.when(pl.program_id(1) == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[0, :] += jnp.sum(xf, axis=0)
        acc_ref[1, :] += jnp.sum(xf * xf, axis=0)

        @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
        def _():
            out_ref[0] = acc_ref[...]

    def pallas_stats(x):
        return pl.pallas_call(
            stats_kernel,
            grid=(B, HW // RB),
            in_specs=[pl.BlockSpec((1, RB, C), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 2, C), lambda i, j: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 2, C), jnp.float32),
            scratch_shapes=[pltpu.VMEM((2, C), jnp.float32)],
        )(x)

    # ---- pallas fused GN+SiLU: stats pass + apply pass -------------------
    G, CG = 32, C // 32

    def apply_kernel(x_ref, mean_ref, inv_ref, scale_ref, bias_ref, o_ref):
        xf = x_ref[0].astype(jnp.float32)
        y = (xf - mean_ref[0, 0][None, :]) * inv_ref[0, 0][None, :]
        y = y * scale_ref[0, 0][None, :] + bias_ref[0, 0][None, :]
        o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)

    def pallas_gn(x):
        st = pallas_stats(x)                      # (B, 2, C) f32
        n = HW * CG
        gs = st[:, 0].reshape(B, G, CG).sum(-1)
        gs2 = st[:, 1].reshape(B, G, CG).sum(-1)
        gm = gs / n
        gv = gs2 / n - gm**2
        mean_c = jnp.repeat(gm, CG, 1)[:, None, :]
        inv_c = jnp.repeat(jax.lax.rsqrt(gv + 1e-5), CG, 1)[:, None, :]
        return pl.pallas_call(
            apply_kernel,
            grid=(B, HW // RB),
            in_specs=[
                pl.BlockSpec((1, RB, C), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, C), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, C), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, C), lambda i, j: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, C), lambda i, j: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, RB, C), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, HW, C), x.dtype),
        )(x, mean_c, inv_c, scale[None, None], bias[None, None])

    def xla_gn(x):
        xf = x.astype(jnp.float32).reshape(B, HW, G, CG)
        mean = xf.mean(axis=(1, 3), keepdims=True)
        var = xf.var(axis=(1, 3), keepdims=True)
        y = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(B, HW, C)
        y = y * scale + bias
        return (y * jax.nn.sigmoid(y)).astype(x.dtype)

    def xla_stats(x):
        xf = x.astype(jnp.float32)
        return jnp.stack([xf.sum(axis=1), (xf * xf).sum(axis=1)], axis=1)

    # correctness first
    np.testing.assert_allclose(np.asarray(pallas_stats(x)),
                               np.asarray(xla_stats(x)), rtol=2e-3, atol=2.0)
    np.testing.assert_allclose(np.asarray(pallas_gn(x)),
                               np.asarray(xla_gn(x)), rtol=5e-2, atol=5e-2)
    print("numerics OK", flush=True)

    def tensor_loop(step):
        return jax.jit(lambda x: jax.lax.fori_loop(
            0, iters, lambda i, xc: step(xc).astype(xc.dtype), x))

    def stats_loop(statfn):
        def body(i, carry):
            xc, acc = carry
            # acc*0 can't constant-fold (inf/nan semantics) and the scalar
            # broadcast add fuses into the consumer — blocks loop-invariant
            # hoisting of the stats computation without extra HBM traffic
            st = statfn(xc + (acc * 0).astype(xc.dtype))
            return xc, acc + jnp.sum(st)
        return jax.jit(lambda x: jax.lax.fori_loop(
            0, iters, body, (x, jnp.zeros((), jnp.float32))))

    cases = {
        "xla_stats": (stats_loop(xla_stats), NB),
        "pallas_stats": (stats_loop(pallas_stats), NB),
        "xla_gn_fwd": (tensor_loop(xla_gn), 3 * NB),
        "pallas_gn_fwd": (tensor_loop(pallas_gn), 3 * NB),
    }
    out = {}
    for name, (f, traffic) in cases.items():
        r = f(x)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        r = f(x)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / iters
        out[name] = {"s_per_iter": round(dt, 6),
                     "eff_gb_s": round(traffic / dt / 1e9, 1)}
        print(name, json.dumps(out[name]), flush=True)
    with open(os.path.join(os.path.dirname(__file__),
                           "pallas_stream_probe.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()


def extra_probes(iters=30):
    """Pure-DMA read rate + MXU-dot stats variant."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import time as _t
    B, R, C = 8, 256, 128
    HW = R * R
    NB = B * HW * C * 2
    RB = 2048
    x = jax.random.normal(jax.random.PRNGKey(0), (B, HW, C), jnp.bfloat16)

    # every block is DMA'd in by the BlockSpec; the kernel touches one row
    # -> measures the raw HBM->VMEM streaming rate
    def touch_kernel(x_ref, o_ref):
        o_ref[0, 0, :] = x_ref[0, 0, :].astype(jnp.float32)

    def dma_read(x):
        return pl.pallas_call(
            touch_kernel,
            grid=(B, HW // RB),
            in_specs=[pl.BlockSpec((1, RB, C), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, C), lambda i, j: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
        )(x)

    # stats via MXU: s = ones @ x, s2 = ones @ (x*x f32)
    def mxu_stats_kernel(x_ref, out_ref, acc_ref):
        xb = x_ref[0]                       # (RB, C) bf16
        ones = jnp.ones((8, RB), jnp.bfloat16)
        s = jax.lax.dot(ones, xb, preferred_element_type=jnp.float32)[:1]
        xf = xb.astype(jnp.float32)
        s2 = jax.lax.dot(jnp.ones((8, RB), jnp.float32), xf * xf,
                         preferred_element_type=jnp.float32)[:1]

        @pl.when(pl.program_id(1) == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[0:1, :] += s
        acc_ref[1:2, :] += s2

        @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
        def _():
            out_ref[0] = acc_ref[...]

    def mxu_stats(x):
        return pl.pallas_call(
            mxu_stats_kernel,
            grid=(B, HW // RB),
            in_specs=[pl.BlockSpec((1, RB, C), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 2, C), lambda i, j: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 2, C), jnp.float32),
            scratch_shapes=[pltpu.VMEM((2, C), jnp.float32)],
        )(x)

    import numpy as np
    ref = np.stack([np.asarray(x, np.float32).sum(1),
                    (np.asarray(x, np.float32) ** 2).sum(1)], 1)
    np.testing.assert_allclose(np.asarray(mxu_stats(x)), ref, rtol=2e-3,
                               atol=2.0)
    print("mxu stats numerics OK", flush=True)

    def stats_loop(statfn):
        def body(i, carry):
            xc, acc = carry
            st = statfn(xc + (acc * 0).astype(xc.dtype))
            return xc, acc + jnp.sum(st)
        return jax.jit(lambda x: jax.lax.fori_loop(
            0, iters, body, (x, jnp.zeros((), jnp.float32))))

    for name, fn in {"pallas_dma_read": dma_read,
                     "pallas_mxu_stats": mxu_stats}.items():
        f = stats_loop(fn)
        r = f(x)
        jax.block_until_ready(r)
        t0 = _t.perf_counter()
        r = f(x)
        jax.block_until_ready(r)
        dt = (_t.perf_counter() - t0) / iters
        print(name, json.dumps({"s_per_iter": round(dt, 6),
                                "eff_gb_s": round(NB / dt / 1e9, 1)}),
              flush=True)


if __name__ == "__main__" and os.environ.get("PROBE_EXTRA"):
    extra_probes()
