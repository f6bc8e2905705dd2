"""Round-2 GN/reduction strategy microbench at the flagship hot shape.

Round-1 attribution (scripts/trace_classify.json) put ~51% of flagship
energy+grad device time in norm-stats reduce fusions, and membench.py
measured a plain XLA reduce at 133 GB/s = 16% of v5e peak. This probe
compares concrete GroupNorm formulations at (8,256,256,128) bf16 to pick
the one the U-Net should use (models/nn.py), all loop-amortized so the
axon relay's per-call dispatch cost is excluded:

  reduce_full        sum(x^2) baseline (round-1: 133 GB/s)
  reduce_spatial     per-channel sums over (H,W) -> (B,C)
  reduce_dot         per-channel sums via dot_general (ones contraction,
                     rides the MXU's streaming path)
  gn_flax            group-reshape mean/var (what flax GroupNorm lowers to)
  gn_chan            per-channel sum/sumsq + O(B*C) group combine
  gn_chan_dot        same but sums via the ones-dot trick
  gn_*_vjp           value_and_grad of sum(silu(gn(x))) per formulation
  pallas_fwd         ops/groupnorm.py fused kernel (round-1 verdict was at
                     the tiny (2,64,64,128) shape only)

Usage: python scripts/membench2.py [B] [R] [C] [iters]
Writes scripts/membench2.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    C = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 30
    G = 32

    import jax
    import jax.numpy as jnp
    from nshmc_tpu.utils.profiling import enable_persistent_cache
    enable_persistent_cache()

    x = jax.random.normal(jax.random.PRNGKey(0), (B, R, R, C), jnp.bfloat16)
    scale = jnp.ones((C,), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)
    nbytes = B * R * R * C * 2

    def gn_flax(xx):
        xf = xx.astype(jnp.float32).reshape(B, R * R, G, C // G)
        mean = xf.mean(axis=(1, 3), keepdims=True)
        var = xf.var(axis=(1, 3), keepdims=True)
        y = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(B, R, R, C)
        y = y * scale + bias
        return (y * jax.nn.sigmoid(y)).astype(xx.dtype)

    def _chan_stats_reduce(xx):
        xf = xx.astype(jnp.float32)
        s = jnp.sum(xf, axis=(1, 2))          # (B, C)
        s2 = jnp.sum(xf * xf, axis=(1, 2))    # (B, C)
        return s, s2

    def _chan_stats_dot(xx):
        xr = xx.reshape(B, R * R, C)
        ones = jnp.ones((R * R,), jnp.bfloat16)
        # MXU path: contract the spatial dim with a ones vector; f32 accum
        s = jax.lax.dot_general(
            ones, xr, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)      # (B, C)
        s2 = jax.lax.dot_general(
            xr, xr, (((1,), (1,)), ((0, 2), (0, 2))),
            preferred_element_type=jnp.float32)      # (B, C) diag gram
        return s, s2

    def _gn_from_chan(xx, s, s2):
        n = R * R * (C // G)
        gs = s.reshape(B, G, C // G).sum(-1)
        gs2 = s2.reshape(B, G, C // G).sum(-1)
        mean = gs / n
        var = gs2 / n - mean ** 2
        inv = jax.lax.rsqrt(var + 1e-5)
        mean_c = jnp.repeat(mean, C // G, axis=1)[:, None, None, :]
        inv_c = jnp.repeat(inv, C // G, axis=1)[:, None, None, :]
        y = (xx.astype(jnp.float32) - mean_c) * inv_c * scale + bias
        return (y * jax.nn.sigmoid(y)).astype(xx.dtype)

    def gn_chan(xx):
        return _gn_from_chan(xx, *_chan_stats_reduce(xx))

    def gn_chan_dot(xx):
        return _gn_from_chan(xx, *_chan_stats_dot(xx))

    def tensor_loop(step):
        def body(i, xc):
            return step(xc + jnp.bfloat16(1e-8) * i.astype(jnp.bfloat16))
        return jax.jit(lambda x: jax.lax.fori_loop(0, iters, body, x))

    def scalar_loop(fn):
        def body(i, acc):
            return acc + fn(x + acc.astype(jnp.bfloat16) * 0)
        return jax.jit(lambda x: jax.lax.fori_loop(
            0, iters, body, jnp.zeros((), jnp.float32)))

    def vjp_loop(gnf):
        def body(i, xc):
            g = jax.grad(lambda xx: jnp.sum(gnf(xx).astype(jnp.float32)))(xc)
            return xc - jnp.bfloat16(1e-6) * g
        return jax.jit(lambda x: jax.lax.fori_loop(0, iters, body, x))

    cases = {
        "reduce_full": (scalar_loop(
            lambda xx: jnp.sum(xx.astype(jnp.float32) ** 2)), 1),
        "reduce_spatial": (scalar_loop(
            lambda xx: jnp.sum(_chan_stats_reduce(xx)[0])), 1),
        "reduce_dot": (scalar_loop(
            lambda xx: jnp.sum(_chan_stats_dot(xx)[0])), 1),
        "gn_flax_fwd": (tensor_loop(gn_flax), 2),
        "gn_chan_fwd": (tensor_loop(gn_chan), 2),
        "gn_chan_dot_fwd": (tensor_loop(gn_chan_dot), 2),
        "gn_flax_vjp": (vjp_loop(gn_flax), 5),
        "gn_chan_vjp": (vjp_loop(gn_chan), 5),
        "gn_chan_dot_vjp": (vjp_loop(gn_chan_dot), 5),
    }

    try:
        from nshmc_tpu.ops.groupnorm import _pallas_forward

        cases["pallas_fwd"] = (tensor_loop(
            lambda xx: _pallas_forward(xx, scale, bias, G, 1e-5)), 2)
    except Exception as e:  # pragma: no cover
        print("pallas unavailable:", e)

    results = {}
    for name, (f, passes) in cases.items():
        t0 = time.perf_counter()
        out = f(x)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = f(x)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        gbs = passes * nbytes / dt / 1e9
        results[name] = {"s_per_iter": round(dt, 5),
                         "model_gb_s": round(gbs, 1),
                         "pct_819": round(100 * gbs / 819, 1),
                         "compile_s": round(compile_s, 1)}
        print(name, json.dumps(results[name]), flush=True)
        # append incrementally: relay compiles are ~10 min/program, keep
        # partial results if the run is cut short
        with open(os.path.join(os.path.dirname(__file__),
                               "membench2.jsonl"), "a") as f:
            f.write(json.dumps({"case": name, **results[name]}) + "\n")

    with open(os.path.join(os.path.dirname(__file__), "membench2.json"),
              "w") as f:
        json.dump({"shape": [B, R, R, C], "iters": iters, **results}, f,
                  indent=1)


if __name__ == "__main__":
    main()
