"""HBM-bandwidth microbench at the flagship hot shape (8,256,256,128).

Each measurement runs N iterations inside ONE jitted fori_loop program so
the axon relay's per-call dispatch (~1-2 s) is amortized away. Reports
achieved GB/s against the v5e peak (819 GB/s) for:
  copy            y = x * 1.0001            (read + write)
  reduce          s += sum(x * x)           (read only)
  gn_stats        per-group mean/var        (read only, f32 accum)
  gn_fwd          full GroupNorm32 + SiLU   (read + write)
  gn_vjp          value_and_grad of sum(gn) (3x read + 2x write-ish)

Usage: python scripts/membench.py [B] [R] [C] [iters]
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

    import jax
    import jax.numpy as jnp
    from nshmc_tpu.utils.profiling import enable_persistent_cache
    enable_persistent_cache()

    x = jax.random.normal(jax.random.PRNGKey(0), (B, R, R, C), jnp.bfloat16)
    scale = jnp.ones((C,), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)
    nbytes = B * R * R * C * 2

    def gn(x):
        xf = x.astype(jnp.float32).reshape(B, R * R, 32, C // 32)
        mean = xf.mean(axis=(1, 3), keepdims=True)
        var = xf.var(axis=(1, 3), keepdims=True)
        y = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(B, R, R, C)
        y = y * scale + bias
        return (y * jax.nn.sigmoid(y)).astype(x.dtype)

    def tensor_loop(step):
        """carry the full tensor: forces a real read+write every iter."""
        return jax.jit(lambda x: jax.lax.fori_loop(
            0, iters, lambda i, xc: step(xc).astype(xc.dtype), x))

    def scalar_loop(fn):
        """carry a scalar accumulator; the tensor input is perturbed by it
        so iterations serialize (the elementwise add fuses into the
        consumer reduce — traffic stays ~1 read)."""
        def body(i, acc):
            return acc + fn(x + acc.astype(jnp.bfloat16) * 0)
        return jax.jit(lambda x: jax.lax.fori_loop(
            0, iters, body, jnp.zeros((), jnp.float32)))

    cases = {
        "copy": (tensor_loop(lambda xc: xc * jnp.bfloat16(1.0001)), x),
        "reduce": (scalar_loop(
            lambda xx: jnp.sum(xx.astype(jnp.float32) ** 2)), x),
        "gn_stats": (scalar_loop(
            lambda xx: jnp.sum(
                xx.astype(jnp.float32).reshape(B, R * R, 32, C // 32)
                .mean(axis=(1, 3)))), x),
        "gn_fwd": (tensor_loop(gn), x),
        "gn_vjp": (tensor_loop(
            lambda xc: xc - 1e-6 * jax.grad(
                lambda xx: jnp.sum(gn(xx).astype(jnp.float32)))(xc)), x),
    }
    # traffic model per case (bytes per iteration)
    traffic = {
        "copy": 2 * nbytes,       # read x + write y
        "reduce": nbytes,
        "gn_stats": nbytes,
        "gn_fwd": 2 * nbytes,
        "gn_vjp": 5 * nbytes,     # fwd r+w, bwd reads x,g + writes dx
    }

    results = {}
    for name, (f, arg) in cases.items():
        out = f(arg)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = f(arg)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        gbs = traffic[name] / dt / 1e9
        results[name] = {"s_per_iter": round(dt, 5),
                         "model_gb_s": round(gbs, 1),
                         "pct_819": round(100 * gbs / 819, 1)}
        print(name, json.dumps(results[name]))

    with open(os.path.join(os.path.dirname(__file__), "membench.json"),
              "w") as f:
        json.dump({"shape": [B, R, R, C], "iters": iters, **results}, f,
                  indent=1)


if __name__ == "__main__":
    main()
