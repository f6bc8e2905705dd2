"""Op-level attribution microbench for the flagship U-Net shapes.

Benchmarks each constituent op of the ADM 256^2/ch128 U-Net (the hot path
of the N-HMC energy+grad, ref main_sampling.py:693-715) at its exact shape,
forward and backward, and reports achieved TFLOP/s per op. Summing the
per-op ideal times against the measured whole-program time attributes the
~4x roofline gap (BASELINE.md round-1 conclusion) to specific shapes.

Usage: python scripts/opbench.py [batch]
Writes JSON lines to scripts/opbench_results.jsonl.
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def bench(fn, *args, iters=20):
    import jax
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    # double-timing: report best of two passes to dodge host jitter
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import jax
    import jax.numpy as jnp
    from nshmc_tpu.utils.profiling import enable_persistent_cache
    enable_persistent_cache()

    key = jax.random.PRNGKey(0)
    results = []

    def record(name, sec, flops, note=""):
        rec = {"op": name, "batch": batch, "sec": round(sec, 6),
               "gflop": round(flops / 1e9, 2),
               "tflops_s": round(flops / sec / 1e12, 1), "note": note}
        results.append(rec)
        print(json.dumps(rec))

    # ---- 3x3 convs at every (resolution, cin, cout) the flagship hits ----
    conv_shapes = [
        (256, 3, 128), (256, 128, 128),
        (128, 128, 128), (128, 128, 256),  # level1->2 transition via skip
        (64, 128, 256), (64, 256, 256),
        (32, 256, 256), (32, 256, 512),
        (16, 256, 512), (16, 512, 512),
        (8, 512, 512),
        # decoder concat shapes (cin = ch + skip)
        (256, 256, 128), (64, 512, 256), (16, 1024, 512),
    ]
    for (r, cin, cout) in conv_shapes:
        x = jax.random.normal(key, (batch, r, r, cin), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, cin, cout), jnp.bfloat16) * 0.02

        def f(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        flops = 2 * batch * r * r * cin * cout * 9
        sec = bench(f, x, w)
        record(f"conv3x3_{r}x{r}_{cin}->{cout}_fwd", sec, flops)

        # backward (both cotangents): dx (conv with transposed w) + dw
        def g(x, w):
            y, vjp = jax.vjp(f, x, w)
            return vjp(y)

        sec = bench(g, x, w)
        record(f"conv3x3_{r}x{r}_{cin}->{cout}_fwd+bwd", sec, 3 * flops)

    # ---- fp32 GroupNorm island + SiLU at the big shapes ----
    for (r, c) in [(256, 128), (128, 128), (64, 256), (16, 512)]:
        x = jax.random.normal(key, (batch, r, r, c), jnp.bfloat16)
        scale = jnp.ones((c,), jnp.float32)
        bias = jnp.zeros((c,), jnp.float32)

        def gn(x, scale, bias):
            xf = x.astype(jnp.float32)
            grp = xf.reshape(batch, r, r, 32, c // 32)
            mean = grp.mean(axis=(1, 2, 4), keepdims=True)
            var = grp.var(axis=(1, 2, 4), keepdims=True)
            n = ((grp - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(x.shape)
            y = n * scale + bias
            return (y * jax.nn.sigmoid(y)).astype(x.dtype)

        nbytes = batch * r * r * c * 2 * 2  # read+write bf16
        sec = bench(gn, x, scale, bias)
        rec = {"op": f"groupnorm32+silu_{r}x{r}_c{c}", "batch": batch,
               "sec": round(sec, 6),
               "gb_s": round(nbytes / sec / 1e9, 1), "note": "bandwidth op"}
        results.append(rec)
        print(json.dumps(rec))

    # ---- attention at ds16 (16x16=256 tokens, 512 ch, 8 heads/64) ----
    from nshmc_tpu.ops.attention import attention
    toks, heads, hc = 256, 8, 64
    q = jax.random.normal(key, (batch, toks, heads, hc), jnp.bfloat16)

    def att(q):
        return attention(q, q, q)

    flops = 2 * batch * heads * toks * toks * hc * 2
    sec = bench(att, q)
    record("attention_256tok_8h64", sec, flops)

    # ---- whole ResBlock fwd+bwd at the dominant 256^2 shape ----
    from nshmc_tpu.models.unet import ResBlock
    rb = ResBlock(128, True, dtype=jnp.bfloat16)
    x = jax.random.normal(key, (batch, 256, 256, 128), jnp.float32)
    emb = jax.random.normal(key, (batch, 512), jnp.float32)
    params = rb.init(jax.random.PRNGKey(1), x, emb)

    def rb_loss(x):
        return jnp.sum(rb.apply(params, x, emb).astype(jnp.float32) ** 2)

    conv_flops = 2 * batch * 256 * 256 * 128 * 128 * 9 * 2  # two 3x3 convs
    sec = bench(rb_loss, x)
    record("resblock_256x256_c128_fwd", sec, conv_flops)
    sec = bench(jax.value_and_grad(rb_loss), x)
    record("resblock_256x256_c128_fwd+bwd", sec, 3 * conv_flops)

    with open(os.path.join(os.path.dirname(__file__),
                           "opbench_results.jsonl"), "a") as f:
        for rec in results:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
