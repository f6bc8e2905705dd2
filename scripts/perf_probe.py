"""Performance probe: energy+grad throughput across configs.

Usage: python scripts/perf_probe.py b8          # batch 8, remat on
       python scripts/perf_probe.py b4-noremat  # batch 4, remat off
       python scripts/perf_probe.py b4-fwd      # forward only
Writes one JSON line per run to scripts/perf_results.jsonl.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "b4"
    parts = tag.split("-")
    batch = int(parts[0][1:])
    remat = "full"
    if "noremat" in parts:
        remat = "none"
    if "attnremat" in parts:
        remat = "attn"
    min_res = 128
    for p in parts:
        if p.startswith("bigremat"):
            remat = "big"
            if p[len("bigremat"):]:
                min_res = int(p[len("bigremat"):])
    fwd_only = "fwd" in parts
    xla_attn = "xlaattn" in parts
    # "chainN": fuse N energy+grad evals into ONE device call
    # (lax.fori_loop) to separate relay/dispatch overhead from device time
    chain_n = 0
    for p in parts:
        if p.startswith("chain"):
            chain_n = int(p[5:])
    f32 = "f32" in parts
    p16 = "p16" in parts
    gn16 = "gn16" in parts
    unroll = "unroll" in parts
    gnchan = "gnchan" in parts

    import jax
    import jax.numpy as jnp

    from nshmc_tpu.utils.profiling import enable_persistent_cache
    enable_persistent_cache()

    from nshmc_tpu.models.unet import UNetConfig, UNetModel
    from nshmc_tpu.schedules import DiffusionSchedule, DDIMSequence
    from nshmc_tpu.sampling.ddim import make_decoder
    from nshmc_tpu.operators import Inpainting

    if xla_attn:
        import nshmc_tpu.ops.attention as attn_mod

        attn_mod._HAS_PALLAS = False

    cfg = UNetConfig.from_model_yaml(
        image_size=256, num_channels=128, num_res_blocks=1, channel_mult="",
        learn_sigma=True, attention_resolutions=16, num_heads=4,
        num_head_channels=64, use_scale_shift_norm=True, resblock_updown=True,
    )
    cfg = UNetConfig(**{**cfg.__dict__, "remat": remat, "norm_fp32": not gn16,
                        "gn_impl": "chan" if gnchan else "flax",
                        "remat_min_res": min_res})
    d = cfg.image_size
    dtype = jnp.float32 if f32 else jnp.bfloat16
    model = UNetModel(cfg, dtype=dtype)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, d, d, 3)),
                        jnp.zeros((1,)))
    if p16:  # store master weights in bf16 to halve weight HBM traffic
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)

    sched = DiffusionSchedule.create(num_timesteps=1000)
    seq = DDIMSequence.create(1000, 3)
    decode = make_decoder(lambda x, t: model.apply(params, x, t), sched, seq,
                          unroll=unroll)

    rng = np.random.default_rng(0)
    perm = rng.permutation(d * d)[: int(d * d * 0.92)]
    mr = 3 * perm
    op = Inpainting.create(3, d, np.sort(np.concatenate([mr, mr + 1, mr + 2])))
    y0 = op.H_img(jnp.zeros((1, d, d, 3)))[0]

    def loss(x):
        x0 = decode(x)
        r = y0[None] - op.H_img(x0)
        return jnp.sum(r**2)

    if fwd_only:
        fn = jax.jit(loss)
    elif chain_n:
        vg = jax.value_and_grad(loss)

        def body(i, carry):
            xc, acc = carry
            v, g = vg(xc)
            return (xc - 1e-6 * g, acc + v)

        def multi(xc):
            return jax.lax.fori_loop(0, chain_n, body, (xc, 0.0))

        fn = jax.jit(multi)
    else:
        fn = jax.jit(jax.value_and_grad(loss))

    x = jax.random.normal(jax.random.PRNGKey(1), (batch, d, d, 3), jnp.float32)
    t0 = time.time()
    out = fn(x)
    jax.block_until_ready(out)
    compile_s = time.time() - t0

    iters = 6
    t0 = time.time()
    for i in range(iters):
        out = fn(x + 1e-6 * i)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters

    from nshmc_tpu.utils.profiling import compiled_flops
    flops = compiled_flops(fn, x)
    # HloCostAnalysis counts a while-loop body ONCE regardless of trip
    # count, so for chainN runs the fori_loop program's FLOPs must be
    # scaled by chain_n to stay comparable with unfused runs.
    if flops is not None and chain_n:
        flops *= chain_n
    rec = {
        "tag": tag, "batch": batch, "remat": remat, "fwd_only": fwd_only,
        "xla_flops": flops,
        "xla_flops_scaled_by_chain_n": bool(flops and chain_n),
        "tflops_per_s": round(flops / dt / 1e12, 2) if flops else None,
        "xla_attn": xla_attn, "dtype": "f32" if f32 else "bf16",
        "param_bf16": p16, "gn16": gn16, "unroll": unroll, "gnchan": gnchan,
        "fused_evals": chain_n or 1,
        "sec_per_call": round(dt, 4),
        "sec_per_eval": round(dt / (chain_n or 1), 4),
        "chain_evals_per_s": round(batch * (chain_n or 1) / dt, 4),
        "compile_s": round(compile_s, 1),
    }
    print(json.dumps(rec))
    with open(os.path.join(os.path.dirname(__file__), "perf_results.jsonl"),
              "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
