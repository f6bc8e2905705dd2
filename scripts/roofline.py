"""Roofline probe for the flagship energy+grad hot path.

Measures, for the exact program bench.py times (FFHQ-256 random-inpainting
noise-space HMC energy+gradient: 3-step DDIM decode + vjp through the ADM
U-Net; ref budget: main_sampling.py:660-774), XLA's own cost analysis
(FLOPs, HBM bytes accessed) against measured wall-clock, and reports the
achieved fraction of both the MXU FLOP roofline and the HBM bandwidth
roofline. This is how we decide whether a phase is compute- or
bandwidth-limited and how much headroom is left (BASELINE.md conclusions).

Usage:  python scripts/roofline.py            # flagship, TPU
        BENCH_TINY=1 python scripts/roofline.py   # tiny smoke (any backend)

Peak numbers default to TPU v5e (197 TFLOP/s bf16, 819 GB/s HBM) and can be
overridden with ROOFLINE_PEAK_TFLOPS / ROOFLINE_PEAK_GBS.
"""
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    if os.environ.get("NSHMC_CPU", "") == "1":
        # the image pins JAX_PLATFORMS=axon via sitecustomize; override
        # in-process (setting JAX_PLATFORMS=cpu in the shell hangs startup)
        jax.config.update("jax_platforms", "cpu")
    from nshmc_tpu.utils.profiling import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp
    from nshmc_tpu.models.unet import UNetConfig, UNetModel
    from nshmc_tpu.schedules import DiffusionSchedule, DDIMSequence
    from nshmc_tpu.sampling.ddim import make_decoder
    from nshmc_tpu.operators import Inpainting

    batch = int(os.environ.get("BENCH_CHAINS", "8"))
    iters = int(os.environ.get("BENCH_ITERS", "6"))
    tiny = os.environ.get("BENCH_TINY", "") == "1"
    peak_tflops = float(os.environ.get("ROOFLINE_PEAK_TFLOPS", "197"))
    peak_gbs = float(os.environ.get("ROOFLINE_PEAK_GBS", "819"))

    if tiny:
        cfg = UNetConfig(
            image_size=32, model_channels=32, out_channels=6, num_res_blocks=1,
            attention_ds=(2,), channel_mult=(1, 2), num_heads=2,
            num_head_channels=16, use_scale_shift_norm=True, resblock_updown=True,
        )
    else:
        cfg = UNetConfig.from_model_yaml(
            image_size=256, num_channels=128, num_res_blocks=1, channel_mult="",
            learn_sigma=True, attention_resolutions=16, num_heads=4,
            num_head_channels=64, use_scale_shift_norm=True, resblock_updown=True,
        )
    # match bench.py's winning-config env knobs (round-2 A/B ladder)
    cfg = dataclasses.replace(
        cfg,
        remat=os.environ.get("BENCH_REMAT", "big"),
        gn_impl=os.environ.get("BENCH_GN_IMPL", "chan"),
        remat_min_res=int(os.environ.get("BENCH_REMAT_MIN_RES", "128")),
        norm_fp32=os.environ.get("BENCH_NORM_FP32", "1") != "0",
    )
    unroll = os.environ.get("BENCH_UNROLL", "1") != "0"
    d = cfg.image_size
    model = UNetModel(cfg, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, d, d, 3)),
                        jnp.zeros((1,)))

    sched = DiffusionSchedule.create(num_timesteps=1000)
    seq = DDIMSequence.create(1000, 3)
    decode = make_decoder(lambda x, t: model.apply(params, x, t), sched, seq,
                          unroll=unroll)

    rng = np.random.default_rng(0)
    perm = rng.permutation(d * d)[: int(d * d * 0.92)]
    mr = 3 * perm
    op = Inpainting.create(3, d, np.sort(np.concatenate([mr, mr + 1, mr + 2])))
    x_orig = jnp.asarray(rng.uniform(-1, 1, (1, d, d, 3)), jnp.float32)
    y0 = op.H_img(x_orig)[0]

    def loss(x):
        x0 = decode(x)
        r = y0[None] - op.H_img(x0)
        return jnp.sum(r**2)

    x = jax.random.normal(jax.random.PRNGKey(1), (batch, d, d, 3), jnp.float32)
    xs = jax.ShapeDtypeStruct(x.shape, x.dtype)

    def probe(name, fn):
        compiled = jax.jit(fn).lower(xs).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):  # older jax returns [dict]
            ca = ca[0]
        flops = float(ca.get("flops", float("nan")))
        byts = float(ca.get("bytes accessed", float("nan")))
        out = compiled(x)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = compiled(x)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        tflops = flops / dt / 1e12
        gbs = byts / dt / 1e9
        rec = {
            "phase": name,
            "sec_per_call": round(dt, 4),
            "xla_tflops": round(flops / 1e12, 2),
            "xla_gb_accessed": round(byts / 1e9, 2),
            "achieved_tflops_s": round(tflops, 1),
            "achieved_gb_s": round(gbs, 1),
            "pct_mxu_roofline": round(100 * tflops / peak_tflops, 1),
            "pct_hbm_roofline": round(100 * gbs / peak_gbs, 1),
            "arith_intensity_flop_per_byte": round(flops / byts, 1)
            if byts else None,
        }
        print(json.dumps(rec))
        return rec

    fwd = probe("forward (3-step DDIM decode + H + loss)", loss)
    vg = probe("energy+grad (value_and_grad, remat=%s)" % cfg.remat,
               jax.value_and_grad(loss))

    # Useful-FLOP MFU (VERDICT r2 weak #1a): XLA's FLOP count of the remat
    # program includes recomputed forward convs as work. The USEFUL FLOPs of
    # one energy+grad eval are fwd + bwd-dx only: the loss closes over
    # params, so the vjp produces no weight cotangents and the dx backward
    # of a conv costs the same FLOPs as its forward -> useful = 2x the
    # forward program's count (the fwd probe above is the unrolled forward,
    # counted exactly, with no recompute in it).
    useful_tf = 2.0 * fwd["xla_tflops"]
    useful_mfu = useful_tf / vg["sec_per_call"] / peak_tflops
    print(json.dumps({
        "phase": "useful-FLOP MFU (energy+grad, excl. remat recompute)",
        "useful_tflop_per_eval": round(useful_tf, 2),
        "xla_counted_tflop_per_eval": vg["xla_tflops"],
        "remat_recompute_overcount_x": round(
            vg["xla_tflops"] / useful_tf, 3) if useful_tf else None,
        "useful_mfu_pct": round(100 * useful_mfu, 1),
        "xla_counted_mfu_pct": round(
            100 * vg["xla_tflops"] / vg["sec_per_call"] / peak_tflops, 1),
    }))

    # Which roofline binds each phase: the higher achieved-% is the binding
    # resource; machine balance for the peaks used is peak_tflops*1e3/peak_gbs
    # flop/byte.
    balance = peak_tflops * 1e12 / (peak_gbs * 1e9)
    for r in (fwd, vg):
        ai = r["arith_intensity_flop_per_byte"]
        if ai is None or (isinstance(ai, float) and ai != ai):
            # cost analysis reported no/zero bytes (some backends omit
            # 'bytes accessed'): the roofline classification is undefined.
            print(json.dumps({
                "phase": r["phase"],
                "machine_balance_flop_per_byte": round(balance, 1),
                "bound_by": "unknown (no bytes-accessed in cost analysis)",
            }))
            continue
        # Headroom is measured against the BINDING roofline only: for a
        # compute-bound phase (AI > balance) the bandwidth ratio is always
        # the larger of the two (ratio_b = ratio_f * AI/balance), so taking
        # max() would report the non-binding resource and overstate speedup.
        bound = "HBM-bandwidth" if ai < balance else "MXU-compute"
        headroom = (peak_tflops / max(r["achieved_tflops_s"], 1e-9)
                    if bound == "MXU-compute"
                    else peak_gbs / max(r["achieved_gb_s"], 1e-9))
        print(json.dumps({
            "phase": r["phase"], "machine_balance_flop_per_byte": round(balance, 1),
            "bound_by": bound,
            "headroom_x": round(headroom, 2),
        }))


if __name__ == "__main__":
    main()
