"""Classify ALL device instructions of the fused energy+grad program by
HLO role and sum device self-time per class + per spatial resolution.

Usage: python scripts/trace_classify.py [trace_dir]
Requires the compiled program (cache hit) for HLO definitions.
"""
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from trace_hlo_match import top_instructions  # noqa: E402

import numpy as np  # noqa: E402


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/nshmc_trace_energy"
    top, count = top_instructions(trace_dir, 100000)

    import jax
    import jax.numpy as jnp
    from nshmc_tpu.utils.profiling import enable_persistent_cache
    enable_persistent_cache()
    from nshmc_tpu.models.unet import UNetConfig, UNetModel
    from nshmc_tpu.schedules import DiffusionSchedule, DDIMSequence
    from nshmc_tpu.sampling.ddim import make_decoder
    from nshmc_tpu.operators import Inpainting

    cfg = UNetConfig.from_model_yaml(
        image_size=256, num_channels=128, num_res_blocks=1, channel_mult="",
        learn_sigma=True, attention_resolutions=16, num_heads=4,
        num_head_channels=64, use_scale_shift_norm=True, resblock_updown=True,
    )
    # build the SAME program bench.py traces: env knobs match bench.py's
    import dataclasses
    cfg = dataclasses.replace(
        cfg,
        norm_fp32=os.environ.get("BENCH_NORM_FP32", "1") != "0",
        remat=os.environ.get("BENCH_REMAT", "big"),
        gn_impl=os.environ.get("BENCH_GN_IMPL", "chan"),
        remat_min_res=int(os.environ.get("BENCH_REMAT_MIN_RES", "128")),
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
    y0 = op.H_img(jnp.zeros((1, d, d, 3)))[0]

    def loss(x):
        x0 = decode(x)
        r = y0[None] - op.H_img(x0)
        return jnp.sum(r**2)

    vg = jax.value_and_grad(loss)

    def body(i, carry):
        xc, acc = carry
        v, g = vg(xc)
        return (xc - 1e-6 * g, acc + v)

    fuse = int(os.environ.get("BENCH_FUSE", "4"))
    batch = int(os.environ.get("BENCH_CHAINS", "8"))
    fn = jax.jit(lambda xc: jax.lax.fori_loop(0, fuse, body, (xc, 0.0)))
    x = jnp.zeros((batch, d, d, 3), jnp.float32)
    compiled = fn.lower(x).compile()
    hlo = compiled.as_text()

    # FLOP accounting (VERDICT r2 weak-1a): XLA's count of the remat
    # program treats recomputed backward convs as useful work. Report BOTH
    # the XLA count and a useful-FLOP figure of 2x the forward count: the
    # loss closes over params, so the vjp yields only the x-cotangent (no
    # weight grads), and a conv's dx backward costs the same FLOPs as its
    # forward -> useful = fwd + bwd-dx = 2x fwd.
    flop_report = {}
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flop_report["xla_flops_per_eval"] = float(ca["flops"]) / fuse
    except Exception as e:  # noqa: BLE001
        flop_report["xla_flops_error"] = str(e)[:120]
    try:
        fwd = jax.jit(loss)
        cfwd = fwd.lower(x).compile()
        caf = cfwd.cost_analysis()
        caf = caf[0] if isinstance(caf, (list, tuple)) else caf
        f_fwd = float(caf["flops"])
        flop_report["fwd_flops"] = f_fwd
        flop_report["useful_flops_per_eval"] = 2.0 * f_fwd
    except Exception as e:  # noqa: BLE001
        flop_report["fwd_flops_error"] = str(e)[:120]

    defs = {}
    for line in hlo.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = (.*)", line)
        if m:
            defs.setdefault(m.group(1), m.group(2))

    def classify(name, hdef):
        if "convolution" in name or re.search(r"\bconvolution\(", hdef):
            return "convolution"
        if "attention" in name:
            return "attention_pallas"
        if name.startswith("copy") or name.startswith("bitcast"):
            return "copy/layout"
        if "dynamic-update-slice" in name or "dynamic-slice" in name:
            return "loop_state_slice"
        # norm statistics: tuple of per-(batch,channel) f32 reductions
        if re.match(r"\(f32\[8,\d+\]", hdef) or "reduce" in name:
            return "norm_stats_reduce"
        if "fusion" in name:
            return "elementwise_fusion"
        return "other"

    def resolution(hdef):
        m = re.search(r"\[8,(\d+),\1,(\d+)\]", hdef)
        if m:
            return f"{m.group(1)}^2xc{m.group(2)}"
        m = re.search(r"\[8,(\d+),(\d+),(\d+)\]", hdef)
        if m:
            return f"{m.group(1)}x{m.group(2)}xc{m.group(3)}"
        return "misc"

    cls_time = defaultdict(float)
    res_time = defaultdict(float)
    cls_res_time = defaultdict(float)
    total = 0.0
    for name, sec in top:
        hdef = defs.get(name, "")
        c = classify(name, hdef)
        r = resolution(hdef)
        cls_time[c] += sec
        res_time[r] += sec
        cls_res_time[f"{c}|{r}"] += sec
        total += sec

    out = {
        "config": {
            "fuse": fuse, "batch": batch, "remat": cfg.remat,
            "gn_impl": cfg.gn_impl, "unroll": unroll,
            "remat_min_res": cfg.remat_min_res,
        },
        "flops": flop_report,
        "total_device_s": round(total, 4),
        "by_class_s": {k: round(v, 4) for k, v in
                       sorted(cls_time.items(), key=lambda kv: -kv[1])},
        "by_resolution_s": {k: round(v, 4) for k, v in
                            sorted(res_time.items(), key=lambda kv: -kv[1])[:12]},
        "by_class_resolution_s": {k: round(v, 4) for k, v in
                                  sorted(cls_res_time.items(),
                                         key=lambda kv: -kv[1])[:20]},
    }
    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(__file__),
                           "trace_classify.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
