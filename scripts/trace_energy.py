"""Capture a device profiler trace of the fused flagship energy+grad
program (the b8-chainN probe program, compile-cached) and summarize per-op
device time from the trace events.

Usage: python scripts/trace_energy.py [chain_n] [batch]
Writes the raw trace under /tmp/nshmc_trace_energy and a per-op-category
summary JSON line to scripts/trace_summary.json.
"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    chain_n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8

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
    d = cfg.image_size
    model = UNetModel(cfg, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, d, d, 3)),
                        jnp.zeros((1,)))
    sched = DiffusionSchedule.create(num_timesteps=1000)
    seq = DDIMSequence.create(1000, 3)
    decode = make_decoder(lambda x, t: model.apply(params, x, t), sched, seq)

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

    fn = jax.jit(lambda xc: jax.lax.fori_loop(0, chain_n, body, (xc, 0.0)))
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, d, d, 3), jnp.float32)

    out = fn(x)
    jax.block_until_ready(out)

    trace_dir = "/tmp/nshmc_trace_energy"
    jax.profiler.start_trace(trace_dir)
    out = fn(x)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    # ---- summarize ----
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    print("trace files:", files)
    if not files:
        print("NO TRACE FILES — device tracing unsupported on this backend")
        return
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    # find TPU/device PIDs (process names containing 'TPU' or 'XLA Op')
    name_by_pid = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            name_by_pid[ev["pid"]] = ev["args"].get("name", "")
    print("processes:", name_by_pid)
    cat_time = defaultdict(float)
    op_time = defaultdict(float)
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pname = name_by_pid.get(ev.get("pid"), "")
        if "TPU" not in pname and "Device" not in pname:
            continue
        dur = ev.get("dur", 0) / 1e6  # us -> s
        name = ev.get("name", "")
        args = ev.get("args", {})
        # thread 'XLA Ops' events carry the HLO op name
        total += dur
        key = name.split(".")[0].split("(")[0]
        op_time[key] += dur
        for cat in ("convolution", "fusion", "dot", "copy", "all-reduce",
                    "transpose", "reduce", "custom-call", "dynamic"):
            if cat in name:
                cat_time[cat] += dur
                break
        else:
            cat_time["other"] += dur
    top = sorted(op_time.items(), key=lambda kv: -kv[1])[:25]
    summary = {
        "chain_n": chain_n, "batch": batch,
        "total_device_s_in_trace": round(total, 4),
        "by_category_s": {k: round(v, 4) for k, v in
                          sorted(cat_time.items(), key=lambda kv: -kv[1])},
        "top_ops_s": [[k, round(v, 4)] for k, v in top],
    }
    print(json.dumps(summary, indent=1))
    with open(os.path.join(os.path.dirname(__file__), "trace_summary.json"),
              "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
