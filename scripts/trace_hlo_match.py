"""Match the hottest individual instructions from the device trace against
the compiled HLO text to see what each hot fusion computes.

Usage: python scripts/trace_hlo_match.py [trace_dir] [top_n]
Builds the SAME fused energy+grad program as trace_energy.py, compiles it
(cache hit), and prints the HLO definition line for each of the top-N
instructions by device self-time.
"""
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def top_instructions(trace_dir, n):
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    tid_name = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tid_name[(ev["pid"], ev.get("tid"))] = ev["args"].get("name", "")
    by_thread = defaultdict(list)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        if "XLA Ops" not in tid_name.get((ev.get("pid"), ev.get("tid")), ""):
            continue
        by_thread[(ev["pid"], ev["tid"])].append(
            (ev.get("ts", 0), ev.get("dur", 0), ev.get("name", "")))
    self_time = defaultdict(float)
    count = defaultdict(int)
    for evs in by_thread.values():
        evs.sort(key=lambda e: (e[0], -e[1]))
        stack = []

        def pop_one():
            end, name, dur_s, child_s = stack.pop()
            self_time[name] += dur_s - child_s
            count[name] += 1
            if stack:
                stack[-1][3] += dur_s

        for ts, dur, name in evs:
            while stack and ts >= stack[-1][0]:
                pop_one()
            stack.append([ts + dur, name, dur / 1e6, 0.0])
        while stack:
            pop_one()
    return sorted(self_time.items(), key=lambda kv: -kv[1])[:n], count


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/nshmc_trace_energy"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    top, count = top_instructions(trace_dir, top_n)

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

    fn = jax.jit(lambda xc: jax.lax.fori_loop(0, 4, body, (xc, 0.0)))
    x = jnp.zeros((8, d, d, 3), jnp.float32)
    hlo = fn.lower(x).compile().as_text()

    # index HLO definition lines by instruction name
    defs = {}
    for line in hlo.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = (.*)", line)
        if m:
            defs.setdefault(m.group(1), m.group(2))

    out = []
    for name, sec in top:
        d_line = defs.get(name, defs.get(name.replace("%", ""), "<not found>"))
        rec = {"op": name, "self_s": round(sec, 4), "n": count[name],
               "hlo": (d_line or "")[:400]}
        out.append(rec)
        print(json.dumps(rec))
    with open(os.path.join(os.path.dirname(__file__),
                           "trace_hlo_match.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
