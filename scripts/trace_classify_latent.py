"""Classify device instructions of the LATENT fused energy+grad program by
HLO role and spatial resolution (VERDICT r4 next #1: the latent program had
no trace attribution).

Pairs with a trace captured by `BENCH_MODE=latent BENCH_TRACE=<dir>
python bench.py` (same program: stop-grad eps ladder as lax.scan + VQ-f4
decoder fwd+bwd + inpainting residual, params as jit args). Rebuilds that
exact program from the persistent cache for HLO definitions, then sums
device self-time per class/resolution from the trace.

Usage: python scripts/trace_classify_latent.py [trace_dir]
Env (must match the traced bench run): BENCH_CHAINS (8), BENCH_FUSE (4),
BENCH_LATENT_UNROLL (0).
Writes scripts/trace_classify_latent.json.
"""
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from trace_hlo_match import top_instructions  # noqa: E402

import numpy as np  # noqa: E402


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/nshmc_trace_latent"
    top, count = top_instructions(trace_dir, 100000)

    import jax
    import jax.numpy as jnp
    from nshmc_tpu.utils.profiling import enable_persistent_cache
    enable_persistent_cache()
    from nshmc_tpu.models.ldm.ldm import LatentDiffusion
    from nshmc_tpu.schedules import DDIMSequence
    from nshmc_tpu.sampling.ddim import make_decoder
    from nshmc_tpu.operators import Inpainting

    batch = int(os.environ.get("BENCH_CHAINS", "8"))
    fuse = int(os.environ.get("BENCH_FUSE", "4"))
    unroll = os.environ.get("BENCH_LATENT_UNROLL", "0") == "1"

    ldm = LatentDiffusion.create(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    zdim, d = 64, 256
    seq = DDIMSequence.create(1000, 3)
    rng = np.random.default_rng(0)
    perm = rng.permutation(d * d)[: int(d * d * 0.92)]
    mr = 3 * perm
    op = Inpainting.create(3, d, np.sort(np.concatenate([mr, mr + 1, mr + 2])))
    y0 = op.H_img(jnp.zeros((1, d, d, 3)))[0]

    import dataclasses as _dc

    def loss(unet_params, ae_params, z):
        l = _dc.replace(ldm, unet_params=unet_params,
                        first_stage_params=ae_params)
        decode_z = make_decoder(l.model_fn(stop_gradient=True), l.schedule,
                                seq, unroll=unroll, scan_remat=False)
        z0 = decode_z(z)
        x0 = l.decode_first_stage(z0)
        r = y0[None] - op.H_img(x0)
        return jnp.sum(r**2)

    vg = jax.value_and_grad(loss, argnums=2)

    def fused(up, ap, z):
        def body(i, carry):
            zc, acc = carry
            v, g = vg(up, ap, zc)
            return (zc - 1e-6 * g, acc + v)
        return jax.lax.fori_loop(0, fuse, body, (z, 0.0))

    fn = jax.jit(fused)
    z = jnp.zeros((batch, zdim, zdim, 3), jnp.float32)
    compiled = fn.lower(ldm.unet_params, ldm.first_stage_params, z).compile()
    hlo = compiled.as_text()

    flop_report = {}
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flop_report["xla_flops_per_eval"] = float(ca["flops"]) / fuse
        flop_report["note"] = ("xla counts the scan eps-ladder body ONCE "
                               "(runs 3x); see useful_flops_latent.json for "
                               "the executed-FLOP figure")
    except Exception as e:  # noqa: BLE001
        flop_report["xla_flops_error"] = str(e)[:120]

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
        if re.match(r"\(f32\[%d,\d+\]" % batch, hdef) or "reduce" in name:
            return "norm_stats_reduce"
        if "fusion" in name:
            return "elementwise_fusion"
        return "other"

    def resolution(hdef):
        m = re.search(r"\[%d,(\d+),\1,(\d+)\]" % batch, hdef)
        if m:
            return f"{m.group(1)}^2xc{m.group(2)}"
        m = re.search(r"\[%d,(\d+),(\d+),(\d+)\]" % batch, hdef)
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
        "config": {"fuse": fuse, "batch": batch, "unroll": unroll,
                   "stop_grad": True},
        "flops": flop_report,
        "total_device_s": round(total, 4),
        "by_class_s": {k: round(v, 4) for k, v in
                       sorted(cls_time.items(), key=lambda kv: -kv[1])},
        "by_resolution_s": {k: round(v, 4) for k, v in
                            sorted(res_time.items(),
                                   key=lambda kv: -kv[1])[:12]},
        "by_class_resolution_s": {k: round(v, 4) for k, v in
                                  sorted(cls_res_time.items(),
                                         key=lambda kv: -kv[1])[:20]},
    }
    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(__file__),
                           "trace_classify_latent.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
