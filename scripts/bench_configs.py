"""Flagship energy+grad throughput across degradations and ladder lengths.

Round-1 only ever benched (inpaint_random, timesteps=3). This records the
same fused energy+grad measurement for the other BASELINE.json benchmark
configs: sr4, phase retrieval, anisotropic deblur, and a 5-step ladder
(ref flagship flags: README.md:79; configs list: BASELINE.json:6-12).

Per-tag failures are recorded and skipped (phase retrieval needs jnp.fft
on-device, which the axon tunnel backend reports UNIMPLEMENTED for).

Usage: python scripts/bench_configs.py [tag ...]   (default: all)
Appends JSON lines to scripts/perf_results.jsonl.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

CONFIGS = {
    "inpaint_t3": ("inpaint_random", 3),
    "sr4_t3": ("sr4", 3),
    "sr16_t3": ("sr16", 3),
    "phase_t3": ("phase", 3),
    "deblur_aniso_t3": ("deblur_aniso", 3),
    "deblur_nonlinear_t3": ("deblur_nonlinear", 3),
    "hdr_t3": ("hdr", 3),
    "inpaint_t5": ("inpaint_random", 5),
}
RESULTS = os.path.join(os.path.dirname(__file__), "perf_results.jsonl")


def _record(rec):
    print(json.dumps(rec), flush=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")


def _run_one(tag, batch, fuse, iters, model, params, sched, d):
    import jax
    import jax.numpy as jnp
    from nshmc_tpu.schedules import DDIMSequence
    from nshmc_tpu.sampling.ddim import make_decoder
    from nshmc_tpu.operators import build_operator

    deg, t = CONFIGS[tag]
    seq = DDIMSequence.create(1000, t)
    # unroll short ladders only; t=5 unrolled cost 1783.8 s of relay
    # compile (perf_results.jsonl cfg-inpaint_t5) vs the scan ladder
    unroll = t <= 3
    op = build_operator(deg, 3, d, np.random.default_rng(0))
    y0 = op.H_img(jnp.zeros((1, d, d, 3)))[0]

    # params as jit args, not closure constants (see bench.py)
    def loss(p, x):
        decode = make_decoder(lambda xx, tt: model.apply(p, xx, tt),
                              sched, seq, unroll=unroll)
        r = y0[None] - op.H_img(decode(x))
        return jnp.sum(jnp.abs(r) ** 2)

    vg = jax.value_and_grad(loss, argnums=1)

    def fused(p, x):
        def body(i, carry):
            xc, acc = carry
            v, g = vg(p, xc)
            return (xc - 1e-6 * g, acc + v)
        return jax.lax.fori_loop(0, fuse, body, (x, 0.0))

    fn = jax.jit(fused)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, d, d, 3),
                          jnp.float32)
    t0 = time.time()
    out = fn(params, x)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    t0 = time.time()
    for i in range(iters):
        out = fn(params, x + 1e-6 * i)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / (iters * fuse)
    _record({"tag": f"cfg-{tag}", "deg": deg, "timesteps": t,
             "batch": batch, "fused_evals": fuse, "unroll": unroll,
             "sec_per_eval": round(dt, 4),
             "chain_evals_per_s": round(batch / dt, 3),
             "compile_s": round(compile_s, 1)})


def main():
    tags = sys.argv[1:] or list(CONFIGS)
    batch = int(os.environ.get("BENCH_CHAINS", "8"))
    fuse = int(os.environ.get("BENCH_FUSE", "8"))
    iters = int(os.environ.get("BENCH_ITERS", "2"))

    # One process per tag: a failed compile/execute can poison the PJRT
    # client (observed: after phase_t3's UNIMPLEMENTED, every subsequent
    # compile in the same process failed the same way), so isolate tags
    # unless we're the single-tag child.
    if len(tags) > 1 and os.environ.get("BENCH_CFG_CHILD", "") != "1":
        import subprocess
        env = dict(os.environ, BENCH_CFG_CHILD="1")
        for tag in tags:
            r = subprocess.run([sys.executable, os.path.abspath(__file__),
                                tag], env=env)
            if r.returncode != 0:
                _record({"tag": f"cfg-{tag}", "status": "error",
                         "error": f"child exited rc={r.returncode}"})
        return

    import jax
    import jax.numpy as jnp
    from nshmc_tpu.utils.profiling import enable_persistent_cache

    enable_persistent_cache()
    from nshmc_tpu.models.unet import UNetConfig, UNetModel
    from nshmc_tpu.schedules import DiffusionSchedule

    cfg = UNetConfig.from_model_yaml(
        image_size=256, num_channels=128, num_res_blocks=1, channel_mult="",
        learn_sigma=True, attention_resolutions=16, num_heads=4,
        num_head_channels=64, use_scale_shift_norm=True, resblock_updown=True)
    d = cfg.image_size
    model = UNetModel(cfg, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, d, d, 3)),
                        jnp.zeros((1,)))
    sched = DiffusionSchedule.create(num_timesteps=1000)

    for tag in tags:
        try:
            _run_one(tag, batch, fuse, iters, model, params, sched, d)
        except Exception as e:
            _record({"tag": f"cfg-{tag}", "status": "error",
                     "error": f"{type(e).__name__}: {str(e)[:160]}"})


if __name__ == "__main__":
    main()
