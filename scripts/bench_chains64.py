"""64-chain phase-retrieval serving on ONE chip (BASELINE.json config #4).

The "phase retrieval with 64+ parallel chains" target config had never been
demonstrated at 64 chains in any form (VERDICT r4 missing #2). Multi-host
hardware is unavailable here, but a single chip can SERVE 64 chains by
chunking them into sequential device waves whose activations fit HBM
(batch-8 waves: the measured flagship memory knee), all inside one jitted
program — `lax.map` over a (8, 8, 256, 256, 3) chain block, each wave
running `fuse` fused energy+grad evals (the same measurement form as
bench.py, ref budget main_sampling.py:664-704; phase operator
Hfuncs.py:318-367).

Records chain-evals/s and samples/s at chains=64 to perf_results.jsonl
(tag cfg-phase_chains64).

Usage: python scripts/bench_chains64.py
Env: BENCH_WAVE (8), BENCH_CHAINS64 (64), BENCH_FUSE (8), BENCH_ITERS (2)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

RESULTS = os.path.join(os.path.dirname(__file__), "perf_results.jsonl")
EVALS_PER_SAMPLE = 21 * 100


def _record(rec):
    print(json.dumps(rec), flush=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    wave = int(os.environ.get("BENCH_WAVE", "8"))
    n_chains = int(os.environ.get("BENCH_CHAINS64", "64"))
    fuse = int(os.environ.get("BENCH_FUSE", "8"))
    iters = int(os.environ.get("BENCH_ITERS", "2"))
    assert n_chains % wave == 0
    waves = n_chains // wave

    import jax
    import jax.numpy as jnp
    from nshmc_tpu.utils.profiling import enable_persistent_cache

    enable_persistent_cache()
    from nshmc_tpu.models.unet import UNetConfig, UNetModel
    from nshmc_tpu.schedules import DiffusionSchedule, DDIMSequence
    from nshmc_tpu.sampling.ddim import make_decoder
    from nshmc_tpu.operators import build_operator

    cfg = UNetConfig.from_model_yaml(
        image_size=256, num_channels=128, num_res_blocks=1, channel_mult="",
        learn_sigma=True, attention_resolutions=16, num_heads=4,
        num_head_channels=64, use_scale_shift_norm=True, resblock_updown=True)
    d = cfg.image_size
    model = UNetModel(cfg, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, d, d, 3)),
                        jnp.zeros((1,)))
    sched = DiffusionSchedule.create(num_timesteps=1000)
    seq = DDIMSequence.create(1000, 3)
    op = build_operator("phase", 3, d, np.random.default_rng(0))
    y0 = op.H_img(jnp.zeros((1, d, d, 3)))[0]

    # params as jit args, not closure constants (see bench.py)
    def loss(p, x):
        decode = make_decoder(lambda xx, tt: model.apply(p, xx, tt),
                              sched, seq, unroll=True)
        r = y0[None] - op.H_img(decode(x))
        return jnp.sum(jnp.abs(r) ** 2)

    vg = jax.value_and_grad(loss, argnums=1)

    def serve(p, x_block):
        """x_block: (waves, wave, d, d, 3) — sequential device waves, each
        running `fuse` fused energy+grad evals (chunked-chain serving)."""

        def per_wave(x):
            def body(i, carry):
                xc, acc = carry
                v, g = vg(p, xc)
                return (xc - 1e-6 * g, acc + v)

            return jax.lax.fori_loop(0, fuse, body, (x, 0.0))

        return jax.lax.map(per_wave, x_block)

    fn = jax.jit(serve)
    x = jax.random.normal(jax.random.PRNGKey(1), (waves, wave, d, d, 3),
                          jnp.float32)
    t0 = time.time()
    out = fn(params, x)
    jax.block_until_ready(out)
    compile_s = time.time() - t0

    times = []
    for r in range(3):
        t0 = time.time()
        out = fn(params, x + 1e-6 * (r + 1))
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    dt = min(times)  # best block (shared-host load only slows runs down)

    evals_per_s = n_chains * fuse / dt
    samples_per_s = evals_per_s / EVALS_PER_SAMPLE
    _record({
        "tag": "cfg-phase_chains64", "deg": "phase", "timesteps": 3,
        "chains": n_chains, "wave": wave, "waves": waves,
        "fused_evals": fuse,
        "sec_per_round": round(dt, 4),
        "chain_evals_per_s": round(evals_per_s, 3),
        "samples_per_s_per_chip": round(samples_per_s, 6),
        "compile_s": round(compile_s, 1),
        "block_times_s": [round(t, 3) for t in times],
        "backend": jax.default_backend(),
    })


if __name__ == "__main__":
    main()
