"""Benchmark harness: flagship noise-space-HMC throughput on one TPU chip.

Measures the hot path of the reference's flagship run (FFHQ-256 random
inpainting, timesteps=3, tau=1.0, epsilon=0.05 -> L=20; see BASELINE.md):
the fused energy+gradient evaluation (3-step DDIM decode + vjp through the
U-Net) that dominates HMC wall-clock (21 evals/epoch, 100 epochs/sample
-> 2100 evals/sample; ref budget derivation: main_sampling.py:664-704).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md); vs_baseline compares to
our own recorded first-round number in BENCH_BASELINE.json when present,
else 1.0.

Measurement robustness (round 4): the timed loop runs in repetition blocks
and takes the BEST block (the tunneled chip shares a host whose load can
inflate wall-clock 2-3x; BASELINE.md round-1 correction #1). If the best
block is still >1.3x slower than the best previously recorded number for
the same config, the measurement retries and, failing that, annotates the
JSON with host_load_suspected instead of silently recording garbage
(VERDICT r3 weak #1).
"""
import json
import os
import sys
import time

import numpy as np

EVALS_PER_SAMPLE = 21 * 100  # (L+1) energy evals x (60 anneal + 40 burn/sample)

_SCRIPTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts")
_FUSE_CACHE = os.path.join(_SCRIPTS, "bench_fuse_cache.json")
_PERF_RESULTS = os.path.join(_SCRIPTS, "perf_results.jsonl")
# rough cold-compile scale factors vs the tiny probe (measured round 2/3:
# tiny ~20 s, flagship fuse=4 ~183 s, fuse=8 ~505 s through the relay)
_FUSE_COMPILE_FACTOR = {16: 27.0, 8: 25.0, 4: 9.0, 2: 5.0, 1: 3.0}
# known-good flagship compiles through the relay (perf_results.jsonl rows
# b8-chain8/b8-chain16: 200.4 s / 217.1 s) — seeds for shapes whose fuse
# cache has no measurement yet; relay load can still push these to ~600 s,
# which is why the default budget below leaves headroom.
_FUSE_COMPILE_SEED = {"tpu_d256_b8": {16: 217.1, 8: 200.4, 4: 183.0}}


def _fuse_cache_load():
    try:
        with open(_FUSE_CACHE) as f:
            return json.load(f)
    except Exception:
        return {}


def _fuse_cache_store(key, field, value):
    cache = _fuse_cache_load()
    rec = cache.setdefault(key, {})
    if isinstance(value, float):
        value = round(value, 4)
    # compile-time entries (integer fuse fields, warm_s) keep the BEST
    # observed time: relay load varies compile cost ~10x for the same
    # program (measured 95.9 s vs 976.8 s for the identical fuse-16
    # flagship), and a pessimistic entry would lock auto-fuse out of the
    # winning fuse forever. best_evals_per_s keeps the max for the same
    # reason.
    if (str(field).isdigit() or field == "warm_s") and str(field) in rec:
        value = min(value, rec[str(field)])
    rec[str(field)] = value
    try:
        with open(_FUSE_CACHE, "w") as f:
            json.dump(cache, f, indent=1)
    except Exception:
        pass


def _auto_fuse(key, budget_s):
    """Pick the largest fuse whose cold compile fits budget_s: use measured
    per-shape compile times (fuse cache + seeded flagship history) when
    recorded, else probe-compile a tiny program to gauge current relay load
    and extrapolate (VERDICT r3 next-round #1a)."""
    rec = _fuse_cache_load().get(key, {})
    measured = dict(_FUSE_COMPILE_SEED.get(key, {}))
    for k, v in rec.items():
        if k not in ("probe_s", "best_evals_per_s"):
            measured[int(k)] = v
    for f in sorted(_FUSE_COMPILE_FACTOR, reverse=True):
        if f in measured and measured[f] <= budget_s:
            return f
    probe_s = _probe_compile_s()
    _fuse_cache_store(key, "probe_s", probe_s)
    for f in sorted(_FUSE_COMPILE_FACTOR, reverse=True):
        if f in measured:  # measured over budget: trust measurement
            continue
        if probe_s * _FUSE_COMPILE_FACTOR[f] <= budget_s:
            return f
    return 1


def _best_recorded(key):
    """Best evals/s previously recorded for this config key (fuse cache
    `best_evals_per_s` field, written by every successful bench run)."""
    v = _fuse_cache_load().get(key, {}).get("best_evals_per_s")
    return float(v) if v else None


def _probe_compile_s():
    """Cold-compile a small fused energy+grad (32^2 tiny U-Net, fuse=8)
    and time it — a live sample of relay compile latency."""
    import jax
    import jax.numpy as jnp
    from nshmc_tpu.models.unet import UNetConfig, UNetModel
    from nshmc_tpu.schedules import DiffusionSchedule, DDIMSequence
    from nshmc_tpu.sampling.ddim import make_decoder

    cfg = UNetConfig(
        image_size=32, model_channels=32, out_channels=6, num_res_blocks=1,
        attention_ds=(2,), channel_mult=(1, 2), num_heads=2,
        num_head_channels=16, use_scale_shift_norm=True,
        resblock_updown=True,
    )
    model = UNetModel(cfg, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                        jnp.zeros((1,)))
    sched = DiffusionSchedule.create(num_timesteps=1000)
    seq = DDIMSequence.create(1000, 3)

    def loss(p, x):
        decode = make_decoder(lambda xx, tt: model.apply(p, xx, tt), sched,
                              seq, unroll=True)
        return jnp.sum(decode(x) ** 2)

    vg = jax.value_and_grad(loss, argnums=1)

    def fused(p, x):
        def body(i, carry):
            xc, acc = carry
            v, g = vg(p, xc)
            return (xc - 1e-6 * g, acc + v)
        return jax.lax.fori_loop(0, 8, body, (x, 0.0))

    fn = jax.jit(fused)
    x = jnp.zeros((8, 32, 32, 3), jnp.float32)
    t0 = time.time()
    jax.block_until_ready(fn(params, x))
    return time.time() - t0


def _measure_blocks(run_block, iters, fuse, batch, best_recorded,
                    reps=3, max_retries=2, retry_sleep_s=15.0):
    """Time `reps` repetition blocks of `iters` fused calls; per-eval time is
    the MIN block (transient host load only ever slows a block down). If the
    result is >1.3x off the best recorded number for this config, retry up
    to `max_retries` more rounds before annotating host_load_suspected."""
    import jax

    def one_round(base):
        times = []
        for r in range(reps):
            t0 = time.time()
            out = run_block(base + r)
            jax.block_until_ready(out)
            times.append((time.time() - t0) / (iters * fuse))
        return times

    all_times = one_round(0)
    retries = 0
    while (best_recorded is not None
           and batch / min(all_times) < best_recorded / 1.3
           and retries < max_retries):
        retries += 1
        time.sleep(retry_sleep_s)
        all_times += one_round(retries * reps)
    best = min(all_times)
    suspected = (best_recorded is not None
                 and batch / best < best_recorded / 1.3)
    return best, all_times, suspected, retries


def main():
    batch = int(os.environ.get("BENCH_CHAINS", "8"))
    iters = int(os.environ.get("BENCH_ITERS", "4"))
    tiny = os.environ.get("BENCH_TINY", "") == "1"
    norm_fp32 = os.environ.get("BENCH_NORM_FP32", "1") != "0"
    remat = os.environ.get("BENCH_REMAT", "big")
    # round-2 winners (A/B'd in scripts/perf_results.jsonl): per-channel
    # GroupNorm stats + statically unrolled 3-step DDIM ladder
    gn_impl = os.environ.get("BENCH_GN_IMPL", "chan")
    timesteps = int(os.environ.get("BENCH_TIMESTEPS", "3"))
    # ladder-form auto-select (VERDICT r3 next-round #7): unroll wins at
    # t<=3 (+23% runtime, ~200-600 s compile) but its compile cost grows
    # super-linearly with depth (t=5 unrolled: 1783.8 s,
    # perf_results.jsonl cfg-inpaint_t5) — default to the scan ladder for
    # deeper ladders unless explicitly overridden.
    # BENCH_UNROLL: auto | 0 (scan) | 1 (full static unroll) | k>=2 (scan
    # with k steps inlined per iteration). auto resolves t<=3 -> full
    # unroll here; deeper ladders are resolved against the compile-history
    # cache after the shape is known (throughput-vs-compile-budget model,
    # VERDICT r4 next #4).
    unroll_env = os.environ.get("BENCH_UNROLL", "auto")
    if unroll_env == "auto":
        unroll = True if timesteps <= 3 else None  # None: decide from cache
    elif unroll_env in ("0", "1"):
        unroll = unroll_env == "1"
    else:
        unroll = int(unroll_env)
    # BENCH_SCAN_REMAT=0 drops the per-step jax.checkpoint on the scan
    # ladder: backward then stacks every step's residuals (needs the
    # internal U-Net remat policy to shrink them to fit HBM) but skips the
    # whole-ladder forward recompute the checkpoint costs
    scan_remat = os.environ.get("BENCH_SCAN_REMAT", "1") != "0"
    remat_min_res = int(os.environ.get("BENCH_REMAT_MIN_RES", "128"))
    save_gn_stats = os.environ.get("BENCH_SAVE_GN_STATS", "0") == "1"
    if os.environ.get("BENCH_MODE", "pixel") == "latent":
        return latent_main(batch, iters, tiny)

    import jax
    from nshmc_tpu.utils.profiling import enable_persistent_cache

    cache_dir = enable_persistent_cache()

    def _cache_entries():
        try:
            return len(os.listdir(cache_dir)) if cache_dir else -1
        except OSError:
            return -1

    import jax.numpy as jnp
    from nshmc_tpu.models.unet import UNetConfig, UNetModel
    from nshmc_tpu.schedules import DiffusionSchedule, DDIMSequence
    from nshmc_tpu.sampling.ddim import make_decoder
    from nshmc_tpu.operators import Inpainting

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
    import dataclasses
    cfg = dataclasses.replace(cfg, norm_fp32=norm_fp32, remat=remat,
                              gn_impl=gn_impl, remat_min_res=remat_min_res,
                              remat_save_gn_stats=save_gn_stats)
    d = cfg.image_size
    model = UNetModel(cfg, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, d, d, 3)),
                        jnp.zeros((1,)))

    sched = DiffusionSchedule.create(num_timesteps=1000)
    seq = DDIMSequence.create(1000, timesteps)

    rng = np.random.default_rng(0)
    perm = rng.permutation(d * d)[: int(d * d * 0.92)]
    mr = 3 * perm
    op = Inpainting.create(3, d, np.sort(np.concatenate([mr, mr + 1, mr + 2])))
    x_orig = jnp.asarray(rng.uniform(-1, 1, (1, d, d, 3)), jnp.float32)
    y0 = op.H_img(x_orig)[0]

    # Params are an explicit jit ARGUMENT (not a closure constant): closed-
    # over weight pytrees get baked into the HLO as literal constants, which
    # bloats the program shipped through the remote-compile relay and the
    # persistent-cache executable (the latent program overflowed the relay's
    # request limit this way — VERDICT r3 missing #1).
    def loss(p, x):
        decode = make_decoder(lambda xx, tt: model.apply(p, xx, tt), sched,
                              seq, unroll=unroll, scan_remat=scan_remat)
        x0 = decode(x)
        r = y0[None] - op.H_img(x0)
        return jnp.sum(r**2)

    # Measure the execution form the HMC engine actually runs: leapfrog
    # chains L=20 energy+grad evals inside ONE device program
    # (hmc/engine.py lax.while_loop), so per-call host dispatch (~75 ms on
    # the tunneled chip) is amortized. BENCH_FUSE=1 recovers the round-1
    # unfused measurement form; BENCH_FUSE=auto (default) picks the
    # largest fuse whose estimated cold-compile fits BENCH_COMPILE_BUDGET
    # seconds, consulting measured compile history for this shape first
    # (probe-compiles a tiny program to gauge relay load only when no
    # history exists; caches decisions + measured compile times per shape).
    fuse_env = os.environ.get("BENCH_FUSE", "auto" if not tiny else "8")

    if unroll is None:
        # deep-ladder auto-select, measured at t=5 (perf_results.jsonl):
        # full unroll 22.9 evals/s but 1784 s cold compile; scan 15.98 at
        # 49-294 s; chunk-2 16.10 at 116 s (the 1.4x gap is the per-step
        # jax.checkpoint forward recompute, NOT loop overhead — chunking
        # keeps the recompute, and dropping it OOMs: 27.6/19.5/17.2 GB at
        # remat_min_res 128/64/32 vs 15.75 HBM). Policy: full unroll when
        # this host has EVER compiled it (persistent cache makes the
        # recompile cheap — `warm_s`) or the recorded cold cost fits the
        # budget; chunk-2 otherwise.
        budget = float(os.environ.get("BENCH_COMPILE_BUDGET", "900"))
        uknobs = (remat, gn_impl, True, save_gn_stats, remat_min_res,
                  timesteps, scan_remat)
        ukey = (f"{jax.default_backend()}_d{d}_b{batch}_"
                + "-".join(str(k) for k in uknobs))
        urec = _fuse_cache_load().get(ukey, {})
        utimes = [v for k, v in urec.items() if str(k).isdigit()]
        if "warm_s" in urec:
            utimes.append(urec["warm_s"])
        unroll = True if utimes and min(utimes) <= budget else 2

    vg = jax.value_and_grad(loss, argnums=1)
    fuse_cache_key = f"{jax.default_backend()}_d{d}_b{batch}"
    # non-default knobs get their own cache key (ADVICE r3: fuse-cache
    # entries must not mix configs with different compile/runtime behavior)
    knobs = (remat, gn_impl, unroll, save_gn_stats, remat_min_res, timesteps,
             scan_remat)
    if knobs != ("big", "chan", True, False, 128, 3, True):
        fuse_cache_key += "_" + "-".join(str(k) for k in knobs)
    if fuse_env == "auto":
        fuse = _auto_fuse(
            fuse_cache_key,
            budget_s=float(os.environ.get("BENCH_COMPILE_BUDGET", "900")))
    else:
        fuse = int(fuse_env)

    if fuse > 1:
        def fused(p, x):
            def body(i, carry):
                xc, acc = carry
                v, g = vg(p, xc)
                return (xc - 1e-6 * g, acc + v)
            return jax.lax.fori_loop(0, fuse, body, (x, 0.0))

        energy_vg = jax.jit(fused)
    else:
        energy_vg = jax.jit(vg)

    x = jax.random.normal(jax.random.PRNGKey(1), (batch, d, d, 3), jnp.float32)

    cache_before = _cache_entries()
    t0 = time.time()
    out = energy_vg(params, x)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    # 0 new entries + a recorded compile time => the persistent cache
    # served the executable (VERDICT r3 weak #3: record hit/miss outcome)
    cache_new = (_cache_entries() - cache_before
                 if cache_before >= 0 else None)
    # only record compile_s as this shape's cold-compile cost when the
    # persistent cache did NOT serve the executable — a cache-hit time of a
    # few seconds would permanently masquerade as the cold cost and let
    # _auto_fuse pick a fuse whose true compile blows the budget on a fresh
    # machine (ADVICE r4). Cache-hit times go under `warm_s` instead: they
    # tell the auto-select what a RE-compile of this config costs while the
    # persistent cache holds it.
    if not tiny:
        if cache_new != 0:
            _fuse_cache_store(fuse_cache_key, fuse, compile_s)
        else:
            _fuse_cache_store(fuse_cache_key, "warm_s", compile_s)

    trace_dir = os.environ.get("BENCH_TRACE", "")
    if trace_dir:
        jax.profiler.start_trace(trace_dir)

    def run_block(salt):
        for i in range(iters):
            out = energy_vg(params, x + 1e-6 * (salt * iters + i))
        return out

    best_rec = _best_recorded(fuse_cache_key) if not tiny else None
    dt, block_times, host_load_suspected, retries = _measure_blocks(
        run_block, iters, fuse, batch, best_rec)
    if trace_dir:
        jax.profiler.stop_trace()

    # one energy+grad = `batch` chain-evals; each is `timesteps` U-Net fwd+bwd
    evals_per_s = batch / dt
    unet_fwd_per_s = evals_per_s * timesteps
    samples_per_s = evals_per_s / EVALS_PER_SAMPLE

    if not tiny and not host_load_suspected:
        if best_rec is None or evals_per_s > best_rec:
            _fuse_cache_store(fuse_cache_key, "best_evals_per_s",
                              round(evals_per_s, 4))

    baseline = None
    try:
        with open(os.path.join(os.path.dirname(__file__), "BENCH_BASELINE.json")) as f:
            baseline = json.load(f).get("samples_per_s_per_chip")
    except Exception:
        pass
    vs_baseline = samples_per_s / baseline if baseline else 1.0

    detail = {
        "energy_grad_evals_per_s": round(evals_per_s, 4),
        "unet_fwd_per_s": round(unet_fwd_per_s, 4),
        "chains": batch,
        "sec_per_energy_grad_batch": round(dt, 4),
        "fused_evals_per_call": fuse,
        "compile_s": round(compile_s, 1),
        "persistent_cache_new_entries": cache_new,
        "block_times_s_per_eval": [round(t, 4) for t in block_times],
        "timesteps": timesteps,
        "norm_fp32": norm_fp32,
        "remat": remat,
        "remat_min_res": remat_min_res,
        "gn_impl": gn_impl,
        "unroll": unroll,
        "scan_remat": scan_remat,
        "save_gn_stats": save_gn_stats,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }
    if host_load_suspected:
        detail["host_load_suspected"] = True
        detail["best_recorded_evals_per_s"] = best_rec
        detail["retries"] = retries
    print(json.dumps({
        "metric": "hmc_samples_per_s_per_chip_ffhq256_inpaint_t3",
        "value": round(samples_per_s, 6),
        "unit": "samples/s/chip",
        "vs_baseline": round(vs_baseline, 4),
        "detail": detail,
    }))
    if not tiny:
        try:
            with open(_PERF_RESULTS, "a") as f:
                f.write(json.dumps({
                    "tag": "bench-flagship", "batch": batch, "fused_evals": fuse,
                    "sec_per_eval": round(dt, 4),
                    "evals_per_s": round(evals_per_s, 4),
                    "compile_s": round(compile_s, 1),
                    "host_load_suspected": host_load_suspected,
                    "timesteps": timesteps, "unroll": unroll,
                    "scan_remat": scan_remat,
                    "remat_min_res": remat_min_res}) + "\n")
        except Exception:
            pass


def latent_main(batch: int, iters: int, tiny: bool = False):
    """Latent flagship (BENCH_MODE=latent): hmc_latent energy+grad on the
    CelebA-HQ LDM config — 3-step latent DDIM (stop-grad eps-net, parity with
    ddpm.py:892) + differentiable VQ-f4 decode + inpainting residual at 256^2
    (ref budget: main_sampling_latent.py:628-664).

    Program-size discipline (the round-3 attempts died in the relay with
    HTTP 413 / broken pipe — VERDICT r3 missing #1): params are jit
    arguments (no weight constants in the HLO), the eps-net ladder defaults
    to lax.scan (one U-Net body in the program instead of three), and on a
    relay transport error the config backs off (smaller fuse, then smaller
    batch) and annotates the fallback in the output.
    """
    import jax
    import jax.numpy as jnp
    from nshmc_tpu.utils.profiling import enable_persistent_cache
    from nshmc_tpu.models.ldm.ldm import LatentDiffusion, latent_unet_config

    enable_persistent_cache()
    from nshmc_tpu.models.ldm.autoencoder import AutoencoderConfig
    from nshmc_tpu.schedules import DDIMSequence
    from nshmc_tpu.sampling.ddim import make_decoder
    from nshmc_tpu.operators import Inpainting

    if tiny:
        ldm = LatentDiffusion.create(
            jax.random.PRNGKey(0),
            unet_cfg=latent_unet_config(
                image_size=16, model_channels=32, num_res_blocks=1,
                channel_mult=(1, 2), attention_ds=(2,), num_head_channels=16),
            ae_cfg=AutoencoderConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                                     resolution=32),
            dtype=jnp.bfloat16)
        zdim = 16  # 32^2 pixels / f2 AE (ch_mult depth 2) -> 16^2 latents
        d = 32
    else:
        ldm = LatentDiffusion.create(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
        zdim = 64
        d = 256
    seq = DDIMSequence.create(1000, 3)
    unroll = os.environ.get("BENCH_LATENT_UNROLL", "0") == "1"
    rng = np.random.default_rng(0)
    perm = rng.permutation(d * d)[: int(d * d * 0.92)]
    mr = 3 * perm
    op = Inpainting.create(3, d, np.sort(np.concatenate([mr, mr + 1, mr + 2])))
    y0 = op.H_img(jnp.zeros((1, d, d, 3)))[0]

    import dataclasses as _dc

    def loss(unet_params, ae_params, z):
        l = _dc.replace(ldm, unet_params=unet_params,
                        first_stage_params=ae_params)
        # stop-grad eps ladder: scan_remat off (it would recompute eps-net
        # forwards in backward for residuals the stop-grad path never uses)
        decode_z = make_decoder(l.model_fn(stop_gradient=True), l.schedule,
                                seq, unroll=unroll, scan_remat=False)
        z0 = decode_z(z)
        x0 = l.decode_first_stage(z0)
        r = y0[None] - op.H_img(x0)
        return jnp.sum(r**2)

    vg = jax.value_and_grad(loss, argnums=2)

    # same fused measurement form as the pixel path: the latent HMC engine
    # runs L=20 evals per attempt inside one device program, so per-call
    # dispatch (~75 ms tunneled) must be amortized; backoff ladder shrinks
    # the program / batch if the relay rejects it
    fuse0 = int(os.environ.get("BENCH_FUSE", "4"))
    attempts = [(fuse0, batch), (max(1, fuse0 // 2), batch),
                (1, batch), (1, max(1, batch // 2))]
    seen = set()
    attempts = [a for a in attempts if not (a in seen or seen.add(a))]

    last_err = None
    for fuse, b in attempts:
        if fuse > 1:
            def fused(up, ap, z, _fuse=fuse):
                def body(i, carry):
                    zc, acc = carry
                    v, g = vg(up, ap, zc)
                    return (zc - 1e-6 * g, acc + v)
                return jax.lax.fori_loop(0, _fuse, body, (z, 0.0))

            energy_vg = jax.jit(fused)
        else:
            energy_vg = jax.jit(vg)
        z = jax.random.normal(jax.random.PRNGKey(1), (b, zdim, zdim, 3),
                              jnp.float32)
        try:
            t0 = time.time()
            out = energy_vg(ldm.unet_params, ldm.first_stage_params, z)
            jax.block_until_ready(out)
            compile_s = time.time() - t0

            def run_block(salt):
                for i in range(iters):
                    out = energy_vg(ldm.unet_params, ldm.first_stage_params,
                                    z + 1e-6 * (salt * iters + i))
                return out

            trace_dir = os.environ.get("BENCH_TRACE", "")
            if trace_dir:
                jax.profiler.start_trace(trace_dir)
            dt, block_times, _, _ = _measure_blocks(
                run_block, iters, fuse, b, best_recorded=None)
            if trace_dir:
                jax.profiler.stop_trace()
            break
        except Exception as e:  # relay transport / OOM: back off
            last_err = e
            continue
    else:
        print(json.dumps({
            "metric": "hmc_latent_samples_per_s_per_chip_celebahq256_inpaint_t3",
            "value": 0.0, "unit": "samples/s/chip", "vs_baseline": 0.0,
            "detail": {"status": "error",
                       "error": f"{type(last_err).__name__}: {str(last_err)[:300]}"},
        }))
        return 1

    evals_per_s = b / dt
    # latent budget: 70 attempts x (L+1)=21 evals (BASELINE.md)
    samples_per_s = evals_per_s / (70 * 21)
    print(json.dumps({
        "metric": "hmc_latent_samples_per_s_per_chip_celebahq256_inpaint_t3",
        "value": round(samples_per_s, 6),
        "unit": "samples/s/chip",
        "vs_baseline": 1.0,
        "detail": {
            "energy_grad_evals_per_s": round(evals_per_s, 4),
            "chains": b,
            "sec_per_energy_grad_batch": round(dt, 4),
            "fused_evals_per_call": fuse,
            "compile_s": round(compile_s, 1),
            "block_times_s_per_eval": [round(t, 4) for t in block_times],
            "unroll": unroll,
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
