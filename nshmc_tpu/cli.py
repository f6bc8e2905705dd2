"""Experiment driver CLI.

TPU-native replacement for the reference entry points
(ref: main_sampling.py:923-1041 `get_parser`/__main__ and
main_sampling_latent.py:901-919): parses flags, loads the YAML config,
synthesizes measurements y0 = H(x) + sigma_0 * eps, dispatches to the
selected sampler (noise-space HMC, DMPlug, or a baseline iterative
algorithm), computes PSNR/SSIM (+LPIPS when weights are available), and
dumps orig/y_pinv/sample/std-map PNGs.

Differences from the reference (all documented):
  - sigma_0 doubling for the [-1,1] range (main_sampling.py:348) happens
    HERE, explicitly, not hidden inside operator construction
  - --chains N runs N parallel HMC chains (vmapped; sharded over devices
    with --mesh), each with independent MH accepts
  - --checkpoint-dir enables sampler-state snapshot/resume (orbax)

Run:  python -m nshmc_tpu.cli --algo hmc --deg inpaint_random \
          --config configs/ffhq.yaml -i out/
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np
import yaml


def get_parser():
    p = argparse.ArgumentParser(description="nshmc_tpu sampling driver")
    p.add_argument("--config", default="configs/ffhq.yaml")
    p.add_argument("--algo", default="hmc",
                   help="hmc | hmc_cond | hmc_latent | dmplug_adam | "
                        "dmplug_lbfgs | ddnm | ddrm | dps | pigdm | dmps | "
                        "reddiff | diffpir | daps | resample | "
                        "resample_original")
    p.add_argument("--deg", default="inpaint_random",
                   help="degradation: sr4 | sr16 | sr_bicubic4 | "
                        "inpaint_random | inpaint_box | deblur_gauss | "
                        "deblur_aniso | deblur_nonlinear | phase | hdr | "
                        "cs2 | color | denoise")
    p.add_argument("--sigma_0", type=float, default=0.05)
    p.add_argument("--timesteps", type=int, default=3)
    p.add_argument("--num_timesteps", type=int, default=1000)
    p.add_argument("--tau", type=float, default=1.0)
    p.add_argument("--epsilon", type=float, default=0.05)
    p.add_argument("--m", type=float, default=1.0, help="HMC momentum mass")
    p.add_argument("--hmc_epochs", type=int, default=60,
                   help="HMC annealing epochs (ref: main_sampling.py:665)")
    p.add_argument("--hmc_sampling", type=int, default=20,
                   help="HMC burn-in/sample epochs (ref: main_sampling.py:666)")
    p.add_argument("--sigma_y", type=float, default=1.0,
                   help="latent HMC geometric anneal start")
    p.add_argument("--latent_epochs", type=int, default=50,
                   help="latent HMC anneal attempts (ref: main_sampling_latent.py:628)")
    p.add_argument("--latent_sampling", type=int, default=10,
                   help="latent HMC post-anneal half-window (ref: :629)")
    p.add_argument("--latent_full_grad", action="store_true",
                   help="differentiate through the latent eps-net in "
                        "hmc_latent (the reference stop-grads it, "
                        "ddpm.py:892 — parity default off)")
    p.add_argument("--lbfgs_epochs", type=int, default=300,
                   help="DMPlug L-BFGS outer budget (ref: main_sampling.py"
                        ":572-591, 300 closures)")
    p.add_argument("--lbfgs_inner", type=int, default=20,
                   help="DMPlug L-BFGS inner iterations per outer step "
                        "(ref torch LBFGS max_iter=20)")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--noise", default="ddpm", choices=["ddpm", "ddim"])
    p.add_argument("-i", "--image_folder", default="out")
    p.add_argument("--subset_start", type=int, default=0)
    p.add_argument("--subset_end", type=int, default=1)
    p.add_argument("--chains", type=int, default=1)
    p.add_argument("--image_batch", type=int, default=1,
                   help="vectorize HMC over N images at once "
                        "(images x chains in one jitted program)")
    p.add_argument("--mesh", type=int, default=0,
                   help="shard chains over N devices (0 = single device)")
    p.add_argument("--ckpt", default="",
                   help="torch checkpoint to port (random init if absent, "
                        "matching unet_ffhq.py:87-90)")
    p.add_argument("--checkpoint-dir", default="",
                   help="chain-state snapshot dir (resume support)")
    p.add_argument("--verbose", action="store_true",
                   help="per-epoch progress prints (host-synced observed mode)")
    p.add_argument("--save_epochs", action="store_true",
                   help="save hmc_{epoch}.png per accepted proposal + a "
                        "psnr/sigma_y trail json (main_sampling.py:733-742)")
    p.add_argument("--adapt", default="none", choices=["none", "da"],
                   help="'da' = dual-averaged shared step size during "
                        "annealing (replaces the x0.95 backoff)")
    p.add_argument("--diagnostics", action="store_true",
                   help="report split-R-hat/ESS over chains x kept samples")
    p.add_argument("--driver", default="auto",
                   choices=["auto", "jit", "observed"],
                   help="HMC execution driver: 'jit' = whole run in one "
                        "lax.while_loop device call (fastest; real TPU/CPU), "
                        "'observed' = per-attempt dispatch (required on "
                        "tunneled single-chip setups whose relay kills "
                        "long-running executions; enables progress/ckpt). "
                        "'auto' picks observed on an axon tunnel.")
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--no-bf16", dest="bf16", action="store_false")
    p.add_argument("--attempts_per_round", type=int, default=1,
                   help="observed driver: fuse N MH attempts per device "
                        "dispatch (amortizes per-round host syncs on "
                        "tunneled chips; statistics unchanged, callback/"
                        "checkpoint granularity coarsens)")
    p.add_argument("--chain_chunk", type=int, default=0,
                   help="observed driver: serve chains in sequential "
                        "device waves of this size inside each attempt "
                        "program (chunked-chain serving — run chain "
                        "counts past the vmap memory knee, e.g. 64 "
                        "phase-retrieval chains as 8 waves of 8 on one "
                        "chip; statistics unchanged)")
    p.add_argument("--data_path", default="",
                   help="override the config's data.path (e.g. run the "
                        "latent CelebA-HQ config against the shipped FFHQ "
                        "test images when CelebA-HQ is unobtainable)")
    p.add_argument("--unroll_ladder", default="auto",
                   help="DDIM ladder form: 1 = statically unrolled, 0 = "
                        "lax.scan + per-step remat, k>=2 = scan with k "
                        "steps inlined per iteration (chunked unroll). "
                        "auto = full unroll for timesteps<=3, chunk-2 "
                        "beyond — measured at t=5: unrolled 0.35 s/eval "
                        "but 1784 s relay compile, scan 0.50 s/eval at "
                        "49-294 s compile (perf_results.jsonl)")
    return p


def load_config(path):
    with open(path) as f:
        return yaml.safe_load(f)


def ladder_unroll(opt):
    """DDIM ladder form auto-select (VERDICT r3 item 7 / r4 next #4):
    statically unrolled wins at runtime (+23% at t=3, +43% at t=5) but its
    compile cost grows super-linearly with depth (t=5: 1784 s through the
    relay vs 49-294 s for the scan+remat ladder;
    scripts/perf_results.jsonl) — full-unroll short ladders, CHUNK-unroll
    deeper ones (scan with k steps inlined per iteration: most of the
    fusion win at a fraction of the program size). Returns True (full
    unroll), an int k>=2 (chunked), or False (plain scan);
    --unroll_ladder 0|1|k overrides."""
    mode = str(getattr(opt, "unroll_ladder", "auto"))
    if mode == "auto":
        if opt.timesteps <= 3:
            return True
        # deep ladders: the r5 hardware A/B showed the scan's 1.4x gap is
        # the per-step jax.checkpoint forward recompute (chunk-2 16.10 ==
        # scan 15.98 evals/s at t=5; dropping the checkpoint OOMs at every
        # internal remat level; full unroll 22.63). Full unroll when this
        # host's compile history proves it affordable (163-204 s measured
        # cold — the r3 1784 s was relay-load noise — and the persistent
        # cache amortizes repeats); chunk-2 otherwise (bounded compile).
        hist = _unrolled_compile_history(opt.timesteps)
        if hist is not None and hist <= 900:
            return True
        return 2
    if mode in ("0", "1"):
        return mode == "1"
    return int(mode)


def _unrolled_compile_history(timesteps: int):
    """Best recorded compile time (s) of a fully-unrolled ladder at this
    depth on this host (scripts/bench_fuse_cache.json, written by bench.py;
    knob-suffix format remat-gn-unroll-savegn-minres-timesteps-scanremat)."""
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "bench_fuse_cache.json")
    try:
        with open(path) as f:
            cache = json.load(f)
    except Exception:
        return None
    best = None
    for key, rec in cache.items():
        knobs = key.split("_")[-1].split("-")
        if len(knobs) < 7 or knobs[2] != "True" or knobs[5] != str(timesteps):
            continue
        times = [v for k, v in rec.items() if str(k).isdigit()]
        if "warm_s" in rec:
            times.append(rec["warm_s"])
        if times:
            best = min(times) if best is None else min(best, min(times))
    return best


def _allgather_chain_axis(mh, arr):
    """Full global view of a chain-sharded array on every process: pull the
    local shards, allgather across processes, restack on the chain axis."""
    from jax.experimental import multihost_utils

    local = mh.fetch_local_shards(arr)
    gathered = np.asarray(multihost_utils.process_allgather(local))
    return gathered.reshape((-1,) + local.shape[1:])


def _build_pixel_model(cfg, opt):
    import jax
    import jax.numpy as jnp
    from .models.unet import UNetConfig, UNetModel
    from .models.port import load_adm_checkpoint

    mcfg = UNetConfig.from_model_yaml(**cfg["model"])
    model = UNetModel(mcfg, dtype=jnp.bfloat16 if opt.bf16 else jnp.float32)
    d = mcfg.image_size
    ckpt = opt.ckpt or cfg["model"].get("model_path", "")
    if ckpt and os.path.exists(ckpt):
        params = load_adm_checkpoint(ckpt, mcfg)
        print(f"loaded checkpoint {ckpt}")
    else:
        # reference behavior: silent random init on missing checkpoint
        # (unet_ffhq.py:87-90)
        print(f"checkpoint {ckpt!r} not found: random init")
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, d, d, 3)), jnp.zeros((1,))
        )
    return model, params, mcfg


def run_pixel(opt):
    import jax
    import jax.numpy as jnp
    from .schedules import DiffusionSchedule, DDIMSequence
    from .operators import build_operator
    from .sampling.ddim import make_decoder
    from .sampling.loop import iterative_sampling
    from .algos import build_algo, run_daps
    from .hmc.engine import (
        HMCConfig, init_chains, make_pixel_loss_fn, run_hmc,
    )
    from .utils import images as im
    from .utils.metrics import psnr, ssim, RunningStats

    cfg = load_config(opt.config)
    d = cfg["data"]["image_size"]
    c = cfg["data"]["channels"]
    rng = np.random.default_rng(opt.seed)

    model, params, mcfg = _build_pixel_model(cfg, opt)
    model_fn = lambda x, t: model.apply(params, x, t)

    sched = DiffusionSchedule.create(
        cfg["diffusion"]["beta_schedule"],
        cfg["diffusion"]["beta_start"],
        cfg["diffusion"]["beta_end"],
        cfg["diffusion"]["num_diffusion_timesteps"],
    )
    seq = DDIMSequence.create(opt.num_timesteps, opt.timesteps)
    # statically unroll short DDIM ladders: +23% flagship energy+grad on
    # TPU (no scan state slicing, cross-step fusion); long ladders keep the
    # scan to bound HLO size / compile time
    decode = make_decoder(model_fn, sched, seq, unroll=ladder_unroll(opt))

    operator = build_operator(opt.deg, c, d, rng)
    sigma_0 = 2.0 * opt.sigma_0  # [-1,1] range scaling (main_sampling.py:348)

    from .parallel import multihost as mh

    files = im.list_dataset(
        getattr(opt, "data_path", "") or cfg["data"]["path"]
    )[opt.subset_start:opt.subset_end]
    indexed_files = list(enumerate(files))
    multiproc = mh.process_count() > 1
    # Multi-host work decomposition: with a sharded chain mesh every process
    # cooperates on the SAME image (chains split over the global mesh);
    # otherwise processes split the dataset (per-host data sharding).
    if multiproc and opt.mesh <= 1:
        indexed_files = indexed_files[mh.process_index()::mh.process_count()]
    # In cooperative (cross-host mesh) mode every process computes identical
    # results for the same image: only the primary records/saves.
    own_artifacts = (not multiproc) or opt.mesh <= 1 or mh.is_primary()
    os.makedirs(opt.image_folder, exist_ok=True)
    stats = RunningStats()
    records = []
    lpips_fn = None
    try:
        from .utils.lpips import try_load_lpips

        loaded = try_load_lpips()
        if loaded:
            lpips_fn = loaded[0]
    except Exception:
        pass

    if opt.algo == "hmc" and opt.image_batch > 1:
        return _run_pixel_hmc_batched(opt, cfg, model, params, sched, seq,
                                      operator, sigma_0, files, stats)

    for idx, path in indexed_files:
        x01 = im.load_image(path, d)
        x_orig = im.data_transform(jnp.asarray(x01))[None]
        key = jax.random.PRNGKey(opt.seed + idx)
        k_noise, k_run = jax.random.split(key)
        y0 = operator.H_img(x_orig)
        y0 = y0 + sigma_0 * jax.random.normal(k_noise, y0.shape)
        y_pinv = operator.H_pinv_img(y0)
        if own_artifacts:
            im.save_image(im.inverse_data_transform(y_pinv[0]),
                          os.path.join(opt.image_folder, f"y0_{idx}.png"))
            im.save_image(x01, os.path.join(opt.image_folder, f"orig_{idx}.png"))

        t0 = time.time()
        if opt.algo == "hmc_cond":
            from .hmc.adaptation import (
                ConditionedHMCConfig, init_conditioned_chains,
                run_conditioned_hmc,
            )

            ccfg = ConditionedHMCConfig(sigma_0=sigma_0, tau=opt.tau,
                                        epsilon=opt.epsilon,
                                        epochs=opt.hmc_epochs,
                                        sampling=opt.hmc_sampling)
            loss_fn = make_pixel_loss_fn(decode, operator, y0[0])
            states = init_conditioned_chains(k_run, ccfg, opt.chains, (d, d, c))
            out = jax.jit(
                lambda s: run_conditioned_hmc(loss_fn, ccfg, s))(states)
            samples = np.asarray(out.samples).reshape(
                -1, *out.samples.shape[2:])
        elif opt.algo == "hmc":
            hmc_cfg = HMCConfig(sigma_0=sigma_0, tau=opt.tau,
                                epsilon=opt.epsilon, m=opt.m,
                                epochs=opt.hmc_epochs,
                                sampling=opt.hmc_sampling)
            loss_fn = make_pixel_loss_fn(decode, operator, y0[0])
            if opt.mesh > 1:
                from .parallel.chains import chain_mesh, make_sharded_hmc

                builder = lambda p, op_, y_: make_pixel_loss_fn(
                    make_decoder(lambda x, t: model.apply(p, x, t),
                                 sched, seq, unroll=ladder_unroll(opt)),
                    op_, y_)
                if multiproc:
                    # --chains is the GLOBAL count; each process seeds its
                    # own slice and the states are lifted into one global
                    # array over the cross-host mesh.
                    mesh = mh.global_chain_mesh(opt.mesh)
                    local_n = opt.chains // mh.process_count()
                    k_local = jax.random.fold_in(k_run, mh.process_index())
                    local_states = init_chains(
                        k_local, hmc_cfg, local_n, (d, d, c))
                    states = mh.make_global_chain_states(mesh, local_states)
                else:
                    mesh = chain_mesh(opt.mesh)
                    states = init_chains(k_run, hmc_cfg, opt.chains, (d, d, c))
                runner = make_sharded_hmc(hmc_cfg, mesh, builder)
                out = runner(params, operator, y0[0], states)
                if multiproc:
                    out = out.replace(samples=_allgather_chain_axis(
                        mh, out.samples))
            elif (opt.checkpoint_dir or opt.verbose or opt.save_epochs
                  or opt.driver == "observed"
                  or (opt.driver == "auto"
                      and os.environ.get("PALLAS_AXON_POOL_IPS")
                      and jax.default_backend() == "tpu")):
                states = init_chains(k_run, hmc_cfg, opt.chains, (d, d, c))
                from .hmc.engine import run_hmc_observed
                from .utils.metrics import psnr as psnr_fn

                orig01 = jnp.asarray(x01)[None]
                # per-accept artifact trail matching the reference's
                # hmc_{epoch}.png saves + psnr/sigma_y accumulation
                # (main_sampling.py:733-742)
                trail = {"epoch": [], "psnr": [], "sigma_y": [], "tau": []}
                last_seen = [-1]

                def report(states, rnd):
                    e = int(states.epoch[0])
                    dec01 = im.inverse_data_transform(states.last_decoded[:1])
                    p = float(psnr_fn(dec01, orig01)[0])
                    if opt.verbose:
                        print(f"  attempt {rnd}: epoch {e} "
                              f"PSNR {p:.2f} "
                              f"sigma_y {float(states.sigma_y[0]):.3f} "
                              f"tau {float(states.tau[0]):.3f}")
                    if e > last_seen[0] and e > 0:  # new accepted proposal
                        last_seen[0] = e
                        trail["epoch"].append(e)
                        trail["psnr"].append(p)
                        trail["sigma_y"].append(float(states.sigma_y[0]))
                        trail["tau"].append(float(states.tau[0]))
                        if own_artifacts and opt.save_epochs:
                            im.save_image(
                                np.asarray(dec01[0]),
                                os.path.join(opt.image_folder,
                                             f"hmc_{e - 1}.png"))

                ckdir = (os.path.join(opt.checkpoint_dir, f"img{idx}")
                         if opt.checkpoint_dir else "")
                # weights as jit args (not closure constants): keeps the
                # per-attempt program small through remote-compile relays
                loss_builder = lambda p, y_: make_pixel_loss_fn(
                    make_decoder(lambda x, t: model.apply(p, x, t),
                                 sched, seq, unroll=ladder_unroll(opt)),
                    operator, y_)
                out = run_hmc_observed(
                    loss_fn, hmc_cfg, states,
                    callback=report
                    if (opt.verbose or opt.save_epochs) else None,
                    checkpoint_dir=ckdir,
                    loss_builder=loss_builder,
                    loss_args=(params, y0[0]),
                    attempts_per_round=getattr(opt, "attempts_per_round", 1),
                    chain_chunk=getattr(opt, "chain_chunk", 0),
                )
                if trail["epoch"] and own_artifacts:
                    with open(os.path.join(opt.image_folder,
                                           f"hmc_trail_{idx}.json"),
                              "w") as f:
                        json.dump(trail, f)
            elif opt.adapt == "da":
                from .hmc.adaptation import run_hmc_dual_averaging

                states = init_chains(k_run, hmc_cfg, opt.chains, (d, d, c))
                out, da = jax.jit(
                    lambda s: run_hmc_dual_averaging(loss_fn, hmc_cfg, s)
                )(states)
                print(f"  dual-averaged eps: "
                      f"{float(jnp.exp(da.log_eps_avg)):.4f} "
                      f"({int(da.t)} rounds)")
            else:
                states = init_chains(k_run, hmc_cfg, opt.chains, (d, d, c))
                out = jax.jit(lambda s: run_hmc(loss_fn, hmc_cfg, s))(states)
            if opt.diagnostics and opt.chains > 1 and out.samples.shape[1] >= 4:
                from .utils.diagnostics import summarize_chains, format_summary

                diag = summarize_chains(np.asarray(out.samples))
                print(f"  diagnostics: {format_summary(diag)}")
                if own_artifacts:
                    with open(os.path.join(opt.image_folder,
                                           f"diagnostics_{idx}.json"),
                              "w") as f:
                        json.dump(diag, f)
            samples = np.asarray(out.samples).reshape(
                -1, *out.samples.shape[2:]
            )
        elif opt.algo in ("dmplug_adam", "dmplug_lbfgs"):
            from .solvers.dmplug import dmplug_adam, dmplug_lbfgs

            def loss_and_decode(x):
                x0 = decode(x)
                r = y0 - operator.H_img(x0)
                return jnp.sum(r**2), x0

            x_init = jax.random.normal(k_run, (1, d, d, c))
            if opt.algo == "dmplug_adam":
                _, dec = jax.jit(
                    lambda x: dmplug_adam(loss_and_decode, x))(x_init)
            else:
                # drives device chunks from Python (early exit) — not
                # wrappable in an outer jit
                _, dec = dmplug_lbfgs(
                    loss_and_decode, x_init,
                    epochs=opt.lbfgs_epochs, max_inner=opt.lbfgs_inner)
            samples = np.asarray(dec)
        elif opt.algo == "daps":
            from .algos import DAPS

            algo = build_algo("daps", operator, sigma_0, opt.deg)
            x_init = jax.random.normal(k_run, (1, d, d, c))
            out = jax.jit(
                lambda x: run_daps(model_fn, sched, seq, algo, x, y0, k_run)
            )(x_init)
            samples = np.asarray(out)
        else:
            algo = build_algo(opt.algo, operator, sigma_0, opt.deg,
                              noise=opt.noise)
            x_init = jax.random.normal(k_run, (1, d, d, c))
            out = jax.jit(
                lambda x: iterative_sampling(
                    model_fn, sched, seq, algo, x, y0, k_run)
            )(x_init)
            samples = np.asarray(out)
        dt = time.time() - t0

        samples01 = np.asarray(im.inverse_data_transform(jnp.asarray(samples)))
        if own_artifacts:
            im.save_image(samples01[-1],
                          os.path.join(opt.image_folder, f"{idx}.png"))
            if samples01.shape[0] > 1:
                im.save_std_dev_map(
                    samples01,
                    os.path.join(opt.image_folder, f"std_dev_map_{idx}.png"),
                )

        orig01 = np.asarray(x01)[None]
        vals = {
            "psnr": np.asarray(psnr(jnp.asarray(samples01),
                                    jnp.asarray(np.repeat(orig01,
                                                          samples01.shape[0], 0)))),
            "ssim": np.asarray(ssim(jnp.asarray(samples01),
                                    jnp.asarray(np.repeat(orig01,
                                                          samples01.shape[0], 0)))),
        }
        if lpips_fn is not None:
            vals["lpips"] = np.asarray(
                lpips_fn(2 * jnp.asarray(samples01) - 1,
                         2 * jnp.asarray(np.repeat(orig01, samples01.shape[0],
                                                   0)) - 1)
            )
        stats.update(vals)
        rec = {"idx": idx, "file": os.path.basename(path), "algo": opt.algo,
               "deg": opt.deg, "wall_s": round(dt, 2),
               **{k: float(np.mean(v)) for k, v in vals.items()}}
        if own_artifacts:
            records.append(rec)
        if not multiproc:
            with open(os.path.join(opt.image_folder, "metrics.jsonl"), "a") as f:
                f.write(json.dumps(rec) + "\n")
        print(f"[{idx}] {os.path.basename(path)}: "
              + ", ".join(f"{k}={np.mean(v):.4f}" for k, v in vals.items())
              + f"  ({dt:.1f}s)")

    if multiproc:
        # process-0 aggregation: gather every host's metric rows, write the
        # combined metrics.jsonl and the cross-host summary on the primary.
        all_rows = mh.gather_records(records)
        if mh.is_primary():
            with open(os.path.join(opt.image_folder, "metrics.jsonl"), "a") as f:
                for rec in sorted(all_rows, key=lambda r: r["idx"]):
                    f.write(json.dumps(rec) + "\n")
        keys = [k for k in ("psnr", "ssim", "lpips") if any(k in r for r in all_rows)]
        summary = {k: float(np.mean([r[k] for r in all_rows if k in r]))
                   for k in keys}
        summary["images"] = len(all_rows)
        if mh.is_primary():
            print(json.dumps({"summary": summary}))
        return summary

    summary = stats.summary()
    print(json.dumps({"summary": summary}))
    return summary


def _run_pixel_hmc_batched(opt, cfg, model, params, sched, seq, operator,
                           sigma_0, files, stats):
    """Images x chains in one jitted program per batch (run_hmc_multi)."""
    import jax
    import jax.numpy as jnp
    from .sampling.ddim import make_decoder
    from .hmc.engine import (
        HMCConfig, init_chains, make_pixel_loss_fn, run_hmc_multi,
    )
    from .utils import images as im
    from .utils.metrics import psnr, ssim

    d = cfg["data"]["image_size"]
    c = cfg["data"]["channels"]
    decode = make_decoder(lambda x, t: model.apply(params, x, t), sched, seq,
                          unroll=ladder_unroll(opt))
    hmc_cfg = HMCConfig(sigma_0=sigma_0, tau=opt.tau, epsilon=opt.epsilon,
                        m=opt.m, epochs=opt.hmc_epochs,
                        sampling=opt.hmc_sampling)

    def builder(y0):
        return make_pixel_loss_fn(decode, operator, y0)

    runner = jax.jit(
        lambda s, y: run_hmc_multi(builder, hmc_cfg, s, y)
    )

    bsz = opt.image_batch
    for start in range(0, len(files), bsz):
        chunk = files[start:start + bsz]
        x01s = np.stack([im.load_image(p, d) for p in chunk])
        x_orig = im.data_transform(jnp.asarray(x01s))
        key = jax.random.PRNGKey(opt.seed + start)
        k_noise, k_run = jax.random.split(key)
        y0s = operator.H_img(x_orig)
        y0s = y0s + sigma_0 * jax.random.normal(k_noise, y0s.shape)
        keys = jax.random.split(k_run, len(chunk))
        states = jax.vmap(
            lambda k: init_chains(k, hmc_cfg, opt.chains, (d, d, c))
        )(keys)
        t0 = time.time()
        out = runner(states, y0s)
        jax.block_until_ready(out.samples)
        dt = time.time() - t0
        y_pinv = operator.H_pinv_img(y0s)
        for bi, path in enumerate(chunk):
            idx = start + bi
            im.save_image(x01s[bi],
                          os.path.join(opt.image_folder, f"orig_{idx}.png"))
            im.save_image(im.inverse_data_transform(y_pinv[bi]),
                          os.path.join(opt.image_folder, f"y0_{idx}.png"))
            samples01 = np.asarray(im.inverse_data_transform(
                jnp.asarray(np.asarray(out.samples)[bi]).reshape(
                    -1, d, d, c)))
            im.save_image(samples01[-1],
                          os.path.join(opt.image_folder, f"{idx}.png"))
            orig01 = np.repeat(x01s[bi][None], samples01.shape[0], 0)
            vals = {
                "psnr": np.asarray(psnr(jnp.asarray(samples01),
                                        jnp.asarray(orig01))),
                "ssim": np.asarray(ssim(jnp.asarray(samples01),
                                        jnp.asarray(orig01))),
            }
            stats.update(vals)
            rec = {"idx": idx, "file": os.path.basename(path),
                   "algo": opt.algo, "deg": opt.deg,
                   "wall_s": round(dt / len(chunk), 2),
                   **{k: float(np.mean(v)) for k, v in vals.items()}}
            with open(os.path.join(opt.image_folder, "metrics.jsonl"),
                      "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(f"[{idx}] {os.path.basename(path)}: "
                  + ", ".join(f"{k}={np.mean(v):.4f}" for k, v in vals.items())
                  + f"  ({dt / len(chunk):.1f}s/img)")
    summary = stats.summary()
    print(json.dumps({"summary": summary}))
    return summary


def main(argv=None):
    opt = get_parser().parse_args(argv)
    from .utils.profiling import enable_persistent_cache
    from .parallel import multihost

    multihost.maybe_initialize()  # env-gated (NSHMC_DIST=1) process group
    enable_persistent_cache()  # repeat runs skip the multi-minute compile
    if opt.algo in ("hmc_latent", "resample", "resample_original"):
        from .cli_latent import run_latent

        return run_latent(opt)
    return run_pixel(opt)


if __name__ == "__main__":
    main()
