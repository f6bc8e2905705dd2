"""Latent-space experiment driver.

Replacement for the reference latent entry point
(ref: main_sampling_latent.py:901-919 and sample_image:369-539): builds the
LDM (latent U-Net + VQ-f4 first stage), samples z_T at the latent shape,
runs latent noise-space HMC (or latent baselines), decodes through the VQ
decoder, and computes pixel-space metrics.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def extract_kept_samples(rings: np.ndarray, kept: np.ndarray) -> np.ndarray:
    """Flatten the per-chain sample rings to the valid (most-recent) entries.

    rings: (chains, keep_samples, ...) — newest at the end, zero-padded at
    the front; kept: (chains,) accepted-sample counts. Returns a stacked
    (sum(min(kept, keep)), ...) array. Empty if no chain kept anything.
    """
    keep = rings.shape[1]
    parts = [rings[i, keep - min(int(k), keep):]
             for i, k in enumerate(np.asarray(kept)) if int(k) > 0]
    if not parts:
        return np.zeros((0,) + rings.shape[2:], rings.dtype)
    return np.concatenate(parts)


def run_latent(opt):
    import jax
    import jax.numpy as jnp
    from .schedules import DDIMSequence
    from .operators import build_operator
    from .sampling.ddim import make_decoder
    from .models.ldm import LatentDiffusion, AutoencoderConfig, latent_unet_config
    from .hmc.latent import (
        LatentHMCConfig, init_latent_chains, run_latent_hmc,
        make_latent_loss_fn,
    )
    from .cli import load_config, ladder_unroll
    from .utils import images as im
    from .utils.metrics import psnr, ssim, RunningStats

    cfg = load_config(opt.config)
    d = cfg["data"]["image_size"]
    c = cfg["data"]["channels"]
    zd = cfg["model"]["image_size"]  # latent spatial size
    rng = np.random.default_rng(opt.seed)

    unet_cfg = latent_unet_config(
        image_size=zd,
        model_channels=cfg["model"]["unet"]["model_channels"],
        num_res_blocks=cfg["model"]["unet"]["num_res_blocks"],
        channel_mult=tuple(cfg["model"]["unet"]["channel_mult"]),
        attention_ds=tuple(cfg["model"]["unet"]["attention_resolutions"]),
        num_head_channels=cfg["model"]["unet"]["num_head_channels"],
    )
    ae_cfg = AutoencoderConfig(
        ch=cfg["model"]["first_stage"]["ch"],
        ch_mult=tuple(cfg["model"]["first_stage"]["ch_mult"]),
        num_res_blocks=cfg["model"]["first_stage"]["num_res_blocks"],
        z_channels=cfg["model"]["first_stage"]["z_channels"],
        embed_dim=cfg["model"]["first_stage"]["embed_dim"],
        n_embed=cfg["model"]["first_stage"]["n_embed"],
        resolution=cfg["model"]["first_stage"]["resolution"],
    )
    ldm = LatentDiffusion.create(
        jax.random.PRNGKey(0), unet_cfg, ae_cfg,
        linear_start=cfg["model"]["linear_start"],
        linear_end=cfg["model"]["linear_end"],
        num_timesteps=cfg["model"]["timesteps"],
    )
    ckpt = opt.ckpt or cfg["model"].get("ckpt_path", "")
    if ckpt and os.path.exists(ckpt):
        import torch
        from .models.ldm.port import port_ldm_checkpoint
        from .schedules import DiffusionSchedule

        sd = torch.load(ckpt, map_location="cpu", weights_only=False)
        sd = sd.get("state_dict", sd)
        unet_params, ae_params, ac = port_ldm_checkpoint(sd, unet_cfg, ae_cfg)
        ldm.unet_params = unet_params
        ldm.first_stage_params = ae_params
        if ac is not None:
            ldm.schedule = DiffusionSchedule.from_alphas_cumprod(ac)
        print(f"loaded LDM checkpoint {ckpt}")
    else:
        print(f"LDM checkpoint {ckpt!r} not found: random init")

    seq = DDIMSequence.create(cfg["model"]["timesteps"], opt.timesteps)
    stop_grad = not getattr(opt, "latent_full_grad", False)
    # scan_remat only pays when gradients flow through the eps-net (with the
    # parity stop-grad ladder it would recompute the eps-net forwards in
    # backward for residuals nothing needs)
    decode_z = make_decoder(ldm.model_fn(stop_gradient=stop_grad),
                            ldm.schedule, seq, unroll=ladder_unroll(opt),
                            scan_remat=not stop_grad)

    operator = build_operator(opt.deg, c, d, rng)
    sigma_0 = 2.0 * opt.sigma_0

    from .parallel import multihost as mh

    files = im.list_dataset(
        getattr(opt, "data_path", "") or cfg["data"]["path"]
    )[opt.subset_start:opt.subset_end]
    indexed_files = list(enumerate(files))
    multiproc = mh.process_count() > 1
    # same multi-host decomposition as the pixel CLI: a sharded chain mesh
    # means every process cooperates on the SAME image; otherwise processes
    # split the dataset
    if multiproc and opt.mesh <= 1:
        indexed_files = indexed_files[mh.process_index()::mh.process_count()]
    own_artifacts = (not multiproc) or opt.mesh <= 1 or mh.is_primary()
    os.makedirs(opt.image_folder, exist_ok=True)
    stats = RunningStats()
    lpips_fn = None
    try:
        from .utils.lpips import try_load_lpips

        loaded = try_load_lpips()
        if loaded:
            lpips_fn = loaded[0]
    except Exception:
        pass

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
            im.save_image(x01,
                          os.path.join(opt.image_folder, f"orig_{idx}.png"))

        t0 = time.time()
        if opt.algo == "hmc_latent":
            hmc_cfg = LatentHMCConfig(
                sigma_0=sigma_0, sigma_y0=opt.sigma_y, tau=opt.tau,
                epsilon=opt.epsilon, m=opt.m,
                epochs=opt.latent_epochs, sampling=opt.latent_sampling,
                keep_samples=min(10, max(1, opt.latent_sampling)),
            )
            loss_fn = make_latent_loss_fn(
                decode_z, ldm.decode_first_stage, operator, y0[0]
            )
            states = init_latent_chains(
                k_run, hmc_cfg, opt.chains, (zd, zd, unet_cfg.in_channels)
            )
            if opt.mesh > 1:
                from .parallel.chains import chain_mesh, make_sharded_latent_hmc
                from .sampling.ddim import make_decoder as _mk

                def builder(unet_params, ae_params, op_, y_):
                    ldm_r = ldm  # structural reuse; params passed explicitly

                    def model_fn(z, t):
                        out = ldm_r.unet.apply(unet_params, z, t)
                        return jax.lax.stop_gradient(out) if stop_grad else out

                    dec_z = _mk(model_fn, ldm_r.schedule, seq,
                                scan_remat=not stop_grad)
                    dec_x = lambda z: ldm_r.first_stage.apply(
                        ae_params, z / ldm_r.scale_factor,
                        method=type(ldm_r.first_stage).decode)
                    return make_latent_loss_fn(dec_z, dec_x, op_, y_)

                if multiproc:
                    # --chains is the GLOBAL count: each process seeds its
                    # local slice and lifts it into one global array over
                    # the cross-host mesh (same contract as the pixel CLI)
                    mesh = mh.global_chain_mesh(opt.mesh)
                    local_n = opt.chains // mh.process_count()
                    k_local = jax.random.fold_in(k_run, mh.process_index())
                    local_states = init_latent_chains(
                        k_local, hmc_cfg, local_n,
                        (zd, zd, unet_cfg.in_channels))
                    states = mh.make_global_chain_states(mesh, local_states)
                else:
                    mesh = chain_mesh(opt.mesh)
                runner = make_sharded_latent_hmc(hmc_cfg, mesh, builder)
                out = runner(ldm.unet_params, ldm.first_stage_params,
                             operator, y0[0], states)
                if multiproc:
                    from .cli import _allgather_chain_axis

                    out = out.replace(
                        samples=_allgather_chain_axis(mh, out.samples),
                        n_kept=_allgather_chain_axis(mh, out.n_kept),
                        z=_allgather_chain_axis(mh, out.z))
            elif (opt.checkpoint_dir or opt.verbose
                  or opt.driver == "observed"
                  or (opt.driver == "auto"
                      and os.environ.get("PALLAS_AXON_POOL_IPS")
                      and jax.default_backend() == "tpu")):
                from .hmc.latent import run_latent_hmc_observed

                def report(states, rnd):
                    # Hamiltonian decomposition + acceptance ratio, mirroring
                    # the reference prints (main_sampling_latent.py:655-688)
                    prior = 0.5 * float(jnp.sum(states.z[0] ** 2))
                    sig = float(states.sigma_y[0])
                    lik = float(states.last_loss[0]) / (2.0 * sig**2)
                    ratio = float(
                        jnp.exp(jnp.minimum(states.last_log_ratio[0], 0.0)))
                    print(f"  attempt {rnd}: accepted "
                          f"{int(states.accepted[0])} "
                          f"H: prior {prior:.1f} + lik {lik:.1f} "
                          f"accept_ratio {ratio:.3f} "
                          f"sigma_y {sig:.3f} "
                          f"tau {float(states.tau[0]):.3f}")

                ckdir = (os.path.join(opt.checkpoint_dir, f"img{idx}")
                         if opt.checkpoint_dir else "")

                # LDM weights as jit args, not closure constants (the
                # constants path overflowed the relay request limit)
                def loss_builder(unet_params, ae_params, y_):
                    def model_fn(z, t):
                        o = ldm.unet.apply(unet_params, z, t)
                        return jax.lax.stop_gradient(o) if stop_grad else o

                    dec_z = make_decoder(model_fn, ldm.schedule, seq,
                                         unroll=ladder_unroll(opt),
                                         scan_remat=not stop_grad)
                    dec_x = lambda z: ldm.first_stage.apply(
                        ae_params, z / ldm.scale_factor,
                        method=type(ldm.first_stage).decode)
                    return make_latent_loss_fn(dec_z, dec_x, operator, y_)

                out = run_latent_hmc_observed(
                    loss_fn, hmc_cfg, states,
                    callback=report if opt.verbose else None,
                    checkpoint_dir=ckdir,
                    loss_builder=loss_builder,
                    loss_args=(ldm.unet_params, ldm.first_stage_params,
                               y0[0]),
                    attempts_per_round=getattr(opt, "attempts_per_round", 1),
                    chain_chunk=getattr(opt, "chain_chunk", 0),
                )
            else:
                out = jax.jit(
                    lambda s: run_latent_hmc(loss_fn, hmc_cfg, s))(states)
            z_samples = extract_kept_samples(
                np.asarray(out.samples), np.asarray(out.n_kept))
            if z_samples.shape[0] == 0:
                # no accepted post-anneal proposals: decode the final chain
                # state instead of the (empty) sample ring — the reference
                # would crash stacking an empty final_img_list (:760).
                # params as jit args (closure constants overflow the relay)
                def _ddim_args(unet_params, z):
                    def model_fn(zz, t):
                        o = ldm.unet.apply(unet_params, zz, t)
                        return jax.lax.stop_gradient(o) if stop_grad else o

                    return make_decoder(model_fn, ldm.schedule, seq,
                                        unroll=ladder_unroll(opt),
                                        scan_remat=False)(z)

                z_samples = np.asarray(
                    jax.jit(_ddim_args)(ldm.unet_params, out.z))
            z_samples = z_samples.reshape(-1, zd, zd, unet_cfg.in_channels)

            def _decode_args(ae_params, z):
                return ldm.first_stage.apply(
                    ae_params, z / ldm.scale_factor,
                    method=type(ldm.first_stage).decode)

            decoded = jax.jit(_decode_args)(
                ldm.first_stage_params, jnp.asarray(z_samples))
            samples = np.asarray(decoded)
        elif opt.algo == "resample":
            from .algos.resample import ReSample
            from .sampling.loop import iterative_sampling

            algo = ReSample(
                operator=operator, sigma_0=sigma_0,
                decode_fn=ldm.decode_first_stage,
            )
            z_init = jax.random.normal(k_run, (1, zd, zd, unet_cfg.in_channels))
            z_out = iterative_sampling(
                ldm.model_fn(stop_gradient=False), ldm.schedule, seq,
                algo, z_init, y0, k_run,
            )
            samples = np.asarray(ldm.decode_first_stage(z_out))
        elif opt.algo == "resample_original":
            from .sampling.resample_original import (
                ResampleOriginalConfig, resample_original_sample,
            )

            rcfg = ResampleOriginalConfig(ddim_steps=max(opt.timesteps, 10))
            z = jax.random.normal(k_run, (1, zd, zd, unet_cfg.in_channels))
            z_out = jax.jit(
                lambda z: resample_original_sample(
                    ldm.model_fn(stop_gradient=True), ldm.schedule,
                    ldm.decode_first_stage, ldm.encode_first_stage,
                    operator, y0, z, k_run, rcfg,
                )
            )(z)
            samples = np.asarray(ldm.decode_first_stage(z_out))
        else:
            raise NotImplementedError(opt.algo)
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
        orig01 = np.repeat(np.asarray(x01)[None], samples01.shape[0], 0)
        vals = {
            "psnr": np.asarray(psnr(jnp.asarray(samples01), jnp.asarray(orig01))),
            "ssim": np.asarray(ssim(jnp.asarray(samples01), jnp.asarray(orig01))),
        }
        if lpips_fn is not None:
            vals["lpips"] = np.asarray(
                lpips_fn(2 * jnp.asarray(samples01) - 1,
                         2 * jnp.asarray(orig01) - 1))
        stats.update(vals)
        rec = {"idx": idx, "file": os.path.basename(path), "algo": opt.algo,
               "deg": opt.deg, "wall_s": round(dt, 2),
               **{k: float(np.mean(v)) for k, v in vals.items()}}
        if own_artifacts:
            with open(os.path.join(opt.image_folder, "metrics.jsonl"),
                      "a") as f:
                f.write(json.dumps(rec) + "\n")
        print(f"[{idx}] {os.path.basename(path)}: "
              + ", ".join(f"{k}={np.mean(v):.4f}" for k, v in vals.items())
              + f"  ({dt:.1f}s)")

    summary = stats.summary()
    print(json.dumps({"summary": summary}))
    return summary
