"""Full original ReSample sampler (standalone DDIM sampler variant).

Re-design of the reference `algos/resample_original.py` (DDIMSampler:11-472):
  make_schedule         (:427-455)  — uniform DDIM timestep subset + alpha tables
  p_sample_ddim         (:118-167 of class; file :427+) — eta-DDIM step
  resample_sampling     (:186-317)  — per-step DPS guidance through the
     differentiable decoder (scale = a_t * 0.5, L2-norm loss), with staged
     time-travel every 5th index in the later 2/3 of the trajectory:
     stage 2 (index >= total/3): pixel-space optimization (50 AdamW steps,
       lr 1e-2) -> encode back to latent -> stochastic resample;
     stage 3 (index < total/3): latent optimization (25 AdamW steps,
       lr 5e-3) -> stochastic resample;
     final latent optimization at the end (:311-315)
  stochastic_resample   (:419-425)

Implemented as one jitted lax.scan with lax.cond branches on the (traced)
step index; inner optimizations are fixed-length fori_loops (the reference's
loss-based early stopping is replaced by fixed budgets — documented
deviation, same compute ceiling).
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..schedules import DiffusionSchedule


@dataclasses.dataclass(frozen=True)
class ResampleOriginalConfig:
    ddim_steps: int = 500
    eta: float = 0.0
    gamma: float = 40.0  # sigma scale in time-travel (ref :270, :299)
    travel_every: int = 5
    splits: int = 3
    pixel_opt_iters: int = 50
    pixel_opt_lr: float = 1e-2
    latent_opt_iters: int = 25
    latent_opt_lr: float = 5e-3


def make_ddim_timesteps(num_ddim: int, num_ddpm: int) -> np.ndarray:
    """Uniform subset + 1 shift (ref: ldm/modules/diffusionmodules/util.py:46-60)."""
    c = num_ddpm // num_ddim
    return np.asarray(range(0, num_ddpm, c)) + 1


def make_ddim_alphas(schedule: DiffusionSchedule, timesteps: np.ndarray,
                     eta: float):
    """(ref: ldm/modules/diffusionmodules/util.py:64-77
    make_ddim_sampling_parameters): alphacums indexed at the +1-shifted
    ddim timesteps directly — alphacums[t] with t already shifted."""
    ac = np.asarray(schedule.alphas_cumprod)
    alphas = ac[timesteps]
    alphas_prev = np.concatenate([[ac[0]], ac[timesteps[:-1]]])
    sigmas = eta * np.sqrt(
        (1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev)
    )
    return alphas, alphas_prev, sigmas


def _adamw_opt(loss_fn, x0, iters, lr):
    # weight_decay matches torch.optim.AdamW's default 0.01 used by the
    # reference inner solves (resample_original.py:338,384); optax's own
    # default is 1e-4
    opt = optax.adamw(lr, weight_decay=0.01)

    def body(i, carry):
        x, st = carry
        g = jax.grad(loss_fn)(x)
        updates, st = opt.update(g, st, x)
        return optax.apply_updates(x, updates), st

    x, _ = jax.lax.fori_loop(0, iters, body, (x0, opt.init(x0)))
    return x


def stochastic_resample(pred_x0, x_t, a_t, sigma, noise):
    """(ref: resample_original.py:419-425). `noise` is a standard-normal
    draw of pred_x0's shape (passed in so parity tests can replay the
    reference's RNG)."""
    var = 1.0 / (1.0 / sigma + 1.0 / (1.0 - a_t))
    return (
        sigma * jnp.sqrt(a_t) * pred_x0 + (1 - a_t) * x_t
    ) / (sigma + 1 - a_t) + noise * jnp.sqrt(var)


def resample_original_sample(
    model_fn: Callable,  # eps model (stop-grad for parity, ddpm.py:892)
    schedule: DiffusionSchedule,
    decode_fn: Callable,  # differentiable latent -> pixel decoder
    encode_fn: Callable,  # pixel -> latent encoder
    operator,
    y0: jnp.ndarray,  # (B, d_y)
    z_T: jnp.ndarray,  # (B, h, w, c)
    key,
    cfg: ResampleOriginalConfig = ResampleOriginalConfig(),
    travel_noise: jnp.ndarray | None = None,
):
    """Run the full ReSample trajectory; returns the final latent.

    `travel_noise` (optional, shape (num_steps,) + z_T.shape) replaces the
    per-step stochastic-resample draws — used by parity tests to replay
    the reference's torch.randn_like sequence; production runs leave it
    None and draw from `key`.
    """
    timesteps = make_ddim_timesteps(cfg.ddim_steps, schedule.num_timesteps)
    alphas, alphas_prev, sigmas = make_ddim_alphas(schedule, timesteps, cfg.eta)
    total = len(timesteps)
    split = total // cfg.splits

    # per-scan-step tables, in sampling order (descending t)
    order = np.arange(total)[::-1]
    xs = {
        "step": jnp.asarray(timesteps[order], jnp.float32),
        "index": jnp.asarray(order, jnp.int32),
        "a_t": jnp.asarray(alphas[order], jnp.float32),
        "a_prev": jnp.asarray(alphas_prev[order], jnp.float32),
        "sigma_t": jnp.asarray(sigmas[order], jnp.float32),
    }
    if travel_noise is not None:
        assert travel_noise.shape == (total,) + z_T.shape, travel_noise.shape
        xs["travel_noise"] = jnp.asarray(travel_noise)

    def pixel_stage(pred_x0, x_t, a_prev, a_t, noise):
        """(ref :277-292)."""
        x_pix = decode_fn(pred_x0)

        def ploss(x):
            return jnp.mean((y0 - operator.H_img(x)) ** 2)

        opt_pix = _adamw_opt(ploss, x_pix, cfg.pixel_opt_iters, cfg.pixel_opt_lr)
        opt_lat = encode_fn(opt_pix)
        sigma = cfg.gamma * (1 - a_prev) / (1 - a_t) * (1 - a_t / a_prev)
        return stochastic_resample(opt_lat, x_t, a_prev, sigma, noise)

    def latent_stage(pred_x0, x_t, a_prev, a_t, noise):
        """(ref :294-304)."""

        def lloss(z):
            return jnp.mean((y0 - operator.H_img(decode_fn(z))) ** 2)

        opt_lat = _adamw_opt(lloss, pred_x0, cfg.latent_opt_iters,
                             cfg.latent_opt_lr)
        sigma = cfg.gamma * (1 - a_prev) / (1 - a_t) * (1 - a_t / a_prev)
        return stochastic_resample(opt_lat, x_t, a_prev, sigma, noise)

    def body(carry, x):
        img, key = carry
        key, k_noise, k_travel = jax.random.split(key, 3)
        step, index = x["step"], x["index"]
        a_t, a_prev, sigma_t = x["a_t"], x["a_prev"], x["sigma_t"]
        tnoise = x.get("travel_noise")
        if tnoise is None:
            tnoise = jax.random.normal(k_travel, img.shape)

        def guided(img_in):
            tb = jnp.full((img_in.shape[0],), step)
            e_t = model_fn(img_in, tb)[..., : img_in.shape[-1]]
            pred_x0 = (img_in - jnp.sqrt(1 - a_t) * e_t) / jnp.sqrt(a_t)
            dir_xt = jnp.sqrt(jnp.maximum(1 - a_prev - sigma_t**2, 0.0)) * e_t
            noise = sigma_t * jax.random.normal(k_noise, img_in.shape)
            out = jnp.sqrt(a_prev) * pred_x0 + dir_xt + noise
            diff = y0 - operator.H_img(decode_fn(pred_x0))
            norm = jnp.linalg.norm(diff)
            return norm, (out, pred_x0)

        (norm, (out, pred_x0)), norm_grad = jax.value_and_grad(
            guided, has_aux=True)(img)
        img = out - norm_grad * (a_t * 0.5)  # (ref :252-256)

        do_travel = (
            (index <= total - split) & (index > 0)
            & (index % cfg.travel_every == 0)
        )
        img = jax.lax.cond(
            do_travel,
            lambda im: jax.lax.cond(
                index >= split,
                lambda: pixel_stage(jax.lax.stop_gradient(pred_x0), im,
                                    a_prev, a_t, tnoise),
                lambda: latent_stage(jax.lax.stop_gradient(pred_x0), im,
                                     a_prev, a_t, tnoise),
            ),
            lambda im: im,
            img,
        )
        return (img, key), None

    (img, key), _ = jax.lax.scan(body, (z_T, key), xs)

    # final latent optimization (ref :311-315)
    def lloss(z):
        return jnp.mean((y0 - operator.H_img(decode_fn(z))) ** 2)

    return _adamw_opt(lloss, img, cfg.latent_opt_iters, cfg.latent_opt_lr)
