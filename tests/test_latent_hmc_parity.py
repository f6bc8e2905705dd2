"""Latent HMC driver parity against a mirror of the reference hmc_latent
loop (main_sampling_latent.py:623-762) with injected randomness.

The mirror re-derives the reference's distinct semantics in numpy/jax on
top of OUR loss oracle (whose components — DDIM decode, VQ decoder,
operator — are parity-tested separately): attempt-count epochs, geometric
sigma_y annealing applied on accept, post-anneal tau/eps pinning, x0.9
backoff with counter reset, previous-accept sample ring. Trajectories and
bookkeeping must match the engine exactly (shared randomness, shared
float stack => bitwise-level agreement here, unlike the torch-mirror
pixel test)."""
import numpy as np
import jax
import jax.numpy as jnp

from nshmc_tpu.models.ldm import AutoencoderConfig, LatentDiffusion
from nshmc_tpu.models.unet import UNetConfig
from nshmc_tpu.operators import SuperResolution
from nshmc_tpu.schedules import DDIMSequence
from nshmc_tpu.sampling.ddim import make_decoder
from nshmc_tpu.hmc.latent import (
    LatentHMCConfig, init_latent_chain, latent_hmc_attempt,
    make_latent_loss_fn,
)
from nshmc_tpu.hmc.engine import leapfrog_propose


def test_latent_hmc_matches_reference_semantics_mirror():
    ae_cfg = AutoencoderConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                               z_channels=3, embed_dim=3, n_embed=32,
                               resolution=16)
    unet_cfg = UNetConfig(
        image_size=8, in_channels=3, model_channels=32, out_channels=3,
        num_res_blocks=1, attention_ds=(2,), channel_mult=(1, 2),
        num_heads=1, num_head_channels=16, use_scale_shift_norm=False,
        resblock_updown=False,
    )
    ldm = LatentDiffusion.create(jax.random.PRNGKey(0), unet_cfg, ae_cfg,
                                 num_timesteps=100)
    seq = DDIMSequence.create(100, 3)
    decode_z = make_decoder(ldm.model_fn(stop_gradient=True), ldm.schedule, seq)
    op = SuperResolution.create(3, 16, 2)
    rng = np.random.default_rng(0)
    x_orig = jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 3)), jnp.float32)
    y0 = op.H_img(x_orig)[0]
    loss_fn = make_latent_loss_fn(decode_z, ldm.decode_first_stage, op, y0)

    cfg = LatentHMCConfig(sigma_0=0.2, sigma_y0=1.0, tau=0.15, epsilon=0.05,
                          epochs=4, sampling=2, keep_samples=2)
    key0 = jax.random.PRNGKey(3)
    state = init_latent_chain(key0, cfg, (8, 8, 3))
    attempt = jax.jit(lambda s: latent_hmc_attempt(loss_fn, cfg, s))

    # ---- mirror of the reference control flow (attempt-count epochs) -----
    kz, key = jax.random.split(key0)
    z_m = jax.random.normal(kz, (8, 8, 3), jnp.float32)
    tau_m, eps_m = cfg.tau, cfg.epsilon
    sigma_m = cfg.sigma_y0
    rejected_m = 0
    samples_m = []
    last_z0 = None

    for a in range(cfg.total_attempts):
        key, k_prop = jax.random.split(key)
        accept, zp, dec_z, loss, _ = leapfrog_propose(
            loss_fn, z_m, sigma_m, eps_m, cfg.n_leapfrog, cfg.m, k_prop)
        accept = bool(accept)
        in_anneal = a < cfg.epochs
        if accept:
            # geometric anneal on accept (:695) / post pinning (:706-708)
            if in_anneal:
                sigma_m = cfg.sigma_y0 * (cfg.sigma_0 / cfg.sigma_y0) ** (
                    a / cfg.epochs)
            else:
                sigma_m = cfg.sigma_0
                tau_m, eps_m = cfg.post_tau, cfg.post_epsilon
                if last_z0 is not None:
                    samples_m.append(np.asarray(last_z0))
            z_m = zp
            last_z0 = dec_z
            rejected_m = 0
        else:
            rejected_m += 1
            if rejected_m >= 2:
                tau_m *= cfg.backoff
                eps_m *= cfg.backoff
                rejected_m = 0

        state = attempt(state)
        np.testing.assert_allclose(np.asarray(state.z), np.asarray(z_m),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(float(state.sigma_y), sigma_m, rtol=1e-6)
        np.testing.assert_allclose(float(state.epsilon), eps_m, rtol=1e-6)
        assert int(state.rejected) == rejected_m, a

    # post-anneal accepts before any prior accept would append the
    # zero-initialized last_z0 in both implementations, so ring contents
    # agree in all cases:
    kept = np.asarray(state.samples)[-len(samples_m):] if samples_m else None
    if samples_m:
        np.testing.assert_allclose(
            kept, np.stack(samples_m)[-cfg.keep_samples:], atol=1e-5)
    assert int(state.attempt) == cfg.total_attempts
