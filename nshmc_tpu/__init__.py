"""nshmc_tpu: a TPU-native (JAX/XLA/Pallas) framework for noise-space HMC on
diffusion inverse problems.

Re-designed from scratch with the capabilities of the reference PyTorch codebase
(Sunsett5/Noise-space-HMC): pretrained diffusion priors (ADM pixel U-Net, LDM
latent U-Net + VQ autoencoder), a library of SVD-structured forward operators,
a differentiable few-step DDIM decoder, and a family of posterior samplers
(N-HMC, DMPlug, DDNM, DDRM, DPS, PiGDM, RED-diff, DiffPIR, DMPS, DAPS,
ReSample) — all expressed as pure, jittable JAX programs that vmap over chains
and shard over TPU meshes.

Layout:
  schedules   — beta/alpha-cumprod tables and DDIM timestep sequences
  operators   — matrix-free SVD forward operators (H = U S V^T)
  models      — Flax score networks (ADM U-Net, DDPM simple, LDM stack)
  ops         — Pallas TPU kernels (fused attention with custom vjp)
  sampling    — differentiable DDIM decode loop (lax.scan)
  algos       — posterior-sampling step functions (cal_x0 / map_back registry)
  hmc         — noise-space HMC engine (leapfrog, MH, annealing, adaptation)
  solvers     — DMPlug optimization solvers (Adam / L-BFGS over x_T)
  parallel    — device mesh + shard_map chain parallelism
  utils       — metrics (PSNR/SSIM/LPIPS), image IO, checkpointing
"""

__version__ = "0.1.0"
