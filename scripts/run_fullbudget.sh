#!/bin/bash
# Full-reference-budget flagship runs on hardware (VERDICT r2 item 4).
#
# Pixel: 60 anneal + 2x20 sampling epochs = 100 accepted epochs x 21
#   energy+grad evals (ref main_sampling.py:664-666,704), 8 chains,
#   observed driver (per-attempt dispatch; orbax checkpointing live),
#   --save_epochs --diagnostics artifact trail.
# Latent: 50 + 2x10 = 70 attempt budget (main_sampling_latent.py:628-630).
#
# Usage: scripts/run_fullbudget.sh [pixel|latent]
set -u
cd "$(dirname "$0")/.."
mode="${1:-pixel}"
if [ "$mode" = "pixel" ]; then
  exec python -m nshmc_tpu.cli \
    --algo hmc --deg inpaint_random --timesteps 3 \
    --tau 1.0 --epsilon 0.05 --sigma_0 0.05 \
    --hmc_epochs 60 --hmc_sampling 20 --chains 8 \
    --driver observed --verbose --save_epochs --diagnostics \
    --checkpoint-dir out/r4_fullbudget_ck -i out/r4_fullbudget \
    --seed 1234
else
  # CelebA-HQ images are unobtainable offline: run the CelebA-HQ LDM
  # config against the shipped FFHQ 256^2 test set as measurement ground
  # truth (--data_path override; the model/operator pipeline is identical)
  exec python -m nshmc_tpu.cli \
    --config configs/celebahq_latent.yaml \
    --data_path /root/reference/exp/datasets/ffhq/samples_1k \
    --algo hmc_latent --deg inpaint_random --timesteps 3 \
    --tau 1.0 --epsilon 0.05 --sigma_0 0.05 \
    --latent_epochs 50 --latent_sampling 10 --chains 8 \
    --verbose --save_epochs \
    --checkpoint-dir out/r4_fullbudget_latent_ck -i out/r4_fullbudget_latent \
    --seed 1234
fi
