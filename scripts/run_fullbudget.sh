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
#
# APR (attempts_per_round) defaults to 7: fuses 7 MH attempts per device
# dispatch in the observed driver, amortizing the measured ~1.26 s/attempt
# host-sync tax (r5 warm-compile ladder: 5.94 s/attempt at apr=1 -> 4.92
# at apr=7, 1.17x wall; apr>=21 is killed by the relay's execution limit;
# statistics bitwise-unchanged — budget-done chains freeze per attempt
# inside the fused program). Override: APR=1. See BASELINE.md round-5.
set -u
cd "$(dirname "$0")/.."
mode="${1:-pixel}"
APR="${APR:-7}"
if [ "$mode" = "pixel" ]; then
  exec python -m nshmc_tpu.cli \
    --algo hmc --deg inpaint_random --timesteps 3 \
    --tau 1.0 --epsilon 0.05 --sigma_0 0.05 \
    --hmc_epochs 60 --hmc_sampling 20 --chains 8 \
    --driver observed --verbose --save_epochs --diagnostics \
    --attempts_per_round "$APR" \
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
    --verbose --save_epochs --attempts_per_round "$APR" \
    --checkpoint-dir out/r4_fullbudget_latent_ck -i out/r4_fullbudget_latent \
    --seed 1234
fi
