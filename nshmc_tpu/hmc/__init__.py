from .engine import (
    HMCConfig, ChainState, init_chain_state, init_chains, hmc_attempt,
    leapfrog_propose, make_pixel_loss_fn, run_chain, run_hmc, run_hmc_multi,
    run_hmc_observed,
)
from .latent import (
    LatentHMCConfig, LatentChainState, init_latent_chain, init_latent_chains,
    latent_hmc_attempt, run_latent_chain, run_latent_hmc, make_latent_loss_fn,
)
from .adaptation import (
    ConditionedHMCConfig, DualAveragingState, dual_averaging_update,
    init_conditioned_chains, run_conditioned_hmc, run_hmc_dual_averaging,
)
