"""HMC adaptation: diagonal mass-matrix conditioning and dual-averaging
step-size adaptation.

Mass-matrix variant re-designs the reference `hmc_test_conditioning`
(ref: main_sampling.py:776-894): per-leapfrog Welford variance of trajectory
positions -> variance RANKS normalized to scores in [-1, 1] ->
M_diag = exp(k * scores) (:855-867), with the variant's schedule (burn
epochs at sigma_0 + 0.9, cubic anneal, total burn + epochs + 4*sampling).

Dual averaging (Nesterov/Hoffman-Gelman, the NUTS step-size adapter) is a
new capability targeting a desired acceptance rate — the reference only has
the multiplicative 0.95 backoff. Cross-chain acceptance statistics are
averaged with `pmean` when run under shard_map (parallel/chains.py).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from .engine import LossFn, leapfrog_propose


# --- dual averaging ---------------------------------------------------------

class DualAveragingState(struct.PyTreeNode):
    log_eps: jnp.ndarray
    log_eps_avg: jnp.ndarray
    h_sum: jnp.ndarray
    mu: jnp.ndarray
    t: jnp.ndarray

    @classmethod
    def create(cls, eps0: float):
        return cls(
            log_eps=jnp.asarray(math.log(eps0)),
            log_eps_avg=jnp.asarray(math.log(eps0)),
            h_sum=jnp.asarray(0.0),
            mu=jnp.asarray(math.log(10.0 * eps0)),
            t=jnp.asarray(0, jnp.int32),
        )


def dual_averaging_update(state: DualAveragingState, accept_prob,
                          target: float = 0.65, gamma: float = 0.05,
                          t0: float = 10.0, kappa: float = 0.75):
    """One Hoffman-Gelman dual-averaging step toward `target` acceptance."""
    t = state.t + 1
    tf = t.astype(jnp.float32)
    h_sum = state.h_sum + (target - accept_prob)
    log_eps = state.mu - jnp.sqrt(tf) / gamma * h_sum / (tf + t0)
    w = tf ** (-kappa)
    log_eps_avg = w * log_eps + (1 - w) * state.log_eps_avg
    return state.replace(log_eps=log_eps, log_eps_avg=log_eps_avg,
                         h_sum=h_sum, t=t)


def run_hmc_dual_averaging(
    loss_fn,
    cfg,
    states,
    target_accept: float = 0.65,
    axis_name: Optional[str] = None,
):
    """Lockstep multi-chain HMC with SHARED dual-averaged step size.

    All chains attempt proposals in lockstep (a fori_loop over
    cfg.max_attempts); after each round the mean acceptance probability —
    `pmean`ed over `axis_name` when running under shard_map across devices —
    drives one dual-averaging update of a shared epsilon. The adapted step
    size replaces the reference's multiplicative backoff during annealing
    and freezes once chains enter the sampling phase. Lockstep execution is
    also the TPU-efficient shape: a vmapped while_loop runs until the
    slowest chain finishes anyway.

    Returns (states, da_state).
    """
    from .engine import hmc_attempt

    da0 = DualAveragingState.create(cfg.epsilon)

    def round_fn(carry):
        states, da, i = carry
        eps_shared = jnp.exp(da.log_eps)
        # apply the shared step size to chains still annealing
        in_anneal = states.epoch < cfg.epochs
        states = states.replace(
            epsilon=jnp.where(in_anneal, eps_shared, states.epsilon)
        )
        prev_epoch = states.epoch
        new_states = jax.vmap(lambda s: hmc_attempt(loss_fn, cfg, s))(states)
        accepted = (new_states.epoch > prev_epoch).astype(jnp.float32)
        # only count chains that are still running
        running = (prev_epoch < cfg.total_epochs).astype(jnp.float32)
        n_running = jnp.sum(running)
        acc = jnp.sum(accepted * running) / jnp.maximum(n_running, 1.0)
        if axis_name is not None:
            acc = jax.lax.pmean(acc, axis_name)
            n_running = jax.lax.psum(n_running, axis_name)
        # no DA update on rounds where every chain already finished —
        # their 0-acceptance reading would collapse the step size
        new_da = dual_averaging_update(da, acc, target=target_accept)
        da = jax.tree.map(
            lambda n, o: jnp.where(n_running > 0, n, o), new_da, da
        )
        # freeze finished chains
        done = prev_epoch >= cfg.total_epochs
        states = jax.tree.map(
            lambda new, old: jnp.where(
                done.reshape((-1,) + (1,) * (new.ndim - 1)), old, new
            ),
            new_states, states,
        )
        return states, da, i + 1

    def cond(carry):
        states, _, i = carry
        running = jnp.any(states.epoch < cfg.total_epochs)
        if axis_name is not None:
            # all devices must agree on the trip count (the body pmean is
            # a collective): exit only when EVERY device's chains finished
            running = jax.lax.psum(
                running.astype(jnp.int32), axis_name) > 0
        return (i < cfg.max_attempts) & running

    states, da, _ = jax.lax.while_loop(
        cond, round_fn, (states, da0, jnp.asarray(0, jnp.int32))
    )
    return states, da


# --- mass-conditioned HMC ---------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ConditionedHMCConfig:
    """hmc_test_conditioning hyperparameters (ref: main_sampling.py:776-816)."""

    sigma_0: float = 0.1
    tau: float = 1.0
    epsilon: float = 0.05
    burn: int = 5
    epochs: int = 40
    sampling: int = 10
    anneal_scale: float = 0.9
    anneal_power: float = 3.0
    post_tau: float = 0.1
    post_epsilon: float = 0.01
    backoff: float = 0.95
    mass_k: float = 1.0  # the exponent scale k in exp(k * scores) (:863-865)
    max_attempts: int = 1000

    @property
    def n_leapfrog(self) -> int:
        return max(1, math.floor(self.tau / self.epsilon))

    @property
    def total_epochs(self) -> int:
        return self.burn + self.epochs + 4 * self.sampling


class ConditionedChainState(struct.PyTreeNode):
    x: jnp.ndarray
    key: jnp.ndarray
    epoch: jnp.ndarray
    tau: jnp.ndarray
    epsilon: jnp.ndarray
    rejected: jnp.ndarray
    attempts: jnp.ndarray
    accepted: jnp.ndarray
    mass_diag: jnp.ndarray  # flattened-shape diagonal metric
    samples: jnp.ndarray
    last_decoded: jnp.ndarray


def init_conditioned_chain(key, cfg: ConditionedHMCConfig, x_shape,
                           decoded_shape=None):
    decoded_shape = decoded_shape or x_shape
    kx, key = jax.random.split(key)
    return ConditionedChainState(
        x=jax.random.normal(kx, x_shape, jnp.float32),
        key=key,
        epoch=jnp.asarray(0, jnp.int32),
        tau=jnp.asarray(cfg.tau, jnp.float32),
        epsilon=jnp.asarray(cfg.epsilon, jnp.float32),
        rejected=jnp.asarray(0, jnp.int32),
        attempts=jnp.asarray(0, jnp.int32),
        accepted=jnp.asarray(0, jnp.int32),
        mass_diag=jnp.ones(x_shape, jnp.float32),
        samples=jnp.zeros((max(cfg.sampling * 3, 1),) + tuple(decoded_shape),
                          jnp.float32),
        last_decoded=jnp.zeros(decoded_shape, jnp.float32),
    )


def _rank_scores(variance: jnp.ndarray) -> jnp.ndarray:
    """Variance ranks normalized to [-1, 1] (ref: main_sampling.py:856-862)."""
    flat = variance.reshape(-1)
    order = jnp.argsort(flat)
    n = flat.shape[0]
    ranks = jnp.zeros(n, jnp.float32).at[order].set(
        jnp.arange(n, dtype=jnp.float32)
    )
    return (2.0 * ranks / (n - 1) - 1.0).reshape(variance.shape)


def _sigma_y(cfg: ConditionedHMCConfig, epoch):
    e = epoch.astype(jnp.float32)
    in_burn = epoch < cfg.burn
    annealed = cfg.sigma_0 + cfg.anneal_scale * (
        1.0 - (e - cfg.burn) / cfg.epochs
    ) ** cfg.anneal_power
    out = jnp.where(in_burn, cfg.sigma_0 + cfg.anneal_scale, annealed)
    return jnp.where(epoch >= cfg.epochs, cfg.sigma_0, out)


def conditioned_attempt(loss_fn: LossFn, cfg: ConditionedHMCConfig,
                        state: ConditionedChainState) -> ConditionedChainState:
    key, k_prop = jax.random.split(state.key)
    sigma_y = _sigma_y(cfg, state.epoch)
    switch = (state.epoch >= cfg.epochs) & (state.tau > cfg.post_tau)
    tau = jnp.where(switch, cfg.post_tau, state.tau)
    eps = jnp.where(switch, cfg.post_epsilon, state.epsilon)

    accept, xp, dec, loss, _, (mean, m2) = leapfrog_propose(
        loss_fn, state.x, sigma_y, eps, cfg.n_leapfrog, key=k_prop,
        mass_diag=state.mass_diag, collect_welford=True,
    )

    # mass adaptation on accepted proposals past epochs//3 (ref: :854-867)
    do_adapt = accept & (state.epoch > cfg.epochs // 3)
    variance = m2 / jnp.maximum(cfg.n_leapfrog - 1, 1)
    new_mass = jnp.exp(cfg.mass_k * _rank_scores(variance))
    mass_diag = jnp.where(do_adapt, new_mass, state.mass_diag)

    sample_start = cfg.epochs + cfg.sampling
    sample_idx = state.epoch - sample_start
    nbuf = state.samples.shape[0]
    write = accept & (sample_idx >= 0)
    idx = jnp.clip(sample_idx, 0, nbuf - 1)
    samples = jax.lax.cond(
        write,
        lambda s: jax.lax.dynamic_update_slice(
            s, dec[None], (idx,) + (0,) * dec.ndim),
        lambda s: s,
        state.samples,
    )

    rejected = state.rejected + 1
    do_backoff = rejected >= 2
    tau_r = jnp.where(do_backoff, tau * cfg.backoff, tau)
    eps_r = jnp.where(do_backoff, eps * cfg.backoff, eps)

    return state.replace(
        x=jnp.where(accept, xp, state.x),
        key=key,
        epoch=state.epoch + accept.astype(jnp.int32),
        tau=jnp.where(accept, tau, tau_r),
        epsilon=jnp.where(accept, eps, eps_r),
        rejected=jnp.where(accept, 0, rejected),
        attempts=state.attempts + 1,
        accepted=state.accepted + accept.astype(jnp.int32),
        mass_diag=mass_diag,
        samples=samples,
        last_decoded=jnp.where(accept, dec, state.last_decoded),
    )


def run_conditioned_chain(loss_fn: LossFn, cfg: ConditionedHMCConfig,
                          state: ConditionedChainState):
    def cond(s):
        return (s.epoch < cfg.total_epochs) & (s.attempts < cfg.max_attempts)

    return jax.lax.while_loop(
        cond, lambda s: conditioned_attempt(loss_fn, cfg, s), state
    )


def run_conditioned_hmc(loss_fn: LossFn, cfg: ConditionedHMCConfig, states):
    return jax.vmap(lambda s: run_conditioned_chain(loss_fn, cfg, s))(states)


def init_conditioned_chains(key, cfg, n_chains, x_shape, decoded_shape=None):
    keys = jax.random.split(key, n_chains)
    return jax.vmap(
        lambda k: init_conditioned_chain(k, cfg, x_shape, decoded_shape)
    )(keys)
