"""Latent-space noise-space HMC.

Re-design of the reference `hmc_latent` (ref: main_sampling_latent.py:623-762).
Structural differences from the pixel sampler that this driver reproduces:
  - the epoch loop counts ATTEMPTS (a plain `for` with `continue`), not
    accepted proposals (:646)
  - sigma_y follows a GEOMETRIC schedule sigma_y0 * (sigma_0/sigma_y0)^(e/E),
    updated only ON ACCEPT during the anneal phase (:695); after the anneal
    phase every accept re-pins sigma_y = sigma_0 and (tau, eps) = (0.1, 0.01)
    (:706-708)
  - rejection backoff is x0.9 and RESETS the consecutive-rejection counter
    (:735-741)
  - the sample buffer keeps the last `keep_samples` accepted decoded images
    of the post-anneal phase (:760: final_img_list[-10:])

The loss decodes z_T through the latent DDIM ladder and the VQ decoder:
||y0 - H(decode_first_stage(ddim(z)))||^2, with the eps-net under
stop_gradient for parity with the reference's @torch.no_grad apply_model
(ldm/models/diffusion/ddpm.py:892) unless full_grad is enabled.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

from .engine import LossFn, leapfrog_propose


@dataclasses.dataclass(frozen=True)
class LatentHMCConfig:
    sigma_0: float = 0.1  # final measurement sigma (x2-scaled by caller)
    sigma_y0: float = 1.0  # geometric anneal start (opt.sigma_y)
    tau: float = 1.0
    epsilon: float = 0.05
    m: float = 1.0
    epochs: int = 50  # anneal attempts (ref :628)
    sampling: int = 10  # post-anneal: 2*sampling more attempts (ref :646)
    post_tau: float = 0.1
    post_epsilon: float = 0.01
    backoff: float = 0.9
    keep_samples: int = 10

    @property
    def n_leapfrog(self) -> int:
        import math

        return max(1, math.floor(self.tau / self.epsilon))

    @property
    def total_attempts(self) -> int:
        return self.epochs + 2 * self.sampling


class LatentChainState(struct.PyTreeNode):
    z: jnp.ndarray
    key: jnp.ndarray
    attempt: jnp.ndarray
    accepted: jnp.ndarray
    rejected: jnp.ndarray
    tau: jnp.ndarray
    epsilon: jnp.ndarray
    sigma_y: jnp.ndarray
    samples: jnp.ndarray  # (keep_samples, *latent_shape) ring of z0 latents
    n_kept: jnp.ndarray
    last_z0_accept: jnp.ndarray  # DDIM-decoded z0 of the last accept
    last_loss: jnp.ndarray
    last_log_ratio: jnp.ndarray  # MH log-ratio of the last proposal


def init_latent_chain(key, cfg: LatentHMCConfig, z_shape):
    kz, key = jax.random.split(key)
    z = jax.random.normal(kz, z_shape, jnp.float32)
    return LatentChainState(
        z=z,
        key=key,
        attempt=jnp.asarray(0, jnp.int32),
        accepted=jnp.asarray(0, jnp.int32),
        rejected=jnp.asarray(0, jnp.int32),
        tau=jnp.asarray(cfg.tau, jnp.float32),
        epsilon=jnp.asarray(cfg.epsilon, jnp.float32),
        sigma_y=jnp.asarray(cfg.sigma_y0, jnp.float32),
        samples=jnp.zeros((cfg.keep_samples,) + tuple(z_shape), jnp.float32),
        n_kept=jnp.asarray(0, jnp.int32),
        last_z0_accept=jnp.zeros(z_shape, jnp.float32),
        last_loss=jnp.asarray(jnp.inf, jnp.float32),
        last_log_ratio=jnp.asarray(0.0, jnp.float32),
    )


def latent_hmc_attempt(loss_fn: LossFn, cfg: LatentHMCConfig,
                       state: LatentChainState) -> LatentChainState:
    key, k_prop = jax.random.split(state.key)
    accept, zp, dec_z, loss, log_ratio = leapfrog_propose(
        loss_fn, state.z, state.sigma_y, state.epsilon, cfg.n_leapfrog,
        cfg.m, k_prop,
    )

    e = state.attempt.astype(jnp.float32)
    in_anneal = state.attempt < cfg.epochs
    # on accept during anneal: geometric sigma update (ref :695)
    sigma_anneal = cfg.sigma_y0 * (cfg.sigma_0 / cfg.sigma_y0) ** (e / cfg.epochs)
    sigma_post = jnp.asarray(cfg.sigma_0, jnp.float32)
    new_sigma = jnp.where(in_anneal, sigma_anneal, sigma_post)
    sigma_y = jnp.where(accept, new_sigma, state.sigma_y)
    # post-anneal accepts pin tau/eps (ref :706-708)
    pin = accept & ~in_anneal
    tau = jnp.where(pin, cfg.post_tau, state.tau)
    eps = jnp.where(pin, cfg.post_epsilon, state.epsilon)

    # sample bookkeeping: the reference appends the PREVIOUS accepted
    # DDIM-decoded latent x_accept = iterative_sampling(z_proposal) on
    # post-anneal accepts (:704-709, :760); we keep a ring of the last
    # `keep_samples` accepted z0 latents of the post-anneal phase
    keep = accept & ~in_anneal
    samples = jax.lax.cond(
        keep,
        lambda s: jnp.concatenate([s[1:], state.last_z0_accept[None]], axis=0),
        lambda s: s,
        state.samples,
    )
    n_kept = state.n_kept + keep.astype(jnp.int32)

    # rejection backoff x0.9 with counter reset (ref :735-741)
    rejected = state.rejected + 1
    do_backoff = rejected >= 2
    tau_r = jnp.where(do_backoff, tau * cfg.backoff, tau)
    eps_r = jnp.where(do_backoff, eps * cfg.backoff, eps)
    rejected = jnp.where(do_backoff, 0, rejected)

    return state.replace(
        z=jnp.where(accept, zp, state.z),
        key=key,
        attempt=state.attempt + 1,
        accepted=state.accepted + accept.astype(jnp.int32),
        rejected=jnp.where(accept, 0, rejected),
        tau=jnp.where(accept, tau, tau_r),
        epsilon=jnp.where(accept, eps, eps_r),
        sigma_y=sigma_y,
        samples=samples,
        n_kept=n_kept,
        last_z0_accept=jnp.where(accept, dec_z, state.last_z0_accept),
        last_loss=jnp.where(accept, loss, state.last_loss),
        last_log_ratio=log_ratio,
    )


def run_latent_chain(loss_fn: LossFn, cfg: LatentHMCConfig,
                     state: LatentChainState) -> LatentChainState:
    return jax.lax.fori_loop(
        0, cfg.total_attempts,
        lambda i, s: latent_hmc_attempt(loss_fn, cfg, s),
        state,
    )


def run_latent_hmc(loss_fn: LossFn, cfg: LatentHMCConfig,
                   states: LatentChainState) -> LatentChainState:
    return jax.vmap(lambda s: run_latent_chain(loss_fn, cfg, s))(states)


def run_latent_hmc_observed(
    loss_fn: LossFn,
    cfg: LatentHMCConfig,
    states: LatentChainState,
    callback=None,
    checkpoint_dir: str = "",
    checkpoint_every: int = 10,
    loss_builder=None,
    loss_args=(),
    attempts_per_round: int = 1,
    chain_chunk: int = 0,
) -> LatentChainState:
    """Host-observed latent HMC: a Python loop over jitted lockstep attempt
    rounds (one device call per attempt, ~L+1 energy evals each), invoking
    `callback(states, round)` after each round — mirrors the reference's
    per-attempt prints (main_sampling_latent.py:655-688) — and snapshotting
    chain state every `checkpoint_every` rounds for resume. Required on
    tunneled single-chip setups whose relay kills long device executions;
    on normal deployments prefer the jitted `run_latent_hmc`.

    `loss_builder`/`loss_args` (see engine.run_hmc_observed): rebuild the
    loss inside jit from explicit array args so the LDM weight pytrees
    (~1 GB fp32) are jit arguments, NOT closure constants baked into the
    HLO — the constants path overflowed the remote-compile relay's request
    limit (HTTP 413) on the tunneled chip.

    `chain_chunk` > 0: chunked-chain serving (sequential device waves of
    that size per attempt; see engine.run_hmc_observed)."""
    from ..utils.checkpointing import save_chain_state, load_chain_state
    from .engine import _attempt_chains

    apr = max(1, int(attempts_per_round))

    def one_attempt(lf, s):
        """One guarded attempt: chains past the fixed budget freeze."""
        s2 = latent_hmc_attempt(lf, cfg, s)
        done = s.attempt >= cfg.total_attempts
        return jax.tree.map(lambda new, old: jnp.where(done, old, new), s2, s)

    def round_fn(la, s):
        lf = loss_builder(*la) if loss_builder is not None else loss_fn

        def body(i, ss):
            return _attempt_chains(lambda si: one_attempt(lf, si), ss,
                                   chain_chunk)

        if apr == 1:
            return body(0, s)
        return jax.lax.fori_loop(0, apr, body, s)

    base = jax.jit(round_fn)
    attempt = lambda s: base(loss_args, s)

    start_round = 0
    if checkpoint_dir:
        restored = load_chain_state(checkpoint_dir, states, step=0)
        if restored is not None:
            states = jax.tree.map(jnp.asarray, restored)
            start_round = int(jnp.max(states.attempt))

    rnd = start_round
    since_save = 0
    while rnd < cfg.total_attempts:
        states = attempt(states)
        rnd += apr
        if callback is not None:
            callback(states, rnd - 1)
        # exact every-`checkpoint_every`-attempts cadence for all apr
        # values (ADVICE r4)
        since_save += apr
        if checkpoint_dir and since_save >= checkpoint_every:
            save_chain_state(checkpoint_dir, states, step=0)
            since_save = 0
    if checkpoint_dir:
        save_chain_state(checkpoint_dir, states, step=0)
    return states


def init_latent_chains(key, cfg: LatentHMCConfig, n_chains: int, z_shape):
    keys = jax.random.split(key, n_chains)
    return jax.vmap(lambda k: init_latent_chain(k, cfg, z_shape))(keys)


def make_latent_loss_fn(ddim_decode_z, decode_first_stage, operator, y0,
                        stop_eps_grad: bool = True) -> LossFn:
    """loss(z) = ||y0 - H(decode_first_stage(ddim(z)))||^2.

    With stop_eps_grad (the parity default), the eps-net inside the DDIM
    ladder is wrapped so its output is treated as constant w.r.t. z — the
    gradient flows only through the linear DDIM recombination and the VQ
    decoder, matching @torch.no_grad apply_model (ddpm.py:892-893) +
    differentiable_decode_first_stage (:766).

    NOTE: stop-gradient must be applied inside `ddim_decode_z` by the
    caller (it wraps the model fn); this builder only assembles the loss.
    """

    def loss_fn(z):
        z0 = ddim_decode_z(z[None])
        x0 = decode_first_stage(z0)
        residual = y0 - operator.H_img(x0)[0]
        return jnp.sum(residual**2), z0[0]

    return loss_fn
