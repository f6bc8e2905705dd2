"""Noise-space HMC engine.

TPU-native re-design of the reference sampler (ref: main_sampling.py:660-774
`hmc`; latent variant main_sampling_latent.py:623-762 `hmc_latent`):
the leapfrog integrator is a `lax.scan`, the accept/reject + annealing +
step-size-backoff control flow is a `lax.while_loop` over a chain-state
pytree, and the whole sampler is one jitted program per chain, `vmap`ed over
chains (and shard_mapped across devices by parallel/chains.py).

Semantics matched to the reference:
  - epoch = ACCEPTED-proposal count; rejected proposals retry the same epoch
    (the reference's `while` + `continue`, main_sampling.py:681,727,749)
  - measurement-noise annealing sigma_y = sigma_0 + 1.6*(1 - e/E)^2 during
    the first `epochs` epochs, then sigma_0 (main_sampling.py:683-689)
  - at e == epochs, (tau, eps) switch to (0.1, 0.01) once (:686-689)
  - after 2 consecutive rejections, tau and eps decay by 0.95 (and keep
    decaying each further rejection — the reference never resets the
    counter; the latent variant decays by 0.9 and resets, :743-749 vs
    main_sampling_latent.py:735-741)
  - L = floor(tau_0/epsilon_0) leapfrog steps, computed ONCE up front
    (main_sampling.py:664) — later tau/eps changes alter only the step size
  - potential U = ||x||^2/2 + ||y0 - H(decode(x))||^2 / (2 sigma_y^2);
    kinetic = ||p||^2 / (2 m)  (main_sampling.py:697)
  - the stored sample for an accepted proposal is the DECODED image from the
    proposal's last energy evaluation (main_sampling.py:724-726)

Documented improvement over the reference: the MH accept is PER-CHAIN (the
reference draws one scalar coin for the whole batch, main_sampling.py:719-720,
which couples chains; parity runs use 1 chain).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@dataclasses.dataclass(frozen=True)
class HMCConfig:
    """Static sampler hyperparameters (reference defaults)."""

    sigma_0: float = 0.1  # measurement noise (already x2-scaled by caller)
    tau: float = 1.0
    epsilon: float = 0.05
    m: float = 1.0  # momentum mass (opt.m)
    epochs: int = 60  # annealing epochs
    sampling: int = 20  # burn-in = sampling, then `sampling` kept samples
    anneal_scale: float = 1.6
    anneal_power: float = 2.0
    post_tau: float = 0.1
    post_epsilon: float = 0.01
    backoff: float = 0.95
    reset_rejected_after_backoff: bool = False
    max_attempts: int = 1000

    @property
    def n_leapfrog(self) -> int:
        return max(1, math.floor(self.tau / self.epsilon))

    @property
    def total_epochs(self) -> int:
        return self.epochs + 2 * self.sampling


class ChainState(struct.PyTreeNode):
    """Per-chain sampler state (a pytree; leading axis over chains after
    vmap). Shapes: x (H, W, C) or latent (h, w, c); samples (S, H, W, C)."""

    x: jnp.ndarray
    key: jnp.ndarray
    epoch: jnp.ndarray  # int32, accepted count
    tau: jnp.ndarray
    epsilon: jnp.ndarray
    rejected: jnp.ndarray  # int32, consecutive rejections
    attempts: jnp.ndarray  # int32
    accepted: jnp.ndarray  # int32 (== epoch, kept for clarity in stats)
    samples: jnp.ndarray  # (sampling, *decoded_shape)
    last_decoded: jnp.ndarray  # decoded image of last accepted proposal
    last_loss: jnp.ndarray  # data-fit loss at last accepted proposal
    sigma_y: jnp.ndarray  # current annealed measurement sigma


def init_chain_state(key, cfg: HMCConfig, x_shape, decoded_shape=None):
    """Fresh chain: x_T ~ N(0, I) (ref: main_sampling.py:460-466)."""
    decoded_shape = decoded_shape or x_shape
    kx, key = jax.random.split(key)
    return ChainState(
        x=jax.random.normal(kx, x_shape, jnp.float32),
        key=key,
        epoch=jnp.asarray(0, jnp.int32),
        tau=jnp.asarray(cfg.tau, jnp.float32),
        epsilon=jnp.asarray(cfg.epsilon, jnp.float32),
        rejected=jnp.asarray(0, jnp.int32),
        attempts=jnp.asarray(0, jnp.int32),
        accepted=jnp.asarray(0, jnp.int32),
        samples=jnp.zeros((cfg.sampling,) + tuple(decoded_shape), jnp.float32),
        last_decoded=jnp.zeros(decoded_shape, jnp.float32),
        last_loss=jnp.asarray(jnp.inf, jnp.float32),
        sigma_y=jnp.asarray(cfg.sigma_0 + cfg.anneal_scale, jnp.float32),
    )


LossFn = Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]
# loss_fn(x) -> (data_loss, decoded_image); differentiable in x.


def make_pixel_loss_fn(decode, operator, y0) -> LossFn:
    """U_data(x) = ||y0 - H(decode(x))||^2 for a single chain
    (ref: main_sampling.py:693-694). y0: (d_y,)."""

    def loss_fn(x):
        x0 = decode(x[None])
        residual = y0 - operator.H_img(x0)[0]
        return jnp.sum(residual**2), x0[0]

    return loss_fn


def _sigma_y(cfg: HMCConfig, epoch):
    e = epoch.astype(jnp.float32)
    annealed = cfg.sigma_0 + cfg.anneal_scale * (
        1.0 - e / cfg.epochs
    ) ** cfg.anneal_power
    return jnp.where(epoch < cfg.epochs, annealed, cfg.sigma_0)


def leapfrog_propose(
    loss_fn: LossFn,
    x: jnp.ndarray,
    sigma_y,
    eps,
    n_leapfrog: int,
    m: float = 1.0,
    key=None,
    mass_diag: Optional[jnp.ndarray] = None,
    collect_welford: bool = False,
):
    """One leapfrog trajectory + MH decision for a single chain.

    Returns (accept, xp, dec, loss, log_ratio[, (mean, m2)]): the proposal,
    the decoded image and data-loss from its last energy evaluation, the MH
    log-ratio, and (with collect_welford) the Welford running mean/M2 of the
    trajectory positions for mass-matrix adaptation
    (ref: main_sampling.py:842-846). Integrator and Hamiltonian exactly
    mirror main_sampling.py:692-720 (half-step, L full steps, half-step
    correction); with `mass_diag` the kinetic energy and position updates
    use the diagonal metric of hmc_test_conditioning (:819-850). NaN
    energies reject.
    """
    vg = jax.value_and_grad(loss_fn, has_aux=True)
    k_mom, k_acc = jax.random.split(key)
    inv2s2 = 1.0 / (2.0 * sigma_y**2)
    mass = mass_diag if mass_diag is not None else jnp.asarray(m, x.dtype)
    inv_mass = 1.0 / mass

    def kinetic(p):
        return 0.5 * jnp.sum(inv_mass * p**2)

    p0 = jax.random.normal(k_mom, x.shape, x.dtype) * jnp.sqrt(mass)
    (loss0, dec0), grad0 = vg(x)
    h0 = 0.5 * jnp.sum(x**2) + inv2s2 * loss0 + kinetic(p0)

    # first momentum half-step (ref: main_sampling.py:702)
    p = p0 - (eps / 2.0) * (x + inv2s2 * grad0)

    def leapfrog(carry, l):
        xp, p, _, _, _, mean, m2 = carry
        xp = xp + eps * inv_mass * p
        (loss, dec), grad = vg(xp)
        p = p - eps * (xp + inv2s2 * grad)
        if collect_welford:
            delta = xp - mean
            mean = mean + delta / (l + 1).astype(x.dtype)
            m2 = m2 + delta * (xp - mean)
        return (xp, p, loss, dec, grad, mean, m2), None

    zeros = jnp.zeros_like(x)
    init = (x, p, loss0, dec0, grad0, zeros, zeros)
    (xp, p, loss, dec, grad, mean, m2), _ = jax.lax.scan(
        leapfrog, init, jnp.arange(n_leapfrog), length=n_leapfrog
    )
    # undo the half-over-step of the final iteration (ref: :715)
    p = p + (eps / 2.0) * (xp + inv2s2 * grad)

    h1 = 0.5 * jnp.sum(xp**2) + inv2s2 * loss + kinetic(p)
    log_ratio = -(h1 - h0)
    u = jax.random.uniform(k_acc)
    accept = (jnp.log(u) < jnp.minimum(log_ratio, 0.0)) & jnp.isfinite(log_ratio)
    if collect_welford:
        return accept, xp, dec, loss, log_ratio, (mean, m2)
    return accept, xp, dec, loss, log_ratio


def hmc_attempt(loss_fn: LossFn, cfg: HMCConfig, state: ChainState) -> ChainState:
    """One proposal: leapfrog trajectory + per-chain MH accept."""
    key, k_prop = jax.random.split(state.key)

    sigma_y = _sigma_y(cfg, state.epoch)
    switch = (state.epoch >= cfg.epochs) & (state.tau > cfg.post_tau)
    tau = jnp.where(switch, cfg.post_tau, state.tau)
    eps = jnp.where(switch, cfg.post_epsilon, state.epsilon)

    x = state.x
    accept, xp, dec, loss, _ = leapfrog_propose(
        loss_fn, x, sigma_y, eps, cfg.n_leapfrog, cfg.m, k_prop
    )

    # --- accepted branch values --------------------------------------------
    if cfg.sampling > 0:
        sample_idx = state.epoch - (cfg.epochs + cfg.sampling)
        write_sample = accept & (sample_idx >= 0)
        idx = jnp.clip(sample_idx, 0, cfg.sampling - 1)
        new_samples = jax.lax.cond(
            write_sample,
            lambda s: jax.lax.dynamic_update_slice(
                s, dec[None], (idx,) + (0,) * dec.ndim
            ),
            lambda s: s,
            state.samples,
        )
    else:
        new_samples = state.samples

    # --- rejected branch values --------------------------------------------
    rejected = state.rejected + 1
    do_backoff = rejected >= 2
    tau_r = jnp.where(do_backoff, tau * cfg.backoff, tau)
    eps_r = jnp.where(do_backoff, eps * cfg.backoff, eps)
    rejected = jnp.where(
        do_backoff & cfg.reset_rejected_after_backoff,
        0,
        rejected,
    )

    return state.replace(
        x=jnp.where(accept, xp, x),
        key=key,
        epoch=state.epoch + accept.astype(jnp.int32),
        tau=jnp.where(accept, tau, tau_r),
        epsilon=jnp.where(accept, eps, eps_r),
        rejected=jnp.where(accept, 0, rejected),
        attempts=state.attempts + 1,
        accepted=state.accepted + accept.astype(jnp.int32),
        samples=new_samples,
        last_decoded=jnp.where(accept, dec, state.last_decoded),
        last_loss=jnp.where(accept, loss, state.last_loss),
        sigma_y=sigma_y,
    )


def run_chain(loss_fn: LossFn, cfg: HMCConfig, state: ChainState) -> ChainState:
    """Run one chain to completion under lax.while_loop (accepted-count
    semantics with a max_attempts safety bound)."""

    def cond(s):
        return (s.epoch < cfg.total_epochs) & (s.attempts < cfg.max_attempts)

    return jax.lax.while_loop(cond, lambda s: hmc_attempt(loss_fn, cfg, s), state)


def run_hmc(
    loss_fn: LossFn,
    cfg: HMCConfig,
    states: ChainState,
) -> ChainState:
    """vmapped multi-chain HMC; `states` has a leading chain axis. Each chain
    draws its own momentum/accept randomness and accepts independently."""
    return jax.vmap(lambda s: run_chain(loss_fn, cfg, s))(states)


def init_chains(key, cfg: HMCConfig, n_chains: int, x_shape, decoded_shape=None):
    keys = jax.random.split(key, n_chains)
    return jax.vmap(
        lambda k: init_chain_state(k, cfg, x_shape, decoded_shape)
    )(keys)


def run_hmc_multi(loss_fn_builder, cfg: HMCConfig, states: ChainState, y0s):
    """Images x chains vectorization: `states` has leading axes
    (n_images, n_chains, ...), `y0s` is (n_images, d_y). Each image gets its
    own measurement via loss_fn_builder(y0) -> loss_fn; chains within an
    image share it. One jitted program covers the whole batch — the
    throughput-serving shape the reference's one-image-at-a-time driver
    cannot express."""

    def per_image(states_i, y0_i):
        return run_hmc(loss_fn_builder(y0_i), cfg, states_i)

    return jax.vmap(per_image)(states, y0s)


def _attempt_chains(attempt_one, states, chain_chunk: int):
    """vmap `attempt_one` over the chain axis, optionally serving chains in
    sequential waves of `chain_chunk` via lax.map (chunked-chain serving:
    bounds the activation high-water mark to one wave while keeping the
    whole chain population in one device program)."""
    n = jax.tree.leaves(states)[0].shape[0]
    if chain_chunk <= 0 or n <= chain_chunk:
        return jax.vmap(attempt_one)(states)
    if n % chain_chunk != 0:
        raise ValueError(
            f"chain count {n} not divisible by chain_chunk {chain_chunk}")
    w = n // chain_chunk
    waves = jax.tree.map(
        lambda a: a.reshape((w, chain_chunk) + a.shape[1:]), states)
    out = jax.lax.map(lambda sw: jax.vmap(attempt_one)(sw), waves)
    return jax.tree.map(
        lambda a: a.reshape((n,) + a.shape[2:]), out)


def run_hmc_observed(
    loss_fn: LossFn,
    cfg: HMCConfig,
    states: ChainState,
    callback=None,
    checkpoint_dir: str = "",
    checkpoint_every: int = 10,
    loss_builder=None,
    loss_args=(),
    attempts_per_round: int = 1,
    chain_chunk: int = 0,
):
    """Host-observed multi-chain HMC: a Python loop over jitted lockstep
    attempt rounds, invoking `callback(states, round)` after each round (for
    per-epoch progress prints mirroring main_sampling.py:733-742) and
    snapshotting chain state every `checkpoint_every` rounds (resume
    supported). Slower than `run_hmc` (one host sync per round) — use for
    interactive runs; the jitted driver for production.

    With `loss_builder`/`loss_args`, the loss is rebuilt inside jit from
    explicit array arguments (`loss_builder(*loss_args) -> loss_fn`) so
    model weights are jit ARGUMENTS rather than closure constants — a
    closed-over weight pytree gets baked into the HLO as literals, which
    bloats the program shipped through remote-compile relays and the
    persistent-cache executable (`loss_fn` is ignored then).

    `attempts_per_round` > 1 fuses that many MH attempts into one device
    program (fori_loop), amortizing per-round dispatch + callback host
    syncs on tunneled chips (measured ~1.6x overhead at 1 attempt/round,
    RESULTS.md round 4). Chains that reach their epoch budget mid-program
    freeze in place (same masking the host loop applies between rounds),
    so sampler statistics are UNCHANGED; only the callback/checkpoint
    granularity coarsens.

    `chain_chunk` > 0 serves chains in sequential device waves of that
    size inside each program (lax.map over a (waves, chunk, ...) reshape):
    the memory high-water mark is one chunk's activations, so chain counts
    far past the vmap memory knee (e.g. the 64-chain phase-retrieval
    config, BASELINE.json #4) run on one chip. Statistics are unchanged —
    chains are independent; only device scheduling changes."""
    from ..utils.checkpointing import save_chain_state, load_chain_state

    apr = max(1, int(attempts_per_round))

    def one_attempt(lf, s):
        """One guarded attempt: completed chains pass through untouched.
        The freeze also bounds per-chain attempts at cfg.max_attempts
        (mirroring run_chain's while condition) so fused rounds with
        apr > 1 cannot push a never-converging chain past the attempt
        budget mid-program (ADVICE r4)."""
        s2 = hmc_attempt(lf, cfg, s)
        done = (s.epoch >= cfg.total_epochs) | (s.attempts >= cfg.max_attempts)
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
            start_round = int(jnp.max(states.attempts))

    rnd = start_round
    since_save = 0
    while rnd < cfg.max_attempts:
        if bool(jnp.all(states.epoch >= cfg.total_epochs)):
            break
        states = attempt(states)
        rnd += apr
        if callback is not None:
            callback(states, rnd - 1)
        # exact every-`checkpoint_every`-attempts cadence for all apr
        # values (ADVICE r4: the old (rnd//apr) % (every//apr) form drifted
        # when apr does not divide checkpoint_every)
        since_save += apr
        if checkpoint_dir and since_save >= checkpoint_every:
            save_chain_state(checkpoint_dir, states, step=0)
            since_save = 0
    if checkpoint_dir:
        save_chain_state(checkpoint_dir, states, step=0)
    return states
