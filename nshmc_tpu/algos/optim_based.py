"""Optimization-in-the-loop samplers: DiffPIR and DAPS.

Re-designs of the reference plugins:
  DiffPIR (ref: algos/diffpir.py:6-53) — 50 schedule-free-AdamW proximal
    steps per outer DDIM step on ||H(xhat)-y||^2 + rho_t ||xhat - x0||^2
  DAPS    (ref: algos/daps.py:13-96)  — probability-flow ODE sub-solver
    (order-5 step subdivision) followed by N=100 Langevin steps on the
    data-consistency posterior

Inner loops are lax.fori_loop/lax.scan; DAPS runs as its own sampler
(`run_daps`) because its inner ODE ladder depends on the (statically known)
outer timestep.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from .base import Algo, ModelFn, predict_eps, predict_x0
from ..schedules import DiffusionSchedule, DDIMSequence
from ..solvers.sf_adamw import sf_adamw_init, sf_adamw_step


class DiffPIR(Algo):
    """Plug-and-play prior with inner proximal solve (ref: algos/diffpir.py)."""

    lam: float = struct.field(pytree_node=False, default=7.0)
    eta: float = struct.field(pytree_node=False, default=0.85)
    lr: float = struct.field(pytree_node=False, default=0.1)
    inner_steps: int = struct.field(pytree_node=False, default=50)

    def cal_x0(self, model_fn, xt, state, t, at, at_next, y0, key):
        op = self.operator
        et = predict_eps(model_fn, xt, t)
        x0 = predict_x0(xt, et, at)
        sigma_bar_sq = jnp.maximum((1 - at) / at, 1e-8)
        rho_t = self.lam * self.sigma_0**2 / sigma_bar_sq

        def inner_loss(xhat):
            return (
                jnp.sum((op.H_img(xhat) - y0) ** 2)
                + rho_t * jnp.sum((xhat - x0) ** 2)
            )

        def body(i, carry):
            xhat, opt_state = carry
            g = jax.grad(inner_loss)(xhat)
            xhat, opt_state = sf_adamw_step(xhat, g, opt_state, lr=self.lr)
            return xhat, opt_state

        xhat, _ = jax.lax.fori_loop(
            0, self.inner_steps, body, (x0, sf_adamw_init(x0))
        )
        et_new = xt / jnp.sqrt(1 - at)
        add_up = jnp.sqrt(1 - at_next) * (
            jnp.sqrt(1 - self.eta**2) * et_new
            + self.eta * jax.random.normal(key, x0.shape)
        )
        return xhat, add_up, state

    def map_back(self, x0_t, y0, add_up, at_next, at):
        # extra correction term (ref: diffpir.py:49-51)
        return (
            jnp.sqrt(at_next) * x0_t
            + add_up
            - jnp.sqrt(at) * x0_t / jnp.sqrt(1 - at)
            * jnp.sqrt(1 - at_next) * jnp.sqrt(1 - self.eta**2)
        )


class DAPS(Algo):
    """Decoupled annealed posterior sampling (ref: algos/daps.py)."""

    eta0: float = struct.field(pytree_node=False, default=1e-4)
    delta: float = struct.field(pytree_node=False, default=1e-2)
    order: int = struct.field(pytree_node=False, default=5)
    nonlinear: bool = struct.field(pytree_node=False, default=False)
    langevin_steps: int = struct.field(pytree_node=False, default=100)
    langevin_sigma: float = struct.field(pytree_node=False, default=0.02)

    def ode(self, model_fn, schedule: DiffusionSchedule, xt, t: int):
        """Probability-flow ODE from t to 0 with order-1 subdivision into
        `order - 1` segments (ref: daps.py:23-56). `t` is a static int."""
        skip = t // (self.order - 1)
        seq = list(range(0, t, skip)) if skip > 0 else [0]
        seq = seq[1:] + [t]
        seq_next = [-1] + seq[:-1]
        for i, j in zip(reversed(seq), reversed(seq_next)):
            at = schedule.alpha_bar(jnp.asarray(i))
            at_next = schedule.alpha_bar(jnp.asarray(j))
            et = predict_eps(model_fn, xt, float(i))
            x0 = predict_x0(xt, et, at)
            xt = jnp.sqrt(at_next) * x0 + jnp.sqrt(1 - at_next) * et
        return xt

    def langevin(self, x0, y0, eta, at, key):
        """N unadjusted Langevin steps on the data-consistency posterior
        (ref: daps.py:57-80)."""
        op = self.operator
        rt = jnp.maximum(jnp.sqrt(1 - at), 1e-4)
        sigma_0 = self.langevin_sigma

        if self.sigma_0 == 0 and not self.nonlinear:
            def loss_fn(x):
                return jnp.sum((op.H_img(x) - y0) ** 2) / eta / 2.0
        else:
            def loss_fn(x):
                return (
                    jnp.sum((x - x0) ** 2) / (2 * rt**2)
                    + jnp.sum((op.H_img(x) - y0) ** 2) / (2 * sigma_0**2)
                )

        def body(carry, k):
            x, = carry
            g = jax.grad(loss_fn)(x)
            noise = jax.random.normal(k, x.shape)
            x = x - eta * g + jnp.sqrt(2 * eta) * noise
            return (x,), None

        keys = jax.random.split(key, self.langevin_steps)
        (x,), _ = jax.lax.scan(body, (x0,), keys)
        return x


def run_daps(
    model_fn: ModelFn,
    schedule: DiffusionSchedule,
    seq: DDIMSequence,
    algo: DAPS,
    xt: jnp.ndarray,
    y0: jnp.ndarray,
    key: jnp.ndarray,
    num_timesteps: int = 1000,
) -> jnp.ndarray:
    """DAPS outer loop (statically unrolled over the DDIM ladder; the inner
    ODE ladder depends on the outer timestep)."""
    for t, t_next in zip(reversed(seq.seq), reversed(seq.seq_next)):
        key, k_lan, k_noise = jax.random.split(key, 3)
        at = schedule.alpha_bar(jnp.asarray(t))
        at_next = schedule.alpha_bar(jnp.asarray(t_next))
        x0 = algo.ode(model_fn, schedule, xt, int(t))
        eta = algo.eta0 * (algo.delta + t / num_timesteps * (1 - algo.delta))
        x0 = algo.langevin(x0, y0, eta, at, k_lan)
        add_up = jnp.sqrt(1 - at_next) * jax.random.normal(k_noise, x0.shape)
        xt = jnp.sqrt(at_next) * x0 + add_up
    return xt
