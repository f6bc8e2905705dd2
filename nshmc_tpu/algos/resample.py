"""ReSample: latent posterior sampling with hard data consistency.

Re-design of the reference plugin (ref: algos/resample.py:7-108): a latent
DPS step every timestep (cal_x0_dps :69-101, guidance through the
differentiable VQ decoder with an extra 0.2 factor), plus — every 20th
timestep at or below t=200 — a hard data-consistency solve (300 AdamW steps
on ||H(decode(x0_hat)) - y0||^2, :37-44) followed by a stochastic resample
toward the optimized latent (:45-56, :58-66).

The timestep-dependent branch spans cal_x0 AND map_back in the reference,
so this overrides `step` and uses lax.cond on the traced timestep.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .base import Algo, predict_eps, predict_x0


class ReSample(Algo):
    decode_fn: Callable = struct.field(pytree_node=False, default=None)
    gamma: float = struct.field(pytree_node=False, default=40.0)
    eta: float = struct.field(pytree_node=False, default=0.85)
    lam: float = struct.field(pytree_node=False, default=1.0)
    inner_steps: int = struct.field(pytree_node=False, default=300)
    inner_lr: float = struct.field(pytree_node=False, default=5e-3)

    def _dps_step(self, model_fn, xt, t, at, at_next, y0, key):
        """Latent DPS with decoder-through gradient (ref: resample.py:69-108)."""

        def loss_fn(xt_in):
            et = predict_eps(model_fn, xt_in, t)
            x0 = predict_x0(xt_in, et, at)
            r = y0 - self.operator.H_img(self.decode_fn(x0))
            return jnp.sum(r**2), (et, x0)

        (loss, (et, x0)), grad = jax.value_and_grad(loss_fn, has_aux=True)(xt)
        if self.noise == "ddpm":
            c1 = self.eta * jnp.sqrt((1 - at / at_next) * (1 - at_next) / (1 - at))
        else:
            c1 = jnp.asarray(0.0)
        c2 = jnp.sqrt(1 - at_next - c1**2)
        add_up = c1 * jax.random.normal(key, x0.shape) + c2 * et
        x0 = x0 - 0.2 * grad * self.lam / (jnp.sqrt(at_next) * jnp.sqrt(loss))
        return jnp.sqrt(at_next) * x0 + add_up

    def _hard_consistency(self, model_fn, xt, xt_dps, t, at, at_next, y0, key):
        """Data-consistency solve + stochastic resample (ref: resample.py:20-66)."""
        et = predict_eps(model_fn, xt, t)
        x0 = predict_x0(xt, et, at)

        # torch.optim.AdamW default weight_decay=0.01 (ref: resample.py:39)
        opt = optax.adamw(self.inner_lr, weight_decay=0.01)

        def inner_loss(x0h):
            pred = self.operator.H_img(self.decode_fn(x0h))
            return jnp.mean((pred - y0) ** 2)

        def body(i, carry):
            x0h, opt_state = carry
            g = jax.grad(inner_loss)(x0h)
            updates, opt_state = opt.update(g, opt_state, x0h)
            return optax.apply_updates(x0h, updates), opt_state

        x0_hat, _ = jax.lax.fori_loop(
            0, self.inner_steps, body, (x0, opt.init(x0))
        )

        sigma_t_sq = self.gamma * (1 - at_next) / at * (1 - at / at_next)
        var = sigma_t_sq * (1 - at_next) / (sigma_t_sq + 1 - at_next)
        mean = (1 - at_next) * xt_dps / (sigma_t_sq + 1 - at_next)
        add_up = mean + jnp.sqrt(jnp.maximum(var, 0.0)) * jax.random.normal(
            key, xt.shape
        )
        xt_next = jnp.where(
            sigma_t_sq > 0,
            sigma_t_sq * jnp.sqrt(at_next) * x0_hat / (sigma_t_sq + 1 - at_next)
            + add_up,
            x0_hat,
        )
        return xt_next

    def step(self, model_fn, xt, state, t, at, at_next, y0, key):
        k1, k2 = jax.random.split(key)
        xt_dps = self._dps_step(model_fn, xt, t, at, at_next, y0, k1)
        do_resample = (t % 20 == 0) & (t <= 200)
        xt_next = jax.lax.cond(
            do_resample,
            lambda: self._hard_consistency(
                model_fn, xt, xt_dps, t, at, at_next, y0, k2),
            lambda: xt_dps,
        )
        return xt_next, state
