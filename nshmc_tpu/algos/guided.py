"""Gradient/score-guided posterior samplers: DPS, PiGDM, DMPS, RED-diff.

Re-designs of the reference plugins (cites into /root/reference/algos/):
  DPS      (dps.py:4-48)     — likelihood-gradient guidance through the U-Net
  PiGDM    (pigdm.py:4-68)   — pseudo-inverse guidance with (HH^T+s^2)^-1
  DMPS     (dmps.py:4-42)    — closed-form pseudo-likelihood guidance
  RED-diff (reddiff.py:5-46) — variational regularization with carried state

Gradients through the score network use jax.grad on a scalar loss — the
reference's torch.autograd.grad equivalents — traced once inside the jitted
DDIM scan.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from .base import Algo, ModelFn, predict_eps, predict_x0


class DPS(Algo):
    """Diffusion posterior sampling (ref: algos/dps.py)."""

    lam: float = struct.field(pytree_node=False, default=1.0)
    eta: float = struct.field(pytree_node=False, default=1.0)

    def cal_x0(self, model_fn, xt, state, t, at, at_next, y0, key):
        def loss_fn(xt_in):
            et = predict_eps(model_fn, xt_in, t)
            x0 = predict_x0(xt_in, et, at)
            r = y0 - self.operator.H_img(x0)
            return jnp.sum(r**2), (et, x0)

        (loss, (et, x0)), grad = jax.value_and_grad(loss_fn, has_aux=True)(xt)

        if self.noise == "ddpm":
            c1 = self.eta * jnp.sqrt(
                (1 - at / at_next) * (1 - at_next) / (1 - at)
            )
        elif self.noise == "ddim":
            c1 = jnp.asarray(0.0)
        else:
            raise ValueError(f"unsupported noise type: {self.noise}")
        c2 = jnp.sqrt(1 - at_next - c1**2)
        add_up = c1 * jax.random.normal(key, x0.shape) + c2 * et
        x0 = x0 - grad * self.lam / (jnp.sqrt(at_next) * jnp.sqrt(loss))
        return x0, add_up, state


class PiGDM(Algo):
    """Pseudo-inverse guided diffusion (ref: algos/pigdm.py)."""

    lam: float = struct.field(pytree_node=False, default=1.0)
    eta: float = struct.field(pytree_node=False, default=1.0)

    def cal_x0(self, model_fn, xt, state, t, at, at_next, y0, key):
        op = self.operator

        if self.sigma_0 == 0:
            def loss_fn(xt_in):
                et = predict_eps(model_fn, xt_in, t)
                x0 = predict_x0(xt_in, et, at)
                mat = jax.lax.stop_gradient(
                    op.H_pinv(y0) - op.H_pinv(op.H_img(x0))
                )
                mat_img = self._img(mat, x0)
                return jnp.sum(mat_img * x0), (et, x0)
        else:
            rt = jnp.sqrt(1 - at)
            scale = self.sigma_0 / rt

            def loss_fn(xt_in):
                et = predict_eps(model_fn, xt_in, t)
                x0 = predict_x0(xt_in, et, at)
                mat1 = jax.lax.stop_gradient(y0 - op.H_img(x0))
                mat1 = op.Ut(mat1)
                mat2 = op.H_scaled_inv(op.H_img(x0), scale)
                return jnp.sum(mat1 * mat2), (et, x0)

        (_, (et, x0)), grad = jax.value_and_grad(loss_fn, has_aux=True)(xt)
        c1 = self.eta * jnp.sqrt((1 - at / at_next) * (1 - at_next) / (1 - at))
        c2 = jnp.sqrt(1 - at_next - c1**2)
        add_up = c1 * jax.random.normal(key, x0.shape) + c2 * et
        x0 = x0 + jnp.sqrt(at) / jnp.sqrt(at_next) * grad * self.lam
        return x0, add_up, state


class DMPS(Algo):
    """Diffusion model posterior sampling with closed-form pseudo-likelihood
    (ref: algos/dmps.py; guidance term obs_functions/Hfuncs.py:102-113)."""

    eta: float = struct.field(pytree_node=False, default=0.85)

    def cal_x0(self, model_fn, xt, state, t, at, at_next, y0, key):
        op = self.operator
        guidance = self._img(
            op.H_dmps_guidance(self._flat(xt), y0, at, self.sigma_0), xt
        )
        et = predict_eps(model_fn, xt, t)
        x0 = predict_x0(xt, et, at)
        c1 = self.eta * jnp.sqrt(1 - at_next)
        c2 = jnp.sqrt(1 - self.eta**2) * jnp.sqrt(1 - at_next)
        at_no_bar = at / at_next
        x0 = x0 + (1 - at_no_bar) / (
            jnp.sqrt(at_no_bar) * jnp.sqrt(at_next)
        ) * guidance
        add_up = c1 * jax.random.normal(key, x0.shape) + c2 * et
        return x0, add_up, state


class REDdiff(Algo):
    """RED-diff variational sampler with carried x0_t_last state
    (ref: algos/reddiff.py; special-cased dispatch main_sampling.py:907-908)."""

    eta: float = struct.field(pytree_node=False, default=2.0)

    def init_state(self, xt):
        return (jnp.zeros_like(xt), jnp.asarray(False))

    def cal_x0(self, model_fn, xt, state, t, at, at_next, y0, key):
        x0_last_stored, initialized = state
        et = predict_eps(model_fn, xt, t)
        x0 = predict_x0(xt, et, at)
        x0_last = jnp.where(initialized, x0_last_stored, x0)

        grad = jax.grad(
            lambda x: jnp.sum((y0 - self.operator.H_img(x)) ** 2)
        )(x0_last)
        add_up = jnp.sqrt(1 - at_next) * jax.random.normal(key, x0.shape)
        x0_new = x0_last + (x0 - x0_last) - grad * self.eta
        # the carried x0_t_last is the UPDATED x0 (main_sampling.py:910-912)
        return x0_new, add_up, (x0_new, jnp.asarray(True))
