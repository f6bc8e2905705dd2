"""Posterior-sampling algorithm interface.

TPU-native re-design of the reference's `Base_Algo` plugin system
(ref: algos/base_algo.py:3-16): each algorithm is a flax PyTreeNode holding
its operator and hyperparameters, exposing a `cal_x0 / map_back` step pair
that the jitted DDIM scan dispatches (sampling/loop.py). Unlike the
reference's stateful classes, randomness comes from explicit PRNG keys and
cross-step state (e.g. RED-diff's x0_t_last) is threaded through the scan
carry.

Hyperparameters are static fields (plain floats) so value-dependent branches
(e.g. the sigma_0 == 0 noiseless paths) resolve at trace time.
"""
from __future__ import annotations

from typing import Any, Callable, Tuple

import jax.numpy as jnp
from flax import struct

from ..operators.base import Operator, flatten_image, unflatten_image

ModelFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def predict_eps(model_fn: ModelFn, xt: jnp.ndarray, t) -> jnp.ndarray:
    """eps-prediction with learn_sigma slicing (ref: algos/unconditional.py:12-19)."""
    tb = jnp.full((xt.shape[0],), t, jnp.float32)
    return model_fn(xt, tb)[..., : xt.shape[-1]]


def predict_x0(xt, et, at):
    """x0_t = (xt - eps*sqrt(1-at)) / sqrt(at), clipped to [-1, 1]."""
    x0 = (xt - et * jnp.sqrt(1.0 - at)) / jnp.sqrt(at)
    return jnp.clip(x0, -1.0, 1.0)


class Algo(struct.PyTreeNode):
    """Step-pair interface. `state` must keep a fixed pytree structure across
    scan iterations; algorithms without cross-step state use `()`."""

    operator: Operator
    sigma_0: float = struct.field(pytree_node=False, default=0.1)
    noise: str = struct.field(pytree_node=False, default="ddpm")

    def init_state(self, xt: jnp.ndarray) -> Any:
        return ()

    def cal_x0(self, model_fn: ModelFn, xt, state, t, at, at_next, y0, key
               ) -> Tuple[jnp.ndarray, jnp.ndarray, Any]:
        """Returns (x0_t, add_up, new_state)."""
        raise NotImplementedError

    def map_back(self, x0_t, y0, add_up, at_next, at) -> jnp.ndarray:
        """Default DDIM recombination (ref: algos/unconditional.py:26-28)."""
        return jnp.sqrt(at_next) * x0_t + add_up

    def step(self, model_fn: ModelFn, xt, state, t, at, at_next, y0, key):
        """One full sampler step; algorithms whose map_back depends on the
        timestep (e.g. ReSample) override this instead."""
        x0, add_up, state = self.cal_x0(
            model_fn, xt, state, t, at, at_next, y0, key
        )
        return self.map_back(x0, y0, add_up, at_next, at), state

    # spectral helpers: image (B,H,W,C) <-> flat (B,D) channel-first
    def _flat(self, img):
        return flatten_image(img)

    def _img(self, vec, like):
        return unflatten_image(vec, like.shape[-1], like.shape[1])


class Unconditional(Algo):
    """Plain DDIM eta=0 step — what HMC/DMPlug decode through
    (ref: algos/unconditional.py:4-28)."""

    def cal_x0(self, model_fn, xt, state, t, at, at_next, y0, key):
        et = predict_eps(model_fn, xt, t)
        x0 = predict_x0(xt, et, at)
        add_up = jnp.sqrt(1.0 - at_next) * et
        return x0, add_up, state
