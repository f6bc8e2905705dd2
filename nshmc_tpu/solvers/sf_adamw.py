"""Schedule-free AdamW, functional JAX implementation.

Re-design of the reference optimizer (ref: optim/sf_adamw.py:15-210, Meta's
schedule-free AdamW), reproducing the exact update order of the reference's
closure-free usage in DiffPIR (algos/diffpir.py:36-44): the gradient is
evaluated at the averaged iterate x (the reference calls step() after
loss.backward() on p == x), then

    y   = x + (1-beta1) (z - x)          # extrapolate
    v   = beta2 v + (1-beta2) g^2
    gn  = g / (sqrt(v / bc2) + eps) + decay * y
    z   = z - lr * gn
    x   = x + c_{k+1} (z - x),  c_{k+1} = w_{k+1} / sum w

with w_k = k^r * lr_max^weight_lr_power. Operates on arbitrary pytrees.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SFAdamWState(NamedTuple):
    z: any
    exp_avg_sq: any
    k: jnp.ndarray
    weight_sum: jnp.ndarray
    lr_max: jnp.ndarray


def sf_adamw_init(params) -> SFAdamWState:
    return SFAdamWState(
        z=jax.tree.map(jnp.asarray, params),
        exp_avg_sq=jax.tree.map(jnp.zeros_like, params),
        k=jnp.asarray(0, jnp.int32),
        weight_sum=jnp.asarray(0.0, jnp.float32),
        lr_max=jnp.asarray(0.0, jnp.float32),
    )


def sf_adamw_step(
    params,
    grads,
    state: SFAdamWState,
    lr: float = 0.0025,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    warmup_steps: int = 0,
    r: float = 0.0,
    weight_lr_power: float = 2.0,
):
    """One update; returns (new_params, new_state)."""
    k = state.k
    kf = k.astype(jnp.float32)
    sched = jnp.where(
        k < warmup_steps, (kf + 1) / jnp.maximum(warmup_steps, 1), 1.0
    )
    lr_t = lr * sched
    lr_max = jnp.maximum(lr_t, state.lr_max)
    weight = (kf + 1.0) ** r * lr_max**weight_lr_power
    weight_sum = state.weight_sum + weight
    ckp1 = jnp.where(weight_sum > 0, weight / weight_sum, 0.0)
    bc2 = 1.0 - beta2 ** (kf + 1.0)

    def upd(x, g, z, v):
        y = x + (1.0 - beta1) * (z - x)
        v = beta2 * v + (1.0 - beta2) * g**2
        denom = jnp.sqrt(v / bc2) + eps
        gn = g / denom
        if weight_decay != 0.0:
            gn = gn + weight_decay * y
        z = z - lr_t * gn
        x = x + ckp1 * (z - x)
        return x, z, v

    flat = jax.tree.map(upd, params, grads, state.z, state.exp_avg_sq)
    # unzip the 3-tuples
    x_new = jax.tree.map(lambda t: t[0], flat,
                         is_leaf=lambda t: isinstance(t, tuple))
    z_new = jax.tree.map(lambda t: t[1], flat,
                         is_leaf=lambda t: isinstance(t, tuple))
    v_new = jax.tree.map(lambda t: t[2], flat,
                         is_leaf=lambda t: isinstance(t, tuple))
    return x_new, SFAdamWState(
        z=z_new, exp_avg_sq=v_new, k=k + 1,
        weight_sum=weight_sum, lr_max=lr_max,
    )
