"""Generic jitted sampling loop dispatching algorithm step pairs.

TPU-native equivalent of the reference's `iterative_sampling`
(ref: main_sampling.py:898-915): one `lax.scan` over the DDIM timestep
ladder, with per-step PRNG keys and algorithm state in the carry.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..schedules import DiffusionSchedule, DDIMSequence
from ..algos.base import Algo, ModelFn


def iterative_sampling(
    model_fn: ModelFn,
    schedule: DiffusionSchedule,
    seq: DDIMSequence,
    algo: Algo,
    xt: jnp.ndarray,
    y0: jnp.ndarray,
    key: jnp.ndarray,
) -> jnp.ndarray:
    """Run the algorithm over reversed(seq); returns the final x (the x0
    prediction after the terminal t=-1 step)."""
    pairs = jnp.asarray(seq.reversed_pairs())

    def body(carry, pair):
        xt, state, key = carry
        key, sub = jax.random.split(key)
        t, t_next = pair[0], pair[1]
        at = schedule.alpha_bar(t)
        at_next = schedule.alpha_bar(t_next)
        xt_next, state = algo.step(
            model_fn, xt, state, t, at, at_next, y0, sub
        )
        return (xt_next, state, key), None

    (out, _, _), _ = jax.lax.scan(body, (xt, algo.init_state(xt), key), pairs)
    return out
