"""DMPlug: direct optimization of the initial noise x_T.

Re-designs of the reference solvers (ref: main_sampling.py:572-658):
  dmplug_adam  — Adam(lr=1e-2) up to 10k steps with an image-variance
                 sliding-window early stop (util/early_stop.py:1-28)
  dmplug_lbfgs — L-BFGS over 300 outer closures (max_iter 20)

Both minimize ||y0 - H(decode(x_T))||^2 through the differentiable DDIM
decoder. Adam runs as a jitted lax.while_loop carrying the variance ring
buffer; L-BFGS uses optax.lbfgs with a jitted value_and_grad oracle.
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct


@dataclasses.dataclass(frozen=True)
class DMPlugAdamConfig:
    lr: float = 1e-2
    max_steps: int = 10000
    buffer_size: int = 50  # sliding window (ref: main_sampling.py:605)
    patience: int = 300


class _AdamLoop(struct.PyTreeNode):
    x: jnp.ndarray
    opt_state: object
    step: jnp.ndarray
    ring: jnp.ndarray  # (buffer, numel) flattened decoded images
    best_var: jnp.ndarray
    wait: jnp.ndarray
    stop: jnp.ndarray
    last_decoded: jnp.ndarray


def dmplug_adam(loss_and_decode: Callable, x0, cfg: DMPlugAdamConfig = DMPlugAdamConfig()):
    """loss_and_decode(x) -> (loss, decoded_image_batch). Returns
    (x_T_final, decoded_final). Early-stops when the ring-buffer variance
    fails to improve for `patience` consecutive steps."""
    opt = optax.adam(cfg.lr)
    vg = jax.value_and_grad(lambda x: loss_and_decode(x), has_aux=True)
    numel = int(np.prod(x0.shape))

    def body(s: _AdamLoop) -> _AdamLoop:
        (loss, dec), g = vg(s.x)
        updates, opt_state = opt.update(g, s.opt_state)
        x = optax.apply_updates(s.x, updates)

        flat = jnp.reshape(dec, (-1,))[:numel]
        ring = jnp.roll(s.ring, -1, axis=0).at[-1].set(flat)
        filled = s.step + 1 >= cfg.buffer_size
        mean = ring.mean(axis=0)
        var = jnp.mean(jnp.sum((ring - mean[None]) ** 2, axis=1))
        improved = var < s.best_var
        best_var = jnp.where(filled & improved, var, s.best_var)
        wait = jnp.where(filled, jnp.where(improved, 0, s.wait + 1), s.wait)
        stop = filled & (wait >= cfg.patience)
        return s.replace(
            x=x, opt_state=opt_state, step=s.step + 1, ring=ring,
            best_var=best_var, wait=wait, stop=stop, last_decoded=dec,
        )

    (loss0, dec0), _ = vg(x0)
    init = _AdamLoop(
        x=x0, opt_state=opt.init(x0), step=jnp.asarray(0, jnp.int32),
        ring=jnp.zeros((cfg.buffer_size, numel), jnp.float32),
        best_var=jnp.asarray(jnp.inf), wait=jnp.asarray(0, jnp.int32),
        stop=jnp.asarray(False), last_decoded=dec0,
    )
    out = jax.lax.while_loop(
        lambda s: (~s.stop) & (s.step < cfg.max_steps), body, init
    )
    return out.x, out.last_decoded


def dmplug_lbfgs(loss_and_decode: Callable, x0, epochs: int = 300,
                 max_inner: int = 20, tol_grad: float = 1e-7,
                 tol_change: float = 1e-9, max_backtracking: int = 5,
                 chunk: int = 20, progress: Callable | None = None):
    """L-BFGS on x_T (ref: main_sampling.py:572-591: 300 outer steps of
    torch LBFGS with max_iter=20 ~ 300*20 inner iterations).

    Budget discipline (the previous fixed 6000-step scan with optax's
    default zoom linesearch made several extra full-decode evaluations
    per step and could not stop early — multi-hour runs at tiny shapes):
      * backtracking linesearch capped at `max_backtracking` value evals,
        with store_grad=True + value_and_grad_from_state so the accepted
        point's value/grad are reused instead of recomputed;
      * torch-LBFGS-style convergence exits (max|g| <= tol_grad or
        |loss delta| <= tol_change, matching torch.optim.LBFGS defaults
        tolerance_grad=1e-7 / tolerance_change=1e-9);
      * the loop runs as `chunk`-step lax.while_loop segments driven from
        Python, so callers get early exit, SIGALRM interruptibility, and
        optional progress callbacks `progress(steps_done, loss)`.

    NOT jittable from outside (drives device chunks from Python); call it
    directly, not under jax.jit.
    """
    opt = optax.lbfgs(
        linesearch=optax.scale_by_backtracking_linesearch(
            max_backtracking_steps=max_backtracking, store_grad=True))

    def loss_fn(x):
        loss, _ = loss_and_decode(x)
        return loss

    vg_from_state = optax.value_and_grad_from_state(loss_fn)
    total = epochs * max_inner

    @jax.jit
    def run_chunk(x, opt_state, prev_loss, steps_done):
        def cond(c):
            _, _, _, i, conv = c
            return (~conv) & (i < chunk)

        def body(c):
            x, st, prev, i, _ = c
            loss, g = vg_from_state(x, state=st)
            updates, st = opt.update(
                g, st, x, value=loss, grad=g, value_fn=loss_fn)
            x = optax.apply_updates(x, updates)
            conv = (jnp.max(jnp.abs(g)) <= tol_grad) | (
                jnp.abs(prev - loss) <= tol_change)
            return (x, st, loss, i + 1, conv)

        init = (x, opt_state, prev_loss,
                jnp.asarray(0, jnp.int32), jnp.asarray(False))
        x, st, loss, i, conv = jax.lax.while_loop(cond, body, init)
        return x, st, loss, steps_done + i, conv

    x, opt_state = x0, opt.init(x0)
    prev_loss = jnp.asarray(jnp.inf, jnp.float32)
    steps = jnp.asarray(0, jnp.int32)
    while int(steps) < total:
        x, opt_state, prev_loss, steps, conv = run_chunk(
            x, opt_state, prev_loss, steps)
        if progress is not None:
            progress(int(steps), float(prev_loss))
        if bool(conv):
            break
    _, dec = loss_and_decode(x)
    return x, dec
