"""Chain parallelism over TPU device meshes.

The reference has no distributed backend (SURVEY.md section 2.3: a single
hard-coded CUDA device, main_sampling.py:1030). Here chain parallelism is a
first-class capability: HMC chains are vmapped within a device and
`shard_map`ped across a 1-D `('chain',)` mesh — on real hardware the axis
spans ICI within a slice and DCN across slices; locally it spans the
virtual CPU devices used by the test-suite.

Acceptance statistics are reduced with `pmean` over the chain axis for
cross-device step-size diagnostics without serializing the leapfrog loop.
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..hmc.engine import ChainState, HMCConfig, run_hmc


def chain_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over all (or the first n) local devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), ("chain",))


def make_sharded_hmc(
    cfg: HMCConfig,
    mesh: Mesh,
    loss_fn_builder: Callable,
):
    """Build a jitted, mesh-sharded multi-chain HMC runner.

    loss_fn_builder(params, operator, y0) -> per-chain loss_fn. params /
    operator / y0 are replicated (P()); chain states are sharded on their
    leading axis (P('chain')). The number of chains must be divisible by the
    mesh size.
    """

    def body(params, operator, y0, states: ChainState) -> ChainState:
        loss_fn = loss_fn_builder(params, operator, y0)
        return run_hmc(loss_fn, cfg, states)

    sharded = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("chain")),
        out_specs=P("chain"),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_latent_hmc(cfg, mesh: Mesh, loss_fn_builder: Callable):
    """Latent-HMC analogue of `make_sharded_hmc`: chain states shard on
    their leading axis over the ('chain',) mesh; the LDM params / operator /
    y0 closed over by loss_fn_builder are replicated.

    loss_fn_builder(unet_params, ae_params, operator, y0) -> per-chain
    latent loss_fn (see hmc.latent.make_latent_loss_fn).
    """
    from ..hmc.latent import run_latent_hmc

    def body(unet_params, ae_params, operator, y0, states):
        loss_fn = loss_fn_builder(unet_params, ae_params, operator, y0)
        return run_latent_hmc(loss_fn, cfg, states)

    sharded = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P("chain")),
        out_specs=P("chain"),
        check_vma=False,
    )
    return jax.jit(sharded)


def acceptance_stats(states: ChainState):
    """Aggregate acceptance statistics across all chains (host-side)."""
    acc = np.asarray(states.accepted, np.float64)
    att = np.asarray(states.attempts, np.float64)
    return {
        "accept_rate": float(acc.sum() / np.maximum(att.sum(), 1)),
        "mean_attempts": float(att.mean()),
        "chains_done": int((np.asarray(states.epoch) >= 0).sum()),
    }
