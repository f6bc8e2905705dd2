"""Diffusion noise schedules and DDIM timestep sequences.

Capabilities mirror the reference schedule math (ref: main_sampling.py:38-73,
ldm/modules/diffusionmodules/util.py:21-44, ldm/models/diffusion/ddpm.py:117-169)
but are computed host-side in float64 NumPy and frozen into a pytree of
device arrays, so everything downstream is static-shape and jit-friendly.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np
import jax.numpy as jnp
from flax import struct


def make_betas(
    schedule: str,
    beta_start: float,
    beta_end: float,
    num_timesteps: int,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Beta schedule table in float64 (ref: main_sampling.py:38-68 plus the
    LDM 'cosine'/'sqrt_linear'/'sqrt' variants, ldm/.../util.py:21-44)."""
    if schedule == "quad":
        betas = (
            np.linspace(beta_start**0.5, beta_end**0.5, num_timesteps, dtype=np.float64)
            ** 2
        )
    elif schedule in ("linear", "sqrt_linear"):
        betas = np.linspace(beta_start, beta_end, num_timesteps, dtype=np.float64)
    elif schedule == "const":
        betas = beta_end * np.ones(num_timesteps, dtype=np.float64)
    elif schedule == "jsd":  # 1/T, 1/(T-1), ..., 1
        betas = 1.0 / np.linspace(num_timesteps, 1, num_timesteps, dtype=np.float64)
    elif schedule == "sigmoid":
        x = np.linspace(-6, 6, num_timesteps)
        betas = 1.0 / (1.0 + np.exp(-x)) * (beta_end - beta_start) + beta_start
    elif schedule == "cosine":
        ts = np.arange(num_timesteps + 1, dtype=np.float64) / num_timesteps + cosine_s
        alphas = np.cos(ts / (1 + cosine_s) * np.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - (alphas[1:] / alphas[:-1])
        betas = np.clip(betas, 0, 0.999)
    elif schedule == "sqrt":
        betas = (
            np.linspace(beta_start, beta_end, num_timesteps, dtype=np.float64) ** 0.5
        )
    else:
        raise NotImplementedError(f"unknown beta schedule: {schedule}")
    assert betas.shape == (num_timesteps,)
    return betas


class DiffusionSchedule(struct.PyTreeNode):
    """Frozen schedule tables.

    `alphas_cumprod_padded[t + 1]` equals the reference `compute_alpha(b, t)`
    (ref: main_sampling.py:70-73): a leading 1.0 is prepended so that t = -1
    (the DDIM terminal step) maps to alpha-bar = 1.
    """

    betas: jnp.ndarray  # (T,)
    alphas_cumprod: jnp.ndarray  # (T,)
    alphas_cumprod_padded: jnp.ndarray  # (T + 1,), [1.0, a_0, ..., a_{T-1}]

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]

    def alpha_bar(self, t: jnp.ndarray) -> jnp.ndarray:
        """alpha-bar at (possibly -1-valued) integer timestep(s) `t`."""
        return jnp.take(self.alphas_cumprod_padded, t + 1)

    @classmethod
    def create(
        cls,
        schedule: str = "linear",
        beta_start: float = 1e-4,
        beta_end: float = 2e-2,
        num_timesteps: int = 1000,
        dtype=jnp.float32,
    ) -> "DiffusionSchedule":
        betas = make_betas(schedule, beta_start, beta_end, num_timesteps)
        alphas_cumprod = np.cumprod(1.0 - betas)
        padded = np.concatenate([[1.0], alphas_cumprod])
        return cls(
            betas=jnp.asarray(betas, dtype),
            alphas_cumprod=jnp.asarray(alphas_cumprod, dtype),
            alphas_cumprod_padded=jnp.asarray(padded, dtype),
        )

    @classmethod
    def from_alphas_cumprod(cls, alphas_cumprod, dtype=jnp.float32):
        """Build from a model-provided alpha-bar table (latent models register
        their own buffers; ref: ldm/models/diffusion/ddpm.py:117-169)."""
        alphas_cumprod = np.asarray(alphas_cumprod, np.float64)
        prev = np.concatenate([[1.0], alphas_cumprod[:-1]])
        alphas = alphas_cumprod / prev
        betas = 1.0 - alphas
        padded = np.concatenate([[1.0], alphas_cumprod])
        return cls(
            betas=jnp.asarray(betas, dtype),
            alphas_cumprod=jnp.asarray(alphas_cumprod, dtype),
            alphas_cumprod_padded=jnp.asarray(padded, dtype),
        )


@dataclasses.dataclass(frozen=True)
class DDIMSequence:
    """The few-step DDIM timestep ladder.

    Reference construction (main_sampling.py:469-471):
      skip = T // (timesteps + 1); seq = [skip, 2*skip, ...]; seq_next = [-1] + seq[:-1]
    For T=1000, timesteps=3: seq=[250, 500, 750], seq_next=[-1, 250, 500].
    The sampler iterates reversed(seq) so steps run 750 -> 500 -> 250 -> x0.
    """

    seq: tuple  # ascending timesteps
    seq_next: tuple  # one-step-lower targets, aligned with seq

    @classmethod
    def create(cls, num_timesteps: int, steps: int) -> "DDIMSequence":
        skip = num_timesteps // (steps + 1)
        seq = list(range(skip, num_timesteps, skip))
        seq_next = [-1] + seq[:-1]
        return cls(seq=tuple(seq), seq_next=tuple(seq_next))

    def reversed_pairs(self) -> np.ndarray:
        """(n_steps, 2) int32 array of (t, t_next) pairs in sampling order
        (descending t) — the lax.scan xs for the DDIM decode loop."""
        pairs = list(zip(reversed(self.seq), reversed(self.seq_next)))
        return np.asarray(pairs, np.int32)

    @property
    def n_steps(self) -> int:
        return len(self.seq)
