"""Nonlinear (learned) blur operator.

Re-design of the reference `NonlinearBlurOperator`
(ref: obs_functions/Hfuncs.py:369-404): blurs via an external pretrained
kernel-conditioned network (bkse KernelWizard, loaded from
./bkse/options/generate_blur/default.yml — NOT shipped in the reference
repo; the reference path requires an external clone + checkpoint download).
The operator applies a fixed random kernel code `randn(1, 512, 2, 2) * 1.2`
(Hfuncs.py:373) and maps [-1,1] -> [0,1] -> blur -> [-1,1] clipped.

Two backing networks:
  - `create_bkse(state_dict)` / `create(..., wizard_params=...)`: the REAL
    bkse KernelWizard architecture (models/kernel_wizard.py), either ported
    from a torch checkpoint or randomly initialized. This is the
    reference-parity path — pretrained GOPRO weights port straight in.
  - `create()` (no weights): a small Flax surrogate (`KernelAdapter`),
    randomly initialized — same observable behavior as the reference when
    its checkpoint is missing, but ~40x cheaper, kept as the default for
    tests/benches that only need a fixed nonlinear H.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
from flax import struct

from .base import Operator
from ..models.kernel_wizard import (
    KernelWizard,
    KernelWizardConfig,
    port_kernel_wizard,
)


class KernelAdapter(nn.Module):
    """Kernel-conditioned blur surrogate: x (B,H,W,3) in [0,1], kernel code
    (B, 2, 2, 512) -> blurred (B,H,W,3)."""

    nf: int = 32

    @nn.compact
    def __call__(self, x, kernel):
        h = nn.Conv(self.nf, (5, 5), padding=2)(x)
        h = nn.silu(h)
        h = nn.Conv(self.nf * 2, (3, 3), strides=(2, 2), padding=1)(h)
        h = nn.silu(h)
        # broadcast the kernel code over space as a FiLM modulation
        code = kernel.reshape(kernel.shape[0], -1)
        scale = nn.Dense(self.nf * 2)(code)[:, None, None, :]
        shift = nn.Dense(self.nf * 2)(code)[:, None, None, :]
        h = h * (1 + jnp.tanh(scale)) + 0.1 * jnp.tanh(shift)
        h = nn.Conv(self.nf * 2, (3, 3), padding=1)(h)
        h = nn.silu(h)
        b, hh, ww, c = h.shape
        h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
        h = nn.Conv(self.nf, (3, 3), padding=1)(h)
        h = nn.silu(h)
        delta = nn.Conv(3, (5, 5), padding=2,
                        kernel_init=nn.initializers.normal(1e-3))(h)
        return x + delta


class NonlinearBlur(Operator):
    kernel_code: jnp.ndarray  # (1, 2, 2, 512), the fixed random kernel
    blur_params: Any
    _channels: int = struct.field(pytree_node=False, default=3)
    _img_dim: int = struct.field(pytree_node=False, default=256)
    _nf: int = struct.field(pytree_node=False, default=32)
    # "surrogate" (small random net) or "bkse" (real KernelWizard)
    _net: str = struct.field(pytree_node=False, default="surrogate")
    _wizard_cfg: KernelWizardConfig = struct.field(
        pytree_node=False, default=KernelWizardConfig())

    @property
    def channels(self):
        return self._channels

    @property
    def img_dim(self):
        return self._img_dim

    @classmethod
    def create(cls, channels: int = 3, img_dim: int = 256, seed: int = 0,
               nf: int = 32, wizard_params: Optional[Any] = None,
               wizard_cfg: KernelWizardConfig = KernelWizardConfig(),
               ) -> "NonlinearBlur":
        """Default: random surrogate net. Pass `wizard_params` (a ported or
        initialized KernelWizard param tree) to use the real bkse
        architecture instead."""
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        kernel = jax.random.normal(
            k1, (1, 2, 2, wizard_cfg.kernel_dim)) * 1.2  # Hfuncs.py:373
        if wizard_params is not None:
            return cls(kernel_code=kernel, blur_params=wizard_params,
                       _channels=channels, _img_dim=img_dim, _net="bkse",
                       _wizard_cfg=wizard_cfg)
        net = KernelAdapter(nf=nf)
        params = net.init(k2, jnp.zeros((1, img_dim, img_dim, channels)),
                          kernel)
        return cls(kernel_code=kernel, blur_params=params,
                   _channels=channels, _img_dim=img_dim, _nf=nf)

    @classmethod
    def create_bkse(cls, state_dict=None, channels: int = 3,
                    img_dim: int = 256, seed: int = 0,
                    wizard_cfg: KernelWizardConfig = KernelWizardConfig(),
                    ) -> "NonlinearBlur":
        """Real bkse KernelWizard path (ref: Hfuncs.py:369-391). With a
        torch `state_dict`, ports the pretrained GOPRO checkpoint; without
        one, random-initializes the same architecture (the reference's own
        behavior degrades identically when its checkpoint is absent)."""
        if state_dict is not None:
            params = port_kernel_wizard(state_dict, wizard_cfg)
        else:
            model = KernelWizard(wizard_cfg)
            params = model.init(
                jax.random.PRNGKey(seed + 1),
                jnp.zeros((1, img_dim, img_dim, channels)),
                jnp.zeros((1, 2, 2, wizard_cfg.kernel_dim)),
                method=KernelWizard.adapt_kernel)
        return cls.create(channels, img_dim, seed, wizard_params=params,
                          wizard_cfg=wizard_cfg)

    def is_linear(self):
        return False

    def _blur(self, img01):
        kernel = jnp.broadcast_to(
            self.kernel_code,
            (img01.shape[0],) + self.kernel_code.shape[1:],
        )
        if self._net == "bkse":
            net = KernelWizard(self._wizard_cfg)
            return net.apply(self.blur_params, img01, kernel,
                             method=KernelWizard.adapt_kernel)
        net = KernelAdapter(nf=self._nf)
        return net.apply(self.blur_params, img01, kernel)

    def H(self, vec):
        """[-1,1] -> [0,1] -> blur -> [-1,1] clip (ref: Hfuncs.py:381-387)."""
        b = vec.shape[0]
        img = vec.reshape(b, self._channels, self._img_dim, self._img_dim)
        img = jnp.transpose(img, (0, 2, 3, 1))
        img01 = (img + 1.0) / 2.0
        blurred = self._blur(img01)
        out = jnp.clip(blurred * 2.0 - 1.0, -1.0, 1.0)
        return jnp.transpose(out, (0, 3, 1, 2)).reshape(b, -1)

    def H_pinv(self, vec):
        """Identity (ref: Hfuncs.py:396-397)."""
        return vec.reshape(vec.shape[0], -1)
