"""LatentDiffusion: latent U-Net + VQ first stage + registered schedule.

Re-design of the reference LDM inference stack
(ref: ldm/models/diffusion/ddpm.py:424 LatentDiffusion, :117-169
register_schedule, :502-507 frozen first stage, :706/:766 decode paths,
:893 apply_model under @torch.no_grad, :1397-1424 DiffusionWrapper with
None conditioning -> diffusion_model(x, t)).

The latent U-Net reuses the ADM UNetModel with the openaimodel parameter
conventions (ref: configs/config_ffhq_latent.yml:46-63: 64^2, ch=224,
mult (1,2,3,4), num_res_blocks=2, attention at ds 2/4/8, 32 head-channels,
out_channels=3, no scale-shift norm, conv up/downsampling).

Schedule note: LDM's 'linear' beta schedule is linspace in SQRT space
(ldm/modules/diffusionmodules/util.py:24-27), which equals this framework's
'quad' schedule with linear_start=0.0015, linear_end=0.0195.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..unet import UNetConfig, UNetModel
from ...schedules import DiffusionSchedule
from .autoencoder import AutoencoderConfig, VQModel


def latent_unet_config(
    image_size: int = 64,
    model_channels: int = 224,
    num_res_blocks: int = 2,
    channel_mult=(1, 2, 3, 4),
    attention_ds=(8, 4, 2),
    num_head_channels: int = 32,
    in_channels: int = 3,
    out_channels: int = 3,
) -> UNetConfig:
    """openaimodel.UNetModel parameters: `attention_resolutions` are ALREADY
    downsampling factors there (config comment, config_ffhq_latent.yml:50-54),
    unlike create_model's image_size//res conversion."""
    return UNetConfig(
        image_size=image_size,
        in_channels=in_channels,
        model_channels=model_channels,
        out_channels=out_channels,
        num_res_blocks=num_res_blocks,
        attention_ds=tuple(attention_ds),
        channel_mult=tuple(channel_mult),
        num_heads=1,
        num_head_channels=num_head_channels,
        use_scale_shift_norm=False,  # openaimodel default
        resblock_updown=False,  # conv Downsample/Upsample modules
        conv_resample=True,
    )


@dataclasses.dataclass
class LatentDiffusion:
    """Functional LDM bundle: pure apply fns over explicit params."""

    unet: UNetModel
    unet_params: Any
    first_stage: VQModel
    first_stage_params: Any
    schedule: DiffusionSchedule
    scale_factor: float = 1.0

    @classmethod
    def create(
        cls,
        key,
        unet_cfg: Optional[UNetConfig] = None,
        ae_cfg: Optional[AutoencoderConfig] = None,
        linear_start: float = 0.0015,
        linear_end: float = 0.0195,
        num_timesteps: int = 1000,
        dtype=jnp.float32,
    ) -> "LatentDiffusion":
        unet_cfg = unet_cfg or latent_unet_config()
        ae_cfg = ae_cfg or AutoencoderConfig()
        unet = UNetModel(unet_cfg, dtype=dtype)
        first_stage = VQModel(ae_cfg, dtype=dtype)
        k1, k2 = jax.random.split(key)
        d = unet_cfg.image_size
        unet_params = unet.init(
            k1, jnp.zeros((1, d, d, unet_cfg.in_channels)), jnp.zeros((1,))
        )
        r = ae_cfg.resolution
        ae_params = first_stage.init(
            k2, jnp.zeros((1, r, r, ae_cfg.in_channels))
        )
        # LDM 'linear' == sqrt-space linspace == our 'quad'
        schedule = DiffusionSchedule.create(
            "quad", linear_start, linear_end, num_timesteps
        )
        return cls(unet, unet_params, first_stage, ae_params, schedule)

    # -- eps model ----------------------------------------------------------
    def apply_model(self, z, t, stop_gradient: bool = True):
        """eps-prediction; `stop_gradient=True` replicates the reference's
        @torch.no_grad apply_model (ddpm.py:892): the eps-net is constant
        w.r.t. z in any backward pass through this call."""
        out = self.unet.apply(self.unet_params, z, t)
        if stop_gradient:
            out = jax.lax.stop_gradient(out)
        return out

    def model_fn(self, stop_gradient: bool = True):
        return lambda z, t: self.apply_model(z, t, stop_gradient)

    # -- first stage --------------------------------------------------------
    def decode_first_stage(self, z, force_not_quantize: bool = False):
        z = z / self.scale_factor
        return self.first_stage.apply(
            self.first_stage_params, z, force_not_quantize,
            method=VQModel.decode,
        )

    # the reference's `differentiable_decode_first_stage` is the same
    # computation (straight-through quantizer keeps it differentiable)
    differentiable_decode_first_stage = decode_first_stage

    def encode_first_stage(self, x):
        return self.first_stage.apply(
            self.first_stage_params, x, method=VQModel.encode
        ) * self.scale_factor
