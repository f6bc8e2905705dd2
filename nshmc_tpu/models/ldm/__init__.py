from .autoencoder import (AutoencoderConfig, VQModel, AutoencoderKL, Encoder, Decoder, VectorQuantizer)
from .ldm import LatentDiffusion, latent_unet_config
from .distributions import DiagonalGaussian, ema_update

__all__ = [
    "AutoencoderConfig", "VQModel", "AutoencoderKL", "Encoder", "Decoder",
    "VectorQuantizer", "DiagonalGaussian", "ema_update",
    "LatentDiffusion", "latent_unet_config",
]
