from .autoencoder import AutoencoderConfig, VQModel, Encoder, Decoder, VectorQuantizer
from .ldm import LatentDiffusion, latent_unet_config

__all__ = [
    "AutoencoderConfig", "VQModel", "Encoder", "Decoder", "VectorQuantizer",
    "LatentDiffusion", "latent_unet_config",
]
