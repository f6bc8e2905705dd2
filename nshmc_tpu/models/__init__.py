from .unet import UNetConfig, UNetModel
from .ddpm_simple import DDPMConfig, DDPMModel
