from . import schedulers, unet, vae
from .schedulers import DDIM, EulerAncestral, SchedulerConfig
from .unet import UNet2DCondition, UNetConfig
from .vae import AutoencoderKL, VAEConfig

__all__ = ["schedulers", "unet", "vae", "DDIM", "EulerAncestral",
           "SchedulerConfig", "UNet2DCondition", "UNetConfig",
           "AutoencoderKL", "VAEConfig"]
