"""MVDream / ImageDream: text (or image) → 4 consistent orbit views.

Counterpart of the reference `MVDreamPipeline`
(`Gen_3D_Modules/LGM/mvdream/pipeline_mvdream.py`, fed to LGM by the
MVDream_Model node, `nodes.py:1716`), re-derived: an SD-1.5-class UNet
with 3D self-attention across the 4 views (UNetConfig.mv_views) and a
camera embedding — the flattened 4×4 c2w per view through a small MLP —
added to the time embedding (the MVDream camera-conditioning hook).
DDIM sampling with CFG.

Text conditioning is pluggable: pass `prompt_embeds` [77, D] (from a CLIP
text encoder when weights are available); the uncond embedding defaults
to zeros.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.schedulers import (SchedulerConfig, make_scheduler,
                                     sample_loop)
from ..diffusion.unet import UNet2DCondition, UNetConfig
from ..diffusion.vae import AutoencoderKL, VAEConfig


@dataclasses.dataclass(frozen=True)
class MVDreamConfig:
    image_size: int = 256
    num_views: int = 4
    camera_elevation: float = 0.0
    camera_radius: float = 1.5
    unet: UNetConfig = dataclasses.field(
        default_factory=lambda: dataclasses.replace(UNetConfig.sd15(),
                                                    mv_views=4))
    vae: VAEConfig = VAEConfig()
    prompt_tokens: int = 77
    prompt_dim: int = 768
    camera_dim: int = 16

    @property
    def vae_factor(self) -> int:
        return 2 ** (len(self.vae.block_out_channels) - 1)


class CameraEmbed(nn.Module):
    """flattened c2w [B, 16] → time-embedding-sized vector (MVDream's
    camera MLP added to the timestep embedding)."""
    dim: int

    @nn.compact
    def __call__(self, cam):
        h = nn.Dense(self.dim, name="linear_1")(cam)
        return nn.Dense(self.dim, name="linear_2")(nn.silu(h))


def orbit_c2w_flat(num_views: int, elevation: float, radius: float):
    from ...core.camera import orbit_c2w
    azims = jnp.arange(num_views) * (360.0 / num_views)
    c2w = orbit_c2w(jnp.full((num_views,), elevation), azims, radius)
    return c2w.reshape(num_views, 16)


class MVDreamPipeline:
    def __init__(self, params, cfg: MVDreamConfig = MVDreamConfig()):
        self.cfg = cfg
        self.params = params
        self.unet = UNet2DCondition(cfg.unet)
        self.vae = AutoencoderKL(cfg.vae)
        self.cam_embed = CameraEmbed(cfg.unet.block_out_channels[0] * 4)

    @classmethod
    def init_random(cls, key=None, cfg: MVDreamConfig = MVDreamConfig()
                    ) -> "MVDreamPipeline":
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        lat = cfg.image_size // cfg.vae_factor
        unet = UNet2DCondition(cfg.unet)
        unet_params = unet.init(
            k1, jnp.zeros((cfg.num_views, lat, lat, 4)),
            jnp.zeros((cfg.num_views,)),
            jnp.zeros((cfg.num_views, cfg.prompt_tokens, cfg.prompt_dim)),
            class_emb=jnp.zeros(
                (cfg.num_views, cfg.unet.block_out_channels[0] * 4))
        )["params"]
        vae_params = AutoencoderKL(cfg.vae).init(
            k2, jnp.zeros((1, 64, 64, 3)))["params"]
        cam_params = CameraEmbed(cfg.unet.block_out_channels[0] * 4).init(
            k3, jnp.zeros((1, cfg.camera_dim)))["params"]
        return cls({"unet": unet_params, "vae": vae_params,
                    "camera": cam_params}, cfg)

    def __call__(self, prompt_embeds: Optional[np.ndarray] = None,
                 negative_embeds: Optional[np.ndarray] = None,
                 num_inference_steps: int = 30,
                 guidance_scale: float = 7.0, seed: int = 0,
                 elevation: Optional[float] = None,
                 adapter_residuals=None):
        """→ [V, S, S, 3] images in [0,1].

        adapter_residuals: optional T2I-Adapter feature pyramid (one
        [V, h, w, c] per down stage — the CRM T2I conditioning path);
        applied to both CFG branches."""
        cfg = self.cfg
        v = cfg.num_views
        emb_dim = cfg.prompt_dim
        if prompt_embeds is None:
            prompt_embeds = np.zeros((cfg.prompt_tokens, emb_dim),
                                     np.float32)
        if negative_embeds is None:
            negative_embeds = np.zeros_like(prompt_embeds)
        cond = jnp.tile(jnp.asarray(prompt_embeds)[None], (v, 1, 1))
        uncond = jnp.tile(jnp.asarray(negative_embeds)[None], (v, 1, 1))
        states = jnp.concatenate([uncond, cond])          # [2V, 77, D]

        cams = orbit_c2w_flat(v, elevation if elevation is not None
                              else cfg.camera_elevation, cfg.camera_radius)
        cam_emb = self.cam_embed.apply({"params": self.params["camera"]},
                                       cams)
        cam_emb2 = jnp.concatenate([cam_emb, cam_emb])

        sched = make_scheduler(
            getattr(self, "scheduler_name", None) or "DDIMScheduler",
            SchedulerConfig(), num_inference_steps)
        lat = cfg.image_size // cfg.vae_factor
        key = jax.random.PRNGKey(seed)
        latents = jax.random.normal(key, (v, lat, lat, 4)) \
            * sched.init_sigma

        unet_apply = partial(self.unet.apply,
                             {"params": self.params["unet"]})

        ad2 = (None if adapter_residuals is None else
               [jnp.concatenate([r, r]) for r in adapter_residuals])

        def denoise_fn(x_in, i, t):
            lat_in = jnp.concatenate([x_in, x_in])
            tvec = jnp.full((2 * v,), t, jnp.float32)
            out, _ = unet_apply(lat_in, tvec, states, class_emb=cam_emb2,
                                adapter_residuals=ad2)
            un, co = jnp.split(out, 2)
            return un + guidance_scale * (co - un)

        latents = sample_loop(sched, denoise_fn, latents, key=key)
        img = self.vae.apply({"params": self.params["vae"]}, latents,
                             method=AutoencoderKL.decode)
        return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)
