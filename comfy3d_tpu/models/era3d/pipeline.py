"""Era3D: single image → 6 views RGB + normals at 512² with row-wise
("epipolar") multiview attention.

Counterpart of `Gen_3D_Modules/Era3D/mvdiffusion/pipelines/
pipeline_mvdiffusion_unclip.py` + `models/transformer_mv2d_rowwise.py`
on the shared SD-UNet substrate (`mv_rowwise` mode: tokens attend within
their image row across views — linear in view count instead of
quadratic in all tokens, the efficiency trick that makes 512² MV
denoising tractable). Joint color+normal domains ride `cd_joint`.

Conditioning: per-view learned prompt embeddings (checkpoint asset,
pluggable via `set_prompt_embeds`) + the input image's VAE latent
concatenated on channels.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import schedulers
from ..diffusion.schedulers import SchedulerConfig
from ..diffusion.unet import UNet2DCondition, UNetConfig
from ..diffusion.vae import AutoencoderKL, VAEConfig


@dataclasses.dataclass(frozen=True)
class Era3DConfig:
    image_size: int = 512
    num_views: int = 6
    prompt_tokens: int = 77
    prompt_dim: int = 1024
    unet: UNetConfig = UNetConfig(
        in_channels=8, out_channels=4, cross_attention_dim=1024,
        attention_head_dim=64, mv_views=6, mv_rowwise=True,
        cd_joint=True)
    vae: VAEConfig = VAEConfig()
    scheduler: SchedulerConfig = SchedulerConfig()
    vae_scaling: float = 0.18215


class Era3DPipeline:
    def __init__(self, params, cfg: Era3DConfig = Era3DConfig()):
        self.cfg = cfg
        self.unet = UNet2DCondition(cfg.unet)
        self.vae = AutoencoderKL(cfg.vae)
        self.params = params
        # per-view learned prompt embeddings ([2V, T, D] checkpoint
        # asset `fixed_prompt_embeds_6view`); zeros until loaded
        self.prompt_embeds = np.zeros(
            (2 * cfg.num_views, cfg.prompt_tokens, cfg.prompt_dim),
            np.float32)

    @classmethod
    def init_random(cls, key=None, cfg: Era3DConfig = Era3DConfig()
                    ) -> "Era3DPipeline":
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        nf = 2 * cfg.num_views
        lat = cfg.image_size // 8
        params = {
            "unet": UNet2DCondition(cfg.unet).init(
                k1, jnp.zeros((nf, lat, lat, cfg.unet.in_channels)),
                jnp.zeros((nf,)),
                jnp.zeros((nf, cfg.prompt_tokens, cfg.prompt_dim))
            )["params"],
            "vae": AutoencoderKL(cfg.vae).init(
                k2, jnp.zeros((1, 64, 64, 3)))["params"],
        }
        return cls(params, cfg)

    def set_prompt_embeds(self, embeds):
        self.prompt_embeds = np.asarray(embeds, np.float32)

    @partial(jax.jit, static_argnums=(0, 4, 6))
    def _denoise(self, params, latents, image_latents, num_steps: int,
                 guidance_scale, scheduler_name: str, prompt_embeds):
        cfg = self.cfg
        nf = latents.shape[0]
        sched = schedulers.make_scheduler(scheduler_name, cfg.scheduler,
                                          num_steps)
        img_lat2 = jnp.concatenate(
            [jnp.zeros_like(image_latents), image_latents], axis=0)
        cond2 = jnp.concatenate([jnp.zeros_like(prompt_embeds),
                                 prompt_embeds], axis=0)

        def denoise_fn(x_in, i, t):
            x2 = jnp.concatenate([x_in, x_in], axis=0)
            x2 = jnp.concatenate([x2, img_lat2], axis=-1)
            tvec = jnp.broadcast_to(t, (2 * nf,))
            eps, _ = self.unet.apply({"params": params}, x2, tvec, cond2)
            e_uncond, e_cond = jnp.split(eps, 2, axis=0)
            return e_uncond + guidance_scale * (e_cond - e_uncond)

        return schedulers.sample_loop(sched, denoise_fn,
                                      latents * sched.init_sigma)

    def __call__(self, image, num_inference_steps: int = 40,
                 guidance_scale: float = 3.0, seed: int = 0):
        """image [S, S, 3] in [0,1] → (colors [V, S, S, 3],
        normals [V, S, S, 3])."""
        cfg = self.cfg
        nf = 2 * cfg.num_views
        image = jnp.asarray(image, jnp.float32)
        if image.ndim == 3:
            image = image[None]
        s = cfg.image_size
        if image.shape[1] != s:
            image = jax.image.resize(image, (1, s, s, 3), "bilinear")
        img_lat = self.vae.apply({"params": self.params["vae"]},
                                 image * 2.0 - 1.0,
                                 method=AutoencoderKL.encode)
        img_lat = img_lat * cfg.vae_scaling
        img_lat = jnp.broadcast_to(img_lat, (nf,) + img_lat.shape[1:])
        lh, lw = img_lat.shape[1], img_lat.shape[2]
        noise = jax.random.normal(jax.random.PRNGKey(seed),
                                  (nf, lh, lw, 4))
        out = self._denoise(self.params["unet"], noise, img_lat,
                            int(num_inference_steps),
                            jnp.float32(guidance_scale),
                            getattr(self, "scheduler_name", None)
                            or "DDIMScheduler",
                            jnp.asarray(self.prompt_embeds))
        imgs = self.vae.apply({"params": self.params["vae"]},
                              out / cfg.vae_scaling,
                              method=AutoencoderKL.decode)
        imgs = jnp.clip(imgs * 0.5 + 0.5, 0.0, 1.0)
        normals, colors = jnp.split(imgs, 2, axis=0)
        return colors, normals
