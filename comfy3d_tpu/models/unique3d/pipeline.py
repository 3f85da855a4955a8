"""Unique3D custom diffusion pipelines (image→4 views, image→normal).

Counterparts of `Gen_3D_Modules/Unique3D/custum_3d_diffusion/`:
`StableDiffusionImage2MVCustomPipeline` /
`StableDiffusionImageCustomPipeline` built by the unifield processor
(`custum_modules/unifield_processor.py`) from
`Configs/Unique3D_configs/image2mvimage.yaml` / `image2normal.yaml`:

* image2mvimage — SD1.5-class UNet with joint multiview self-attention
  (`use_mv_joint_attn`, our `mv_views=4`), the condition image's VAE
  latent concatenated on input channels (`cat_condition`, in=8), and a
  class embedding over view labels [0..3] (`init_num_cls_label: 8`).
* image2normal — single-view img2img with pixel-wise reference
  attention (`self_attn_ref_pixel_wise_crosspond`, our ref write/read)
  and cat_condition.

Both condition through the CLIP-vision image embedding slot
(sd-image-variations style: the encoder is pluggable; zeros until set).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import schedulers
from ..diffusion.schedulers import SchedulerConfig
from ..diffusion.unet import UNet2DCondition, UNetConfig
from ..diffusion.vae import AutoencoderKL, VAEConfig


@dataclasses.dataclass(frozen=True)
class Unique3DMVConfig:
    image_size: int = 256
    num_views: int = 4
    num_cls: int = 8                  # init_num_cls_label
    prompt_tokens: int = 1            # single image-variation token
    prompt_dim: int = 768
    unet: UNetConfig = UNetConfig(
        in_channels=8, out_channels=4, cross_attention_dim=768,
        attention_head_dim=-8, mv_views=4)
    vae: VAEConfig = VAEConfig()
    scheduler: SchedulerConfig = SchedulerConfig()
    vae_scaling: float = 0.18215


@dataclasses.dataclass(frozen=True)
class Unique3DNormalConfig:
    image_size: int = 512
    prompt_tokens: int = 1
    prompt_dim: int = 768
    unet: UNetConfig = UNetConfig(
        in_channels=8, out_channels=4, cross_attention_dim=768,
        attention_head_dim=-8)
    vae: VAEConfig = VAEConfig()
    scheduler: SchedulerConfig = SchedulerConfig()
    vae_scaling: float = 0.18215


class _ClsEmbed(nn.Module):
    """nn.Embedding(num_cls, time_embed_dim) — the view-label class
    embedding the unifield processor initializes."""
    num_cls: int
    dim: int

    @nn.compact
    def __call__(self, labels):
        table = self.param("embedding", nn.initializers.normal(0.02),
                           (self.num_cls, self.dim))
        return table[labels]


class Unique3DImage2MVPipeline:
    def __init__(self, params, cfg: Unique3DMVConfig = Unique3DMVConfig()):
        self.cfg = cfg
        self.unet = UNet2DCondition(cfg.unet)
        self.vae = AutoencoderKL(cfg.vae)
        self.cls_embed = _ClsEmbed(cfg.num_cls,
                                   cfg.unet.block_out_channels[0] * 4)
        self.params = params
        self.vision_encoder = None     # image [B,H,W,3] → [B, D]

    @classmethod
    def init_random(cls, key=None,
                    cfg: Unique3DMVConfig = Unique3DMVConfig()
                    ) -> "Unique3DImage2MVPipeline":
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        v = cfg.num_views
        lat = cfg.image_size // 8
        params = {
            "unet": UNet2DCondition(cfg.unet).init(
                k1, jnp.zeros((v, lat, lat, cfg.unet.in_channels)),
                jnp.zeros((v,)),
                jnp.zeros((v, cfg.prompt_tokens, cfg.prompt_dim))
            )["params"],
            "vae": AutoencoderKL(cfg.vae).init(
                k2, jnp.zeros((1, 64, 64, 3)))["params"],
            "cls": _ClsEmbed(cfg.num_cls,
                             cfg.unet.block_out_channels[0] * 4).init(
                k3, jnp.zeros((v,), jnp.int32))["params"],
        }
        return cls(params, cfg)

    @classmethod
    def from_pretrained(cls, path: str, **cfg_overrides
                        ) -> "Unique3DImage2MVPipeline":
        from .convert import load_image2mv_dir
        return load_image2mv_dir(cls, path, **cfg_overrides)

    def set_vision_encoder(self, fn):
        self.vision_encoder = fn

    @partial(jax.jit, static_argnums=(0, 4, 6))
    def _denoise(self, params, latents, img_lat, num_steps: int,
                 guidance_scale, scheduler_name: str, cond):
        cfg = self.cfg
        v = cfg.num_views
        sched = schedulers.make_scheduler(scheduler_name, cfg.scheduler,
                                          num_steps)
        labels = jnp.arange(v) % cfg.num_cls
        cls_emb = self.cls_embed.apply({"params": params["cls"]}, labels)
        cls2 = jnp.concatenate([cls_emb, cls_emb], axis=0)
        img2 = jnp.concatenate([jnp.zeros_like(img_lat), img_lat], 0)
        cond2 = jnp.concatenate([jnp.zeros_like(cond), cond], axis=0)

        def denoise_fn(x_in, i, t):
            x2 = jnp.concatenate([x_in, x_in], axis=0)
            x2 = jnp.concatenate([x2, img2], axis=-1)
            tvec = jnp.broadcast_to(t, (2 * v,))
            eps, _ = self.unet.apply({"params": params["unet"]}, x2,
                                     tvec, cond2, class_emb=cls2)
            e_u, e_c = jnp.split(eps, 2, axis=0)
            return e_u + guidance_scale * (e_c - e_u)

        return schedulers.sample_loop(sched, denoise_fn,
                                      latents * sched.init_sigma)

    def __call__(self, image, num_inference_steps: int = 30,
                 guidance_scale: float = 1.5, seed: int = 1145,
                 image_resolution: int | None = None):
        """image [S, S, 3] in [0,1] (white bg) → views [V, S, S, 3]."""
        cfg = self.cfg
        v = cfg.num_views
        s = image_resolution or cfg.image_size
        image = jnp.asarray(image, jnp.float32)
        if image.ndim == 3:
            image = image[None]
        if image.shape[1] != s:
            image = jax.image.resize(image, (1, s, s, 3), "bilinear")
        img_lat = self.vae.apply({"params": self.params["vae"]},
                                 image * 2.0 - 1.0,
                                 method=AutoencoderKL.encode)
        img_lat = img_lat * cfg.vae_scaling
        img_lat = jnp.broadcast_to(img_lat, (v,) + img_lat.shape[1:])
        if self.vision_encoder is not None:
            emb = self.vision_encoder(image)[:, None, :]
        else:
            emb = jnp.zeros((1, cfg.prompt_tokens, cfg.prompt_dim))
        cond = jnp.broadcast_to(
            emb, (v, cfg.prompt_tokens, cfg.prompt_dim))
        lh, lw = img_lat.shape[1], img_lat.shape[2]
        noise = jax.random.normal(jax.random.PRNGKey(seed),
                                  (v, lh, lw, 4))
        out = self._denoise(self.params, noise, img_lat,
                            int(num_inference_steps),
                            jnp.float32(guidance_scale),
                            getattr(self, "scheduler_name", None)
                            or "EulerAncestralDiscreteScheduler", cond)
        imgs = self.vae.apply({"params": self.params["vae"]},
                              out / cfg.vae_scaling,
                              method=AutoencoderKL.decode)
        return jnp.clip(imgs * 0.5 + 0.5, 0.0, 1.0)


class Unique3DImage2NormalPipeline:
    def __init__(self, params,
                 cfg: Unique3DNormalConfig = Unique3DNormalConfig()):
        self.cfg = cfg
        self.unet = UNet2DCondition(cfg.unet)
        self.vae = AutoencoderKL(cfg.vae)
        self.params = params
        self.vision_encoder = None

    @classmethod
    def init_random(cls, key=None,
                    cfg: Unique3DNormalConfig = Unique3DNormalConfig()
                    ) -> "Unique3DImage2NormalPipeline":
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        lat = cfg.image_size // 8
        params = {
            "unet": UNet2DCondition(cfg.unet).init(
                k1, jnp.zeros((1, lat, lat, cfg.unet.in_channels)),
                jnp.zeros((1,)),
                jnp.zeros((1, cfg.prompt_tokens, cfg.prompt_dim))
            )["params"],
            "vae": AutoencoderKL(cfg.vae).init(
                k2, jnp.zeros((1, 64, 64, 3)))["params"],
        }
        return cls(params, cfg)

    @classmethod
    def from_pretrained(cls, path: str, **cfg_overrides
                        ) -> "Unique3DImage2NormalPipeline":
        from .convert import load_image2normal_dir
        return load_image2normal_dir(cls, path, **cfg_overrides)

    def set_vision_encoder(self, fn):
        self.vision_encoder = fn

    @partial(jax.jit, static_argnums=(0, 4, 6))
    def _denoise(self, params, latents, img_lat, num_steps: int,
                 guidance_scale, scheduler_name: str, cond):
        cfg = self.cfg
        sched = schedulers.make_scheduler(scheduler_name, cfg.scheduler,
                                          num_steps)
        img2 = jnp.concatenate([jnp.zeros_like(img_lat), img_lat], 0)
        cond2 = jnp.concatenate([jnp.zeros_like(cond), cond], axis=0)

        def denoise_fn(x_in, i, t):
            # reference write pass: the (clean) condition latent runs
            # through the UNet recording every self-attn's hidden
            # states (pixel-wise crosspond reads them back)
            t1 = jnp.broadcast_to(t, (2,))
            _, written = self.unet.apply(
                {"params": params["unet"]},
                jnp.concatenate([img2, img2], axis=-1), t1, cond2,
                ref_mode="write")
            x2 = jnp.concatenate([x_in, x_in], axis=0)
            x2 = jnp.concatenate([x2, img2], axis=-1)
            eps, _ = self.unet.apply(
                {"params": params["unet"]}, x2, t1, cond2,
                ref_mode="read", ref_hidden=written)
            e_u, e_c = jnp.split(eps, 2, axis=0)
            return e_u + guidance_scale * (e_c - e_u)

        return schedulers.sample_loop(sched, denoise_fn,
                                      latents * sched.init_sigma)

    def __call__(self, image, num_inference_steps: int = 30,
                 guidance_scale: float = 1.5, seed: int = 0):
        """image [S, S, 3] in [0,1] → predicted normal map
        [1, S, S, 3] in [0,1] grid colors."""
        cfg = self.cfg
        s = cfg.image_size
        image = jnp.asarray(image, jnp.float32)
        if image.ndim == 3:
            image = image[None]
        if image.shape[1] != s:
            image = jax.image.resize(image, (1, s, s, 3), "bilinear")
        img_lat = self.vae.apply({"params": self.params["vae"]},
                                 image * 2.0 - 1.0,
                                 method=AutoencoderKL.encode)
        img_lat = img_lat * cfg.vae_scaling
        if self.vision_encoder is not None:
            cond = self.vision_encoder(image)[:, None, :]
        else:
            cond = jnp.zeros((1, cfg.prompt_tokens, cfg.prompt_dim))
        lh, lw = img_lat.shape[1], img_lat.shape[2]
        noise = jax.random.normal(jax.random.PRNGKey(seed),
                                  (1, lh, lw, 4))
        out = self._denoise(self.params, noise, img_lat,
                            int(num_inference_steps),
                            jnp.float32(guidance_scale),
                            getattr(self, "scheduler_name", None)
                            or "EulerAncestralDiscreteScheduler", cond)
        imgs = self.vae.apply({"params": self.params["vae"]},
                              out / cfg.vae_scaling,
                              method=AutoencoderKL.decode)
        return jnp.clip(imgs * 0.5 + 0.5, 0.0, 1.0)
