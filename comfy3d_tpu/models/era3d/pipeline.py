"""Era3D: single image → 6 views RGB + normals at 512² with row-wise
("epipolar") multiview attention.

Counterpart of `Gen_3D_Modules/Era3D/mvdiffusion/pipelines/
pipeline_mvdiffusion_unclip.py` + `models/transformer_mv2d_self_rowwise
.py` on the shared SD-UNet substrate. Faithful structure:

  * per-block attn1 = per-frame cross-domain joint self-attention,
    plus a separate attn_mv doing row-wise attention across views
    within each domain (linear in view count — the trick that makes
    512² MV denoising tractable);
  * unCLIP conditioning: CLIP image embedding normalized → noised at
    `noise_level` → concat with the noise-level timestep embedding →
    projection class embedding added to the time embedding
    (pipeline_mvdiffusion_unclip.py:208-254);
  * in-network pose regression: elevation/focal regressed from pooled
    mid features, sin|cos → camera MLP → re-conditions the up path
    (unet_mv2d_condition.py:1162-1192);
  * per-view fixed prompt embeddings (normal/color domains), CFG batch
    layout [uncond_normal, cond_normal, uncond_color, cond_color];
  * the input image's VAE latent concatenated on channels (cond halves
    only).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import schedulers
from ..diffusion.schedulers import SchedulerConfig
from ..diffusion.unet import (UNet2DCondition, UNetConfig,
                              timestep_embedding)
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
    # unCLIP class embedding: [noised image embeds | noise-level emb]
    clip_embed_dim: int = 1024
    regress_blocks: int = 3          # 0 → no pose regression heads
    noise_level: int = 0


class TimestepEmbedMLP(nn.Module):
    """diffusers TimestepEmbedding: Dense-SiLU-Dense."""
    hidden: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden, name="linear_1")(x)
        return nn.Dense(self.hidden, name="linear_2")(nn.silu(h))


class ResidualLiner(nn.Module):
    """Era3D pose regressor (unet_mv2d_condition.py:109-129)."""
    out_features: int
    dim: int
    num_block: int

    @nn.compact
    def __call__(self, x):
        h = nn.silu(nn.Dense(self.dim, name="linear_in_0")(x))
        for i in range(self.num_block):
            r = nn.Dense(self.dim, name=f"blocks_{i}_linear1")(h)
            r = nn.Dense(self.dim, name=f"blocks_{i}_linear2")(
                nn.silu(r))
            h = nn.silu(h + r)
        return nn.Dense(self.out_features, name="linear_out")(h)


def ddpm_alphas_cumprod(num_train_timesteps=1000,
                        schedule="squaredcos_cap_v2",
                        beta_start=0.0001, beta_end=0.02):
    """alphas_cumprod table for the image-noising scheduler."""
    if schedule == "squaredcos_cap_v2":
        def f(t):
            return np.cos((t / num_train_timesteps + 0.008)
                          / 1.008 * np.pi / 2) ** 2
        ts = np.arange(num_train_timesteps)
        betas = np.minimum(1.0 - f(ts + 1) / f(ts), 0.999)
    elif schedule == "scaled_linear":
        betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                            num_train_timesteps) ** 2
    else:
        betas = np.linspace(beta_start, beta_end, num_train_timesteps)
    return np.cumprod(1.0 - betas)


class Era3DPipeline:
    def __init__(self, params, cfg: Era3DConfig = Era3DConfig()):
        self.cfg = cfg
        self.unet = UNet2DCondition(cfg.unet)
        self.vae = AutoencoderKL(cfg.vae)
        td = cfg.unet.block_out_channels[0] * 4
        self.class_mlp = TimestepEmbedMLP(td)
        self.camera_mlp = TimestepEmbedMLP(td)
        if cfg.regress_blocks > 0:
            mid_c = cfg.unet.block_out_channels[-1]
            self.ele_reg = ResidualLiner(1, 1280, cfg.regress_blocks)
            self.focal_reg = ResidualLiner(1, 1280, cfg.regress_blocks)
            self._regress_in = 2 * mid_c
        self.params = params
        # per-view learned prompt embeddings ([2V, T, D]: normal-domain
        # views then color-domain views; checkpoint asset
        # `fixed_prompt_embeds_6view`); zeros until loaded
        self.prompt_embeds = np.zeros(
            (2 * cfg.num_views, cfg.prompt_tokens, cfg.prompt_dim),
            np.float32)
        # unCLIP image normalizer statistics (image_normalizer/)
        self.normalizer_mean = np.zeros((cfg.clip_embed_dim,),
                                        np.float32)
        self.normalizer_std = np.ones((cfg.clip_embed_dim,), np.float32)
        self.noising_alphas = ddpm_alphas_cumprod()
        self.vision_encoder = None   # image [B,H,W,3] → projected [B,D]

    @classmethod
    def init_random(cls, key=None, cfg: Era3DConfig = Era3DConfig()
                    ) -> "Era3DPipeline":
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
        nf = 2 * cfg.num_views
        lat = cfg.image_size // 8
        td = cfg.unet.block_out_channels[0] * 4
        params = {
            "unet": UNet2DCondition(cfg.unet).init(
                k1, jnp.zeros((2 * nf, lat, lat, cfg.unet.in_channels)),
                jnp.zeros((2 * nf,)),
                jnp.zeros((2 * nf, cfg.prompt_tokens, cfg.prompt_dim)),
                class_emb=jnp.zeros((2 * nf, td)))["params"],
            "vae": AutoencoderKL(cfg.vae).init(
                k2, jnp.zeros((1, 64, 64, 3)))["params"],
            "class_mlp": TimestepEmbedMLP(td).init(
                k3, jnp.zeros((1, 2 * cfg.clip_embed_dim)))["params"],
            "camera_mlp": TimestepEmbedMLP(td).init(
                k4, jnp.zeros((1, 4)))["params"],
        }
        if cfg.regress_blocks > 0:
            mid_c = cfg.unet.block_out_channels[-1]
            params["elevation_reg"] = ResidualLiner(
                1, 1280, cfg.regress_blocks).init(
                k5, jnp.zeros((1, 2 * mid_c)))["params"]
            params["focal_reg"] = ResidualLiner(
                1, 1280, cfg.regress_blocks).init(
                k6, jnp.zeros((1, 2 * mid_c)))["params"]
        return cls(params, cfg)

    @classmethod
    def from_pretrained(cls, path: str,
                        **cfg_overrides) -> "Era3DPipeline":
        from .convert import load_era3d_dir
        return load_era3d_dir(cls, path, **cfg_overrides)

    def set_prompt_embeds(self, embeds):
        self.prompt_embeds = np.asarray(embeds, np.float32)

    def set_vision_encoder(self, fn):
        self.vision_encoder = fn

    # -------------------------------------------------------------- #
    def _noise_image_embeddings(self, embeds, key):
        """StableUnCLIP image-embedding noising
        (pipeline_mvdiffusion_unclip.py:333-380): normalize → DDPM
        noise at noise_level → unnormalize → concat the noise-level
        timestep embedding."""
        cfg = self.cfg
        lvl = cfg.noise_level
        mean = jnp.asarray(self.normalizer_mean)
        std = jnp.asarray(self.normalizer_std)
        x = (embeds - mean) / std
        ac = float(self.noising_alphas[lvl])
        noise = jax.random.normal(key, x.shape)
        x = np.sqrt(ac) * x + np.sqrt(1.0 - ac) * noise
        x = x * std + mean
        lvl_emb = timestep_embedding(
            jnp.full((x.shape[0],), lvl, jnp.float32),
            cfg.clip_embed_dim)
        return jnp.concatenate([x, lvl_emb], axis=-1)

    def _pose_hook(self, params):
        """Returns the UNet pose_hook: pooled mid features → elevation
        + focal regression → sincos → camera MLP → new up-path temb."""
        if self.cfg.regress_blocks <= 0:
            return None
        v = self.cfg.num_views

        def hook(h, temb):
            pool = h.mean(axis=(1, 2))            # [4V, C]
            half = pool.shape[0] // 2
            pool2 = jnp.concatenate([pool[:half], pool[half:]],
                                    axis=-1)      # [2V, 2C]
            ele = self.ele_reg.apply(
                {"params": params["elevation_reg"]}, pool2)
            focal = self.focal_reg.apply(
                {"params": params["focal_reg"]}, pool2)
            ele = ele.reshape(-1, v, 1).mean(axis=1)      # [2, 1]
            focal = focal.reshape(-1, v, 1).mean(axis=1)  # [2, 1]
            pose = jnp.concatenate([ele, focal], axis=-1)
            pose_emb = self.camera_mlp.apply(
                {"params": params["camera_mlp"]},
                jnp.concatenate([jnp.sin(pose), jnp.cos(pose)],
                                axis=-1))
            pose_emb = jnp.repeat(pose_emb, v, axis=0)    # [2V]
            pose_emb = jnp.concatenate([pose_emb, pose_emb])
            return temb + pose_emb, (ele, focal)

        return hook

    @partial(jax.jit, static_argnums=(0, 5, 7))
    def _denoise(self, params, latents, image_latents, class_emb,
                 num_steps: int, guidance_scale,
                 scheduler_name: str, prompt_embeds):
        """Batch layout everywhere: [uncond_normal(V), cond_normal(V),
        uncond_color(V), cond_color(V)]."""
        cfg = self.cfg
        v = cfg.num_views
        nf = 2 * v
        sched = schedulers.make_scheduler(scheduler_name, cfg.scheduler,
                                          num_steps)
        zero = jnp.zeros_like(image_latents)
        img_lat4 = jnp.concatenate(
            [zero, image_latents, zero, image_latents], axis=0)
        hook = self._pose_hook(params)

        def expand(x_in):
            n, c = jnp.split(x_in, 2, axis=0)
            return jnp.concatenate([n, n, c, c], axis=0)

        def denoise_fn(x_in, i, t):
            x4 = expand(x_in)
            x4 = jnp.concatenate([x4, img_lat4], axis=-1)
            tvec = jnp.broadcast_to(t, (2 * nf,))
            eps, _ = self.unet.apply(
                {"params": params["unet"]}, x4, tvec, prompt_embeds,
                class_emb=class_emb, pose_hook=hook)
            un_n, co_n, un_c, co_c = jnp.split(eps, 4, axis=0)
            e_un = jnp.concatenate([un_n, un_c], axis=0)
            e_co = jnp.concatenate([co_n, co_c], axis=0)
            return e_un + guidance_scale * (e_co - e_un)

        return schedulers.sample_loop(sched, denoise_fn,
                                      latents * sched.init_sigma)

    def __call__(self, image, num_inference_steps: int = 40,
                 guidance_scale: float = 3.0, seed: int = 0):
        """image [S, S, 3] in [0,1] → (colors [V, S, S, 3],
        normals [V, S, S, 3])."""
        cfg = self.cfg
        v = cfg.num_views
        nf = 2 * v
        key = jax.random.PRNGKey(seed)
        image = jnp.asarray(image, jnp.float32)
        if image.ndim == 3:
            image = image[None]
        s = cfg.image_size
        if image.shape[1] != s:
            image = jax.image.resize(image, (1, s, s, 3), "bilinear")
        img_lat = self.vae.apply({"params": self.params["vae"]},
                                 image * 2.0 - 1.0,
                                 method=AutoencoderKL.encode)
        # one copy per view; _denoise lays out [0, lat, 0, lat] over the
        # [u_n, c_n, u_c, c_c] batch
        img_lat = jnp.broadcast_to(img_lat, (v,) + img_lat.shape[1:])

        # unCLIP class embedding: [u_n, c_n, u_c, c_c] × V
        td = cfg.unet.block_out_channels[0] * 4
        if self.vision_encoder is not None:
            key, k_noise = jax.random.split(key)
            embeds = self.vision_encoder(image)          # [1, 1024]
            lab_pos = self._noise_image_embeddings(embeds, k_noise)
            lab_neg = jnp.zeros_like(lab_pos)
            ce = self.class_mlp.apply
            pos = ce({"params": self.params["class_mlp"]}, lab_pos)
            neg = ce({"params": self.params["class_mlp"]}, lab_neg)
            class_emb = jnp.concatenate([
                jnp.tile(neg, (v, 1)), jnp.tile(pos, (v, 1)),
                jnp.tile(neg, (v, 1)), jnp.tile(pos, (v, 1))], axis=0)
        else:
            class_emb = jnp.zeros((2 * nf, td))

        # fixed per-view prompt embeds: [n(V), c(V)] → [n, n, c, c]
        pe = jnp.asarray(self.prompt_embeds)
        pe_n, pe_c = jnp.split(pe, 2, axis=0)
        prompt4 = jnp.concatenate([pe_n, pe_n, pe_c, pe_c], axis=0)

        lh, lw = img_lat.shape[1], img_lat.shape[2]
        key, k_init = jax.random.split(key)
        noise = jax.random.normal(k_init, (nf, lh, lw, 4))
        out = self._denoise(self.params, noise, img_lat, class_emb,
                            int(num_inference_steps),
                            jnp.float32(guidance_scale),
                            getattr(self, "scheduler_name", None)
                            or "DDIMScheduler", prompt4)
        imgs = self.vae.apply({"params": self.params["vae"]}, out,
                              method=AutoencoderKL.decode)
        imgs = jnp.clip(imgs * 0.5 + 0.5, 0.0, 1.0)
        normals, colors = jnp.split(imgs, 2, axis=0)
        return colors, normals
