"""Craftsman: MV images → SDF latent-set DDIM diffusion → mesh.

Counterpart of `Gen_3D_Modules/craftsman/` (`systems/shape_diffusion.py`
+ `models/denoisers/simple_denoiser.py` + Michelangelo aligned
autoencoder, `Configs/Craftsman_config.yaml`): a UNet-of-attention
transformer denoiser over [t_token | CLIP-context | 256 latents], DDIM
epsilon sampling (scaled-linear betas), and the shared vecset ShapeVAE
as the Michelangelo decoder (same latent-set shape: 256×64 latents,
width 768, 16 decoder layers, num_freqs 8 WITHOUT π, bias-free qkv).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..clip import CLIPVisionConfig, CLIPVisionEncoder, CLIP_IMAGE_MEAN, \
    CLIP_IMAGE_STD
from ..diffusion import schedulers
from ..diffusion.schedulers import SchedulerConfig
from ..vecset import ShapeVAE, ShapeVAEConfig
from ..vecset.blocks import ResidualAttentionBlock
from ..vecset.vae import decode_volume_auto, grid_to_mesh


@dataclasses.dataclass(frozen=True)
class DenoiserConfig:
    input_channels: int = 64
    n_ctx: int = 256
    width: int = 768
    layers: int = 6
    heads: int = 12
    context_dim: int = 1024
    skip_ln: bool = True


class UNetDiffusionTransformer(nn.Module):
    """simple_denoiser.py:15-77: attention encoder stack → middle →
    decoder stack with concat-linear skips."""
    cfg: DenoiserConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        enc = []
        for i in range(c.layers):
            x = ResidualAttentionBlock(
                c.width, c.heads, qkv_bias=False,
                name=f"encoder_{i}")(x)
            enc.append(x)
        x = ResidualAttentionBlock(c.width, c.heads, qkv_bias=False,
                                   name="middle_block")(x)
        for i in range(c.layers):
            skip = enc.pop()
            x = nn.Dense(c.width, name=f"decoder_{i}_linear")(
                jnp.concatenate([skip, x], axis=-1))
            if c.skip_ln:
                x = nn.LayerNorm(name=f"decoder_{i}_ln")(x)
            x = ResidualAttentionBlock(
                c.width, c.heads, qkv_bias=False,
                name=f"decoder_{i}_resblock")(x)
        return x


class SimpleDenoiser(nn.Module):
    """simple_denoiser.py:94-188: [t | context | latents] token stream.
    time_proj is the reference MLP (c_fc w→4w, exact gelu, c_proj 4w→w,
    transformers/utils.py:8-21)."""
    cfg: DenoiserConfig

    @nn.compact
    def __call__(self, latents, t, context):
        from ..vecset.blocks import VecMLP
        c = self.cfg
        n = latents.shape[1]
        half = c.width // 2
        freqs = jnp.exp(-np.log(10000.0)
                        * jnp.arange(half, dtype=jnp.float32) / half)
        args = t.astype(jnp.float32)[:, None] * freqs[None]
        temb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], -1)
        temb = VecMLP(c.width, name="time_proj")(temb)[:, None, :]
        ctx = nn.LayerNorm(name="context_ln")(context)
        ctx = nn.Dense(c.width, name="context_embed")(ctx)
        x = nn.Dense(c.width, name="input_proj")(latents)
        x = jnp.concatenate([temb, ctx, x], axis=1)
        x = UNetDiffusionTransformer(c, name="backbone")(x)
        x = nn.LayerNorm(name="ln_post")(x)
        return nn.Dense(c.input_channels, name="output_proj")(x[:, -n:])


# the fixed orbit cameras of BaseEmbedder (conditional_encoders/
# base.py:41-66): front/right/back/left c2w at distance 1
CRAFTSMAN_CAMERAS = np.array([
    [[1, 0, 0, 0], [0, 0, -1, -1], [0, 1, 0, 0], [0, 0, 0, 1]],
    [[0, 0, 1, 1], [1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1]],
    [[-1, 0, 0, 0], [0, 0, 1, 1], [0, 1, 0, 0], [0, 0, 0, 1]],
    [[0, 0, -1, -1], [-1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1]],
], np.float32)


def encode_camera(c2ws):
    """sincos camera embedding (base.py:74-80): [V,4,4] → [V,32]."""
    flat = jnp.asarray(c2ws, jnp.float32).reshape(-1, 16)
    return jnp.concatenate([jnp.sin(flat), jnp.cos(flat)], axis=-1)


@dataclasses.dataclass(frozen=True)
class CraftsmanConfig:
    denoiser: DenoiserConfig = DenoiserConfig()
    vae: ShapeVAEConfig = ShapeVAEConfig(num_latents=256, embed_dim=64,
                                         width=768, heads=12,
                                         num_decoder_layers=16,
                                         qkv_bias=False, num_freqs=8,
                                         include_pi=False,
                                         scale_factor=1.0)
    cond: CLIPVisionConfig = CLIPVisionConfig(modulation_dim=32)
    scheduler: SchedulerConfig = SchedulerConfig(
        beta_start=0.00085, beta_end=0.012,
        beta_schedule="scaled_linear", prediction_type="epsilon")
    num_steps: int = 50
    guidance_scale: float = 7.5
    n_views: int = 4

    @classmethod
    def tiny(cls) -> "CraftsmanConfig":
        return cls(
            denoiser=DenoiserConfig(input_channels=8, n_ctx=16, width=32,
                                    layers=1, heads=2, context_dim=32),
            vae=ShapeVAEConfig(num_latents=16, embed_dim=8, width=32,
                               heads=2, num_decoder_layers=1,
                               qkv_bias=False, num_freqs=8,
                               include_pi=False, scale_factor=1.0),
            cond=CLIPVisionConfig(hidden=32, layers=1, heads=2,
                                  mlp_dim=64, image_size=28, patch=14,
                                  projection_dim=24, modulation_dim=32),
            num_steps=3, n_views=2)


class CraftsmanPipeline:
    def __init__(self, params, cfg: CraftsmanConfig):
        self.cfg = cfg
        self.denoiser = SimpleDenoiser(cfg.denoiser)
        self.vae = ShapeVAE(cfg.vae)
        self.cond_model = CLIPVisionEncoder(cfg.cond)
        self.params = params

    @classmethod
    def init_random(cls, key=None, cfg: Optional[CraftsmanConfig] = None
                    ) -> "CraftsmanPipeline":
        cfg = cfg or CraftsmanConfig()
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        s = cfg.cond.image_size
        nl, ed = cfg.vae.num_latents, cfg.vae.embed_dim
        mod = (jnp.zeros((1, cfg.cond.modulation_dim))
               if cfg.cond.modulation_dim else None)
        params = {
            "cond": CLIPVisionEncoder(cfg.cond).init(
                k1, jnp.zeros((1, s, s, 3)), mod_cond=mod)["params"],
            "denoiser": SimpleDenoiser(cfg.denoiser).init(
                k2, jnp.zeros((1, nl, ed)), jnp.zeros((1,)),
                jnp.zeros((1, cfg.n_views,
                           cfg.denoiser.context_dim)))["params"],
            "vae": ShapeVAE(cfg.vae).init(
                k3, jnp.zeros((1, nl, ed)), jnp.zeros((1, 7, 3)),
                method=ShapeVAE.init_all)["params"],
        }
        return cls(params, cfg)

    @classmethod
    def from_pretrained(cls, path: str, **cfg_overrides
                        ) -> "CraftsmanPipeline":
        from .convert import load_craftsman_ckpt
        return load_craftsman_ckpt(cls, path, **cfg_overrides)

    def encode_cond(self, images):
        """images [V, H, W, 3] in [0,1] → context [1, V·(1+N), D]: all
        CLIP tokens of every view, camera-ModLN conditioned
        (clip_encoder.py:98-137, shape_diffusion.py:329-339)."""
        c = self.cfg
        images = jnp.asarray(images, jnp.float32)
        if images.ndim == 3:
            images = images[None]
        s = c.cond.image_size
        if images.shape[1] != s:
            images = jax.image.resize(
                images, (images.shape[0], s, s, 3), "bicubic")
        images = (images - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
        v = images.shape[0]
        mod = None
        if c.cond.modulation_dim:
            cams = np.resize(CRAFTSMAN_CAMERAS, (v, 4, 4))
            mod = encode_camera(cams)
        tokens, _ = self.cond_model.apply(
            {"params": self.params["cond"]}, images, mod_cond=mod)
        return tokens.reshape(1, -1, tokens.shape[-1])

    @partial(jax.jit, static_argnums=(0, 4, 6))
    def _sample(self, params, cond, noise, num_steps: int,
                guidance_scale, scheduler_name: str = "DDIMScheduler"):
        c = self.cfg
        sched = schedulers.make_scheduler(scheduler_name, c.scheduler,
                                          num_steps)
        cond2 = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)

        def denoise_fn(x_in, i, t):
            x2 = jnp.concatenate([x_in, x_in], axis=0)
            tvec = jnp.broadcast_to(t, (2,))
            eps = self.denoiser.apply({"params": params}, x2, tvec, cond2)
            ec, eu = jnp.split(eps, 2, axis=0)
            return eu + guidance_scale * (ec - eu)

        return schedulers.sample_loop(sched, denoise_fn,
                                      noise * sched.init_sigma)

    def __call__(self, images, seed: int = 0,
                 num_steps: Optional[int] = None,
                 guidance_scale: Optional[float] = None,
                 octree_resolution: int = 256,
                 num_chunks: int = 65536) -> List:
        c = self.cfg
        cond = self.encode_cond(images)
        noise = jax.random.normal(
            jax.random.PRNGKey(seed),
            (1, c.vae.num_latents, c.vae.embed_dim))
        gs = (guidance_scale if guidance_scale is not None
              else c.guidance_scale)
        latents = self._sample(self.params["denoiser"], cond, noise,
                               num_steps or c.num_steps,
                               jnp.float32(gs),
                               getattr(self, "scheduler_name", None)
                               or "DDIMScheduler")
        decoded = self.vae.apply({"params": self.params["vae"]}, latents)

        def q(params, dec, pts):
            return self.vae.apply({"params": params}, dec, pts,
                                  method=ShapeVAE.query)

        grids = decode_volume_auto(q, self.params["vae"], decoded,
                              mesh=getattr(self, "mesh", None),
                              octree_resolution=octree_resolution,
                              num_chunks=num_chunks)
        return [grid_to_mesh(g) for g in np.asarray(grids, np.float32)]
