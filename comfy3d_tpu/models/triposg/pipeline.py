"""TripoSG: image → mesh via rectified-flow latent-set diffusion.

Counterpart of `Gen_3D_Modules/TripoSG/pipelines/pipeline_triposg.py`:
DINOv2 conditioning (encode_image:140-151, uncond = zeros) → UNet-skip
DiT flow sampling (RectifiedFlowScheduler semantics,
schedulers/scheduling_rectified_flow.py:160-210: σ shifted by
s·σ/(1+(s−1)σ), t = 1000σ, x ← x + (σ_next − σ)·v) → TripoSG latent-set
VAE (vae.py here) → SDF grid → marching tets.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..dinov2 import Dinov2, Dinov2Config, IMAGENET_MEAN, IMAGENET_STD
from ..vecset.vae import decode_volume_auto, grid_to_mesh
from .dit import TripoSGDiT, TripoSGDiTConfig
from .vae import TripoSGVAE, TripoSGVAEConfig


@dataclasses.dataclass(frozen=True)
class TripoSGConfig:
    dit: TripoSGDiTConfig = TripoSGDiTConfig()
    vae: TripoSGVAEConfig = TripoSGVAEConfig()
    cond: Dinov2Config = Dinov2Config(hidden=1024, layers=24, heads=16)
    image_size: int = 518
    num_steps: int = 50
    guidance_scale: float = 7.0
    shift: float = 1.0

    @classmethod
    def tiny(cls) -> "TripoSGConfig":
        return cls(
            dit=TripoSGDiTConfig(width=32, in_channels=8, num_layers=3,
                                 heads=2, cross_attention_dim=32),
            vae=TripoSGVAEConfig(latent_channels=8, num_latents=16,
                                 heads=2, width_encoder=16,
                                 width_decoder=32, num_layers_encoder=1,
                                 num_layers_decoder=1),
            cond=Dinov2Config(hidden=32, layers=1, heads=2, patch=14,
                              pretrain_image_size=28),
            image_size=28, num_steps=3)


class TripoSGPipeline:
    def __init__(self, params, cfg: TripoSGConfig):
        self.cfg = cfg
        self.dit = TripoSGDiT(cfg.dit)
        self.vae = TripoSGVAE(cfg.vae)
        self.cond_model = Dinov2(cfg.cond)
        self.params = params

    @classmethod
    def init_random(cls, key=None, cfg: Optional[TripoSGConfig] = None
                    ) -> "TripoSGPipeline":
        cfg = cfg or TripoSGConfig()
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        s = cfg.image_size
        nl, ed = cfg.vae.num_latents, cfg.vae.latent_channels
        params = {
            "cond": Dinov2(cfg.cond).init(
                k1, jnp.zeros((1, s, s, 3)))["params"],
            "dit": TripoSGDiT(cfg.dit).init(
                k2, jnp.zeros((1, nl, cfg.dit.in_channels)),
                jnp.zeros((1,)),
                jnp.zeros((1, 5, cfg.dit.cross_attention_dim)))["params"],
            "vae": TripoSGVAE(cfg.vae).init(
                k3, jnp.zeros((1, nl, ed)), jnp.zeros((1, 7, 3)),
                method=TripoSGVAE.init_all)["params"],
        }
        return cls(params, cfg)

    @classmethod
    def from_pretrained(cls, path: str, **cfg_overrides
                        ) -> "TripoSGPipeline":
        from .convert import load_triposg_dir
        return load_triposg_dir(cls, path, **cfg_overrides)

    def encode_cond(self, image):
        c = self.cfg
        image = jnp.asarray(image, jnp.float32)
        if image.ndim == 3:
            image = image[None]
        s = c.image_size
        if image.shape[1] != s or image.shape[2] != s:
            image = jax.image.resize(image,
                                     (image.shape[0], s, s, 3), "bilinear")
        image = (image - IMAGENET_MEAN) / IMAGENET_STD
        cond = self.cond_model.apply({"params": self.params["cond"]},
                                     image)
        return jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)

    @partial(jax.jit, static_argnums=(0, 4))
    def _sample(self, dit_params, cond, noise, num_steps: int,
                guidance_scale):
        c = self.cfg
        s = np.linspace(1.0, 0.0, num_steps + 1)
        s = c.shift * s / (1.0 + (c.shift - 1.0) * s)
        sigmas = jnp.asarray(s, jnp.float32)

        def step(x, i):
            x2 = jnp.concatenate([x, x], axis=0)
            t = jnp.broadcast_to(1000.0 * sigmas[i], (x2.shape[0],))
            v = self.dit.apply({"params": dit_params}, x2, t, cond)
            vc, vu = jnp.split(v, 2, axis=0)
            v = vu + guidance_scale * (vc - vu)
            return x + (sigmas[i + 1] - sigmas[i]) * v, None

        x, _ = jax.lax.scan(step, noise, jnp.arange(num_steps))
        return x

    def sample_latents(self, image, seed: int = 0,
                       num_steps: Optional[int] = None,
                       guidance_scale: Optional[float] = None):
        c = self.cfg
        cond = self.encode_cond(image)
        b = cond.shape[0] // 2
        noise = jax.random.normal(
            jax.random.PRNGKey(seed),
            (b, c.vae.num_latents, c.vae.latent_channels))
        gs = (guidance_scale if guidance_scale is not None
              else c.guidance_scale)
        return self._sample(self.params["dit"], cond, noise,
                            num_steps or c.num_steps, jnp.float32(gs))

    def latents_to_mesh(self, latents, octree_resolution: int = 256,
                        bounds: float = 1.005, num_chunks: int = 65536):
        c = self.cfg
        latents = latents / c.vae.scale_factor
        decoded = self.vae.apply({"params": self.params["vae"]}, latents)

        def q(params, dec, pts):
            return self.vae.apply({"params": params}, dec, pts,
                                  method=TripoSGVAE.query)

        grids = decode_volume_auto(q, self.params["vae"], decoded,
                              mesh=getattr(self, "mesh", None),
                              octree_resolution=octree_resolution,
                              bounds=bounds, num_chunks=num_chunks)
        return [grid_to_mesh(g, bounds=bounds)
                for g in np.asarray(grids, np.float32)]

    def __call__(self, image, seed: int = 0,
                 num_steps: Optional[int] = None,
                 guidance_scale: Optional[float] = None,
                 octree_resolution: int = 256, num_chunks: int = 65536):
        latents = self.sample_latents(image, seed, num_steps,
                                      guidance_scale)
        return self.latents_to_mesh(latents, octree_resolution,
                                    num_chunks=num_chunks)
