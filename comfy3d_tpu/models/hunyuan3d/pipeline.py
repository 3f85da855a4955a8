"""Hunyuan3D-V2 shape generation: image → latent set → SDF grid → mesh.

Counterpart of the reference `Hunyuan3DDiTFlowMatchingPipeline`
(`Gen_3D_Modules/Hunyuan3D_V2/hy3dgen/shapegen/pipelines.py:690-766`) on
the vecset substrate: DINOv2 conditioning (conditioner.py:127), the
double/single-stream flow DiT, flow-match Euler sigmas, ShapeVAE decode,
dense volume decode and marching-tets surface extraction.

TPU design: the whole denoising loop is ONE jitted `lax.scan` over the
sigma schedule (the reference loops in Python per step); CFG rides a
batch axis of 2. Volume decode sweeps a static chunk axis with lax.map
(vae.py), so a device mesh can shard it without retracing.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..dinov2 import (Dinov2, Dinov2Config, IMAGENET_MEAN, IMAGENET_STD,
                      convert_dinov2)
from ..vecset import (DiTConfig, Hunyuan3DDiT, ShapeVAE, ShapeVAEConfig,
                      flow_match_sigmas)
from ..vecset.convert import convert_dit, convert_shape_vae
from ..vecset.vae import decode_volume_auto, grid_to_mesh
from .. import convert as C


@dataclasses.dataclass(frozen=True)
class Hunyuan3DShapeConfig:
    dit: DiTConfig = DiTConfig()
    vae: ShapeVAEConfig = ShapeVAEConfig()
    cond: Dinov2Config = Dinov2Config(hidden=1536, layers=40, heads=24,
                                      use_swiglu=True)   # dinov2-giant
    image_size: int = 224
    guidance_scale: float = 5.0
    num_steps: int = 30
    shift: float = 1.0

    @classmethod
    def tiny(cls) -> "Hunyuan3DShapeConfig":
        """Test-scale config (structure-faithful, tiny dims)."""
        return cls(
            dit=DiTConfig(in_channels=8, context_in_dim=32, hidden_size=64,
                          num_heads=4, depth=1, depth_single_blocks=2),
            vae=ShapeVAEConfig(num_latents=16, embed_dim=8, width=64,
                               heads=4, num_decoder_layers=1),
            cond=Dinov2Config(hidden=32, layers=1, heads=2, patch=14,
                              pretrain_image_size=28),
            image_size=28, num_steps=4)


class Hunyuan3DShapePipeline:
    def __init__(self, params: dict, cfg: Hunyuan3DShapeConfig):
        self.cfg = cfg
        self.dit = Hunyuan3DDiT(cfg.dit)
        self.vae = ShapeVAE(cfg.vae)
        self.cond_model = Dinov2(cfg.cond)
        self.params = params

    # -------------------------------------------------------------- #
    @classmethod
    def init_random(cls, key=None,
                    cfg: Optional[Hunyuan3DShapeConfig] = None
                    ) -> "Hunyuan3DShapePipeline":
        cfg = cfg or Hunyuan3DShapeConfig()
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        s = cfg.image_size
        nl, ed = cfg.vae.num_latents, cfg.vae.embed_dim
        params = {
            "cond": Dinov2(cfg.cond).init(
                k1, jnp.zeros((1, s, s, 3)))["params"],
            "dit": Hunyuan3DDiT(cfg.dit).init(
                k2, jnp.zeros((1, nl, ed)), jnp.zeros((1,)),
                jnp.zeros((1, 5, cfg.dit.context_in_dim)),
                guidance=(jnp.zeros((1,)) if cfg.dit.guidance_embed
                          else None))["params"],
            "vae": ShapeVAE(cfg.vae).init(
                k3, jnp.zeros((1, nl, ed)), jnp.zeros((1, 7, 3)),
                method=ShapeVAE.init_all)["params"],
        }
        return cls(params, cfg)

    @classmethod
    def from_pretrained(cls, dit_path: str, vae_path: str,
                        cond_path: Optional[str] = None,
                        cfg: Optional[Hunyuan3DShapeConfig] = None
                        ) -> "Hunyuan3DShapePipeline":
        """Load the public torch checkpoints (model.fp16.safetensors +
        vae, optional DINOv2-giant) per pipelines.py:136-193."""
        cfg = cfg or Hunyuan3DShapeConfig()
        pipe = cls.init_random(cfg=cfg)
        params = jax.tree.map(np.asarray, pipe.params)
        params["dit"] = _merge(params["dit"],
                               convert_dit(C.load_state_dict(dit_path)))
        params["vae"] = _merge(params["vae"], convert_shape_vae(
            C.load_state_dict(vae_path)))
        if cond_path:
            params["cond"] = _merge(params["cond"], convert_dinov2(
                C.load_state_dict(cond_path)))
        pipe.params = jax.tree.map(jnp.asarray, params)
        return pipe

    # -------------------------------------------------------------- #
    def encode_cond(self, image) -> jnp.ndarray:
        """image [B, H, W, 3] in [0,1] → tokens [2B, 1+N, C] with the
        zero unconditional embedding appended (pipelines.py:420-450,
        conditioner.py:107-117)."""
        c = self.cfg
        image = jnp.asarray(image, jnp.float32)
        if image.ndim == 3:
            image = image[None]
        s = c.image_size
        if image.shape[1] != s or image.shape[2] != s:
            image = jax.image.resize(
                image, (image.shape[0], s, s, 3), "bilinear")
        image = (image - IMAGENET_MEAN) / IMAGENET_STD
        cond = self.cond_model.apply({"params": self.params["cond"]},
                                     image)
        if self.cfg.dit.guidance_embed:
            return cond          # distilled: no CFG batch
        uncond = jnp.zeros_like(cond)
        return jnp.concatenate([cond, uncond], axis=0)

    @partial(jax.jit, static_argnums=(0, 5))
    def _sample(self, dit_params, cond, noise, guidance_scale,
                num_steps: int):
        # `self` is static (hashable by id): only cfg/module structure is
        # read from it — weights arrive via dit_params so they are traced
        # arguments, not baked-in constants
        sigmas = jnp.asarray(flow_match_sigmas(num_steps, self.cfg.shift))
        distilled = self.cfg.dit.guidance_embed

        def step(x, i):
            if distilled:
                # guidance-distilled (-turbo): guidance rides an
                # embedding, no CFG batch (pipelines.py:704-707,730-734)
                t = jnp.broadcast_to(sigmas[i], (x.shape[0],))
                g = jnp.broadcast_to(guidance_scale, (x.shape[0],))
                v = self.dit.apply({"params": dit_params}, x, t, cond,
                                   guidance=g)
            else:
                x2 = jnp.concatenate([x, x], axis=0)
                t = jnp.broadcast_to(sigmas[i], (x2.shape[0],))
                v = self.dit.apply({"params": dit_params}, x2, t, cond)
                v_cond, v_uncond = jnp.split(v, 2, axis=0)
                v = v_uncond + guidance_scale * (v_cond - v_uncond)
            return x + (sigmas[i + 1] - sigmas[i]) * v, None

        x, _ = jax.lax.scan(step, noise, jnp.arange(num_steps))
        return x

    def sample_latents(self, image, seed: int = 0,
                       num_steps: Optional[int] = None,
                       guidance_scale: Optional[float] = None):
        c = self.cfg
        cond = self.encode_cond(image)
        b = (cond.shape[0] if c.dit.guidance_embed
             else cond.shape[0] // 2)
        noise = jax.random.normal(
            jax.random.PRNGKey(seed),
            (b, c.vae.num_latents, c.vae.embed_dim))
        gs = (guidance_scale if guidance_scale is not None
              else c.guidance_scale)
        return self._sample(self.params["dit"], cond, noise,
                            jnp.float32(gs), num_steps or c.num_steps)

    def latents_to_mesh(self, latents, octree_resolution: int = 256,
                        bounds: float = 1.01, mc_level: float = 0.0,
                        num_chunks: int = 65536):
        """latents [B, N, E] → list of Mesh (pipelines.py:658-687:
        1/scale_factor, vae decode, latents2mesh)."""
        c = self.cfg
        latents = latents / c.vae.scale_factor
        decoded = self.vae.apply({"params": self.params["vae"]}, latents)

        def q(params, dec, pts):
            return self.vae.apply({"params": params}, dec, pts,
                                  method=ShapeVAE.query)

        grids = decode_volume_auto(q, self.params["vae"], decoded,
                              mesh=getattr(self, "mesh", None),
                              octree_resolution=octree_resolution,
                              bounds=bounds, num_chunks=num_chunks)
        return [grid_to_mesh(g, bounds=bounds, mc_level=mc_level)
                for g in np.asarray(grids, np.float32)]

    def __call__(self, image, seed: int = 0,
                 num_steps: Optional[int] = None,
                 guidance_scale: Optional[float] = None,
                 octree_resolution: int = 256, num_chunks: int = 65536):
        latents = self.sample_latents(image, seed, num_steps,
                                      guidance_scale)
        return self.latents_to_mesh(latents,
                                    octree_resolution=octree_resolution,
                                    num_chunks=num_chunks)


def _merge(dst, src):
    for k, v in src.items():
        if isinstance(v, dict):
            dst[k] = _merge(dst.get(k, {}), v)
        else:
            dst[k] = v
    return dst
