"""CharacterGen: anime character image → 4 canonical views → mesh.

Counterparts of `Gen_3D_Modules/CharacterGen/character_inference.py`:

* `Inference2D_API` (:81) — a 4-view MV diffusion at non-square
  512×768 ("TuneAVideo" lineage): joint multiview self-attention (our
  `mv_views=4`), per-view flattened 3×4 camera matrices embedded into
  the time embedding, and the reference image injected through a
  second "ref UNet" whose self-attn hidden states feed every denoise
  step — the write/read reference-attention mechanism our UNet
  substrate implements with ONE set of weights.
* `Inference3D_API` (:192) — a 4-view LRM: image tokens + camera
  conditioning → triplane scene code → geometry. Served by the same
  camera-conditioned triplane transformer as Hunyuan3D-V1's SVRM
  (`..hunyuan3d_v1.pipeline.SVRMModel`) with c2w-flat (16) camera
  rows; the reference's DMTet isosurface step maps to our marching
  tets (`ops.tetra`).

The canonical CharacterGen(4) pose set is elevation 0 at azimuths
[-90, 180, 90, 0] (`shared_utils/camera_utils.py:20`).
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
from ..diffusion.unet import UNet2DCondition, UNetConfig
from ..diffusion.vae import AutoencoderKL, VAEConfig
from ..hunyuan3d_v1.pipeline import SVRMConfig, SVRMModel, SVRMPipeline


@dataclasses.dataclass(frozen=True)
class CharacterGen2DConfig:
    width: int = 512
    height: int = 768
    num_views: int = 4
    camera_dim: int = 12              # flattened 3x4 view matrix
    prompt_tokens: int = 77
    prompt_dim: int = 768
    unet: UNetConfig = UNetConfig(
        in_channels=4, out_channels=4, cross_attention_dim=768,
        attention_head_dim=-8, mv_views=4)
    vae: VAEConfig = VAEConfig()
    scheduler: SchedulerConfig = SchedulerConfig()
    vae_scaling: float = 0.18215


class _CamEmbed(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim, name="linear_1")(x)
        return nn.Dense(self.dim, name="linear_2")(nn.silu(h))


def charactergen_cameras(n_views: int = 4, radius: float = 1.5
                         ) -> np.ndarray:
    """[V, 12] flattened 3x4 c2w rows for the canonical pose set."""
    from ...core.camera import orbit_c2w
    azims = [-90.0, 180.0, 90.0, 0.0][:n_views]
    rows = []
    for az in azims:
        c2w = np.asarray(orbit_c2w(0.0, az, radius))
        rows.append(c2w[:3, :4].reshape(-1))
    return np.stack(rows).astype(np.float32)


class CharacterGen2DPipeline:
    def __init__(self, params,
                 cfg: CharacterGen2DConfig = CharacterGen2DConfig()):
        self.cfg = cfg
        self.unet = UNet2DCondition(cfg.unet)
        self.vae = AutoencoderKL(cfg.vae)
        self.cam_embed = _CamEmbed(cfg.unet.block_out_channels[0] * 4)
        self.params = params
        self.prompt_embeds = np.zeros(
            (cfg.prompt_tokens, cfg.prompt_dim), np.float32)
        self.negative_embeds = np.zeros_like(self.prompt_embeds)

    @classmethod
    def init_random(cls, key=None,
                    cfg: CharacterGen2DConfig = CharacterGen2DConfig()
                    ) -> "CharacterGen2DPipeline":
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        v = cfg.num_views
        lh, lw = cfg.height // 8, cfg.width // 8
        params = {
            "unet": UNet2DCondition(cfg.unet).init(
                k1, jnp.zeros((v, lh, lw, cfg.unet.in_channels)),
                jnp.zeros((v,)),
                jnp.zeros((v, cfg.prompt_tokens, cfg.prompt_dim)),
                class_emb=jnp.zeros(
                    (v, cfg.unet.block_out_channels[0] * 4)))["params"],
            "vae": AutoencoderKL(cfg.vae).init(
                k2, jnp.zeros((1, 64, 64, 3)))["params"],
            "camera": _CamEmbed(cfg.unet.block_out_channels[0] * 4).init(
                k3, jnp.zeros((1, cfg.camera_dim)))["params"],
        }
        return cls(params, cfg)

    def set_prompt_embeds(self, embeds, negative=None):
        self.prompt_embeds = np.asarray(embeds, np.float32)
        if negative is not None:
            self.negative_embeds = np.asarray(negative, np.float32)

    @partial(jax.jit, static_argnums=(0, 4, 6))
    def _denoise(self, params, noise, img_lat, num_steps: int,
                 guidance_scale, scheduler_name, cams, cond, uncond):
        cfg = self.cfg
        v = cfg.num_views
        sched = schedulers.make_scheduler(scheduler_name, cfg.scheduler,
                                          num_steps)
        cam_emb = self.cam_embed.apply({"params": params["camera"]},
                                       cams)
        cam2 = jnp.concatenate([cam_emb, cam_emb], axis=0)
        states = jnp.concatenate(
            [jnp.tile(uncond[None], (v, 1, 1)),
             jnp.tile(cond[None], (v, 1, 1))], axis=0)
        # ref latent tiled to the view axis for the joint MV attention
        img2 = jnp.repeat(jnp.concatenate(
            [jnp.zeros_like(img_lat), img_lat], axis=0), v, axis=0)
        def denoise_fn(x_in, i, t):
            tvec = jnp.full((2 * v,), t, jnp.float32)
            # ref-unet role: record the reference latent's self-attn
            # states, read them in the denoise pass
            _, ref = self.unet.apply(
                {"params": params["unet"]}, img2, tvec, states,
                ref_mode="write", class_emb=jnp.zeros_like(cam2))
            x2 = jnp.concatenate([x_in, x_in], axis=0)
            eps, _ = self.unet.apply(
                {"params": params["unet"]}, x2, tvec, states,
                ref_mode="read", ref_hidden=ref, class_emb=cam2)
            e_u, e_c = jnp.split(eps, 2, axis=0)
            return e_u + guidance_scale * (e_c - e_u)

        return schedulers.sample_loop(sched, denoise_fn,
                                      noise * sched.init_sigma)

    def inference(self, image, width: Optional[int] = None,
                  height: Optional[int] = None, prompt: str = "",
                  prompt_neg: str = "", guidance_scale: float = 5.0,
                  num_inference_steps: int = 40, seed: int = 2333):
        """image [H, W, 3] in [0,1] → views [V, height, width, 3]."""
        cfg = self.cfg
        v = cfg.num_views
        w = width or cfg.width
        h = height or cfg.height
        image = jnp.asarray(image, jnp.float32)
        if image.ndim == 3:
            image = image[None]
        if image.shape[1] != h or image.shape[2] != w:
            image = jax.image.resize(image, (1, h, w, 3), "bilinear")
        img_lat = self.vae.apply({"params": self.params["vae"]},
                                 image * 2.0 - 1.0,
                                 method=AutoencoderKL.encode)
        img_lat = img_lat * cfg.vae_scaling
        cams = jnp.asarray(charactergen_cameras(v))
        noise = jax.random.normal(
            jax.random.PRNGKey(seed),
            (v, img_lat.shape[1], img_lat.shape[2], 4))
        out = self._denoise(self.params, noise, img_lat,
                            int(num_inference_steps),
                            jnp.float32(guidance_scale),
                            getattr(self, "scheduler_name", None)
                            or "DDIMScheduler", cams,
                            jnp.asarray(self.prompt_embeds),
                            jnp.asarray(self.negative_embeds))
        imgs = self.vae.apply({"params": self.params["vae"]},
                              out / cfg.vae_scaling,
                              method=AutoencoderKL.decode)
        return jnp.clip(imgs * 0.5 + 0.5, 0.0, 1.0)


# ------------------------------------------------------------------ #
# Stage 3D: 4-view LRM on the SVRM triplane substrate
# ------------------------------------------------------------------ #
@dataclasses.dataclass(frozen=True)
class CharacterGenLRMConfig:
    svrm: SVRMConfig = dataclasses.replace(SVRMConfig(),
                                           cam_cond_dim=16)
    mesh_size: int = 256

    @classmethod
    def tiny(cls) -> "CharacterGenLRMConfig":
        return cls(svrm=dataclasses.replace(SVRMConfig.tiny(),
                                            cam_cond_dim=16),
                   mesh_size=24)


class CharacterGenLRMPipeline:
    def __init__(self, params, cfg=CharacterGenLRMConfig()):
        self.cfg = cfg
        self._svrm = SVRMPipeline(params, cfg.svrm)

    @property
    def params(self):
        return self._svrm.params

    @classmethod
    def init_random(cls, key=None,
                    cfg: Optional[CharacterGenLRMConfig] = None
                    ) -> "CharacterGenLRMPipeline":
        cfg = cfg or CharacterGenLRMConfig()
        svrm = SVRMPipeline.init_random(key=key, cfg=cfg.svrm)
        obj = cls.__new__(cls)
        obj.cfg = cfg
        obj._svrm = svrm
        return obj

    def inference(self, mv_images, mesh_size: Optional[int] = None):
        """mv_images [4, H, W, 3] in [0,1] → Mesh (the reference API
        returns (verts, faces); we return the Mesh directly)."""
        from ...core.camera import orbit_c2w
        imgs = np.asarray(mv_images, np.float32)
        cams = []
        for az in [-90.0, 180.0, 90.0, 0.0][:imgs.shape[0]]:
            cams.append(np.asarray(orbit_c2w(0.0, az, 1.5)).reshape(-1))
        cams = np.stack(cams).astype(np.float32)
        return self._svrm.views_to_mesh(
            imgs, cams=cams,
            mesh_size=mesh_size or self.cfg.mesh_size)
