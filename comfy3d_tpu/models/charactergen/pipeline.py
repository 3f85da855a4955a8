"""CharacterGen: anime character image → 4 canonical views → mesh.

Counterparts of `Gen_3D_Modules/CharacterGen/character_inference.py`:

* `Inference2D_API` (:81) — a 4-view MV diffusion at non-square
  512×768 ("TuneAVideo" lineage): joint multiview self-attention (our
  `mv_views=4`), per-view flattened 3×4 camera matrices embedded into
  the time embedding, and the reference image injected through a
  second "ref UNet" (separate weights, `UNetMV2DRefModel`) whose
  self-attn hidden states feed every denoise step — the write/read
  reference-attention mechanism of our UNet substrate.
* `Inference3D_API` (:192) — a 4-view LRM: image tokens + camera
  conditioning → triplane scene code → geometry. Checkpoint-faithful
  port in `lrm.py` (`CharacterGenLRM`); the reference's DMTet
  isosurface step maps to our marching tets (`ops.tetra`).

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


@dataclasses.dataclass(frozen=True)
class CharacterGen2DConfig:
    width: int = 512
    height: int = 768
    num_views: int = 4
    camera_dim: int = 12              # flattened 3x4 view matrix
    prompt_tokens: int = 77
    prompt_dim: int = 1024            # SD-2.1 cross_attention_dim
    unet: UNetConfig = UNetConfig(
        in_channels=4, out_channels=4, cross_attention_dim=1024,
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
    """Checkpoint-faithful port of `TuneAVideoPipeline.__call__`
    (`CharacterGen/Stage_2D/tuneavideo/pipelines/pipeline_tuneavideo.py:
    420-560`): a gen UNet (`UNetMV2DConditionModel` — joint 4-view
    attn1, camera MLP added to the time embedding, conditioned on ONE
    projected CLIP image token, `unet_condition_type=image`) plus a
    separate ref UNet (`UNetMV2DRefModel`, separate weights) that runs
    on the CLEAN reference latents every step (`use_noise=False`,
    Stage_2D_infer.yaml) conditioned on the text prompt, mode 'w'; the
    gen pass reads each block's norm1 tokens into its joint attention
    kv (refunet.py:34-40 mode 'r')."""

    def __init__(self, params,
                 cfg: CharacterGen2DConfig = CharacterGen2DConfig()):
        self.cfg = cfg
        self.unet = UNet2DCondition(cfg.unet)
        self.ref_unet = UNet2DCondition(
            dataclasses.replace(cfg.unet, mv_views=1))
        self.vae = AutoencoderKL(cfg.vae)
        self.cam_embed = _CamEmbed(cfg.unet.block_out_channels[0] * 4)
        self.params = params
        self.prompt_embeds = np.zeros(
            (cfg.prompt_tokens, cfg.prompt_dim), np.float32)
        self.negative_embeds = np.zeros_like(self.prompt_embeds)
        # CLIPVisionModelWithProjection hook (pipeline_tuneavideo.py:
        # 177 image_embeds); zeros when no encoder weights are wired
        self.image_encoder = None

    @classmethod
    def init_random(cls, key=None,
                    cfg: CharacterGen2DConfig = CharacterGen2DConfig()
                    ) -> "CharacterGen2DPipeline":
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        v = cfg.num_views
        # tiny spatial probe: UNet param shapes are resolution-free
        lh, lw = min(cfg.height // 8, 12), min(cfg.width // 8, 8)
        self_ = cls({}, cfg)
        params = {
            "unet": self_.unet.init(
                k1, jnp.zeros((v, lh, lw, cfg.unet.in_channels)),
                jnp.zeros((v,)),
                jnp.zeros((v, 1, cfg.prompt_dim)),
                class_emb=jnp.zeros(
                    (v, cfg.unet.block_out_channels[0] * 4)))["params"],
            "ref_unet": self_.ref_unet.init(
                k4, jnp.zeros((1, lh, lw, cfg.unet.in_channels)),
                jnp.zeros((1,)),
                jnp.zeros((1, cfg.prompt_tokens, cfg.prompt_dim))
                )["params"],
            "vae": AutoencoderKL(cfg.vae).init(
                k2, jnp.zeros((1, 64, 64, 3)))["params"],
            "camera": _CamEmbed(cfg.unet.block_out_channels[0] * 4).init(
                k3, jnp.zeros((1, cfg.camera_dim)))["params"],
        }
        self_.params = params
        return self_

    def set_prompt_embeds(self, embeds, negative=None):
        self.prompt_embeds = np.asarray(embeds, np.float32)
        if negative is not None:
            self.negative_embeds = np.asarray(negative, np.float32)

    def set_image_encoder(self, fn):
        """fn(image [1, H, W, 3] in [0,1]) → image_embeds [1, P]."""
        self.image_encoder = fn

    @partial(jax.jit, static_argnums=(0, 4, 6))
    def _denoise(self, params, noise, img_lat, num_steps: int,
                 guidance_scale, scheduler_name, cams, cond, uncond,
                 image_emb):
        cfg = self.cfg
        v = cfg.num_views
        sched = schedulers.make_scheduler(scheduler_name, cfg.scheduler,
                                          num_steps)
        cam_emb = self.cam_embed.apply({"params": params["camera"]},
                                       cams)
        cam2 = jnp.concatenate([cam_emb, cam_emb], axis=0)
        # ref-unet text context: [uncond, cond] rows
        text2 = jnp.stack([uncond, cond], axis=0)
        # gen-unet context: ONE image token per view; zeros on the
        # uncond stream (_encode_image, pipeline_tuneavideo.py:184-190)
        img_tok = jnp.tile(image_emb[:, None, :], (v, 1, 1))
        states = jnp.concatenate(
            [jnp.zeros_like(img_tok), img_tok], axis=0)
        img2 = jnp.concatenate([img_lat, img_lat], axis=0)

        def denoise_fn(x_in, i, t):
            tvec = jnp.full((2 * v,), t, jnp.float32)
            # ref pass: CLEAN reference latents every step
            # (use_noise=False), text conditioning, mode 'w'
            _, ref = self.ref_unet.apply(
                {"params": params["ref_unet"]},
                sched.scale_model_input(img2, i),
                jnp.full((2,), t, jnp.float32), text2,
                ref_mode="write")
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
        if self.image_encoder is not None:
            image_emb = jnp.asarray(self.image_encoder(image),
                                    jnp.float32)
        else:
            image_emb = jnp.zeros((1, cfg.prompt_dim), jnp.float32)
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
                            jnp.asarray(self.negative_embeds),
                            image_emb)
        imgs = self.vae.apply({"params": self.params["vae"]},
                              out / cfg.vae_scaling,
                              method=AutoencoderKL.decode)
        return jnp.clip(imgs * 0.5 + 0.5, 0.0, 1.0)


# Stage 3D (MultiviewLRM) lives in `lrm.py` — a checkpoint-faithful
# port of the reference Stage_3D lrm system.
