"""Zero123Plus: single image → 3×2 grid of 6 novel views (flax).

Counterpart of the reference `Zero123PlusPipeline`
(`Gen_3D_Modules/Zero123Plus/pipeline.py:272-430`), re-derived:

  * SD-2.1-class UNet (v-prediction) on a 960×640 latent canvas holding a
    3×2 grid of 320² views;
  * reference attention: the condition image's VAE latent is re-noised at
    each timestep, run through the UNet in "write" mode, and every
    self-attention of the denoising pass appends those recorded hidden
    states as extra K/V (`ReferenceOnlyAttnProc`, pipeline.py:48-160);
  * global conditioning: CLIP-vision image embedding added to the (empty)
    prompt embedding with per-token ramping coefficients
    (pipeline.py:385-405);
  * the pipeline's private latent/image affine scalings
    (pipeline.py:161-178): latents ↦ (x−0.22)·0.75, images ↦ x·0.5/0.8;
  * Euler-ancestral sampling with trailing timestep spacing.

The whole denoising loop jits once (lax.fori_loop over steps); CFG runs
as a doubled batch exactly like the reference.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.schedulers import SchedulerConfig, make_scheduler
from ..diffusion.unet import UNet2DCondition, UNetConfig
from ..diffusion.vae import AutoencoderKL, VAEConfig


def scale_latents(x):
    return (x - 0.22) * 0.75


def unscale_latents(x):
    return x / 0.75 + 0.22


def scale_image(x):
    return x * 0.5 / 0.8


def unscale_image(x):
    return x / 0.5 * 0.8


@dataclasses.dataclass(frozen=True)
class Zero123PlusConfig:
    height: int = 960
    width: int = 640
    unet: UNetConfig = UNetConfig.sd21()
    vae: VAEConfig = VAEConfig()
    cond_size: int = 512          # VAE-path condition image size
    prompt_tokens: int = 77
    prompt_dim: int = 1024

    @property
    def vae_factor(self) -> int:
        return 2 ** (len(self.vae.block_out_channels) - 1)


class Zero123PlusPipeline:
    """params dict: {"unet", "vae"} (+ host-side numpy: empty-prompt
    embeds [77, D], ramping coefficients [77]). The CLIP vision encoder
    is pluggable (`set_vision_encoder`) — transformers'
    FlaxCLIPVisionModel slots in when its weights are available; without
    it the global-embedding term is skipped (prompt-only conditioning)."""

    def __init__(self, params, cfg: Zero123PlusConfig = Zero123PlusConfig(),
                 prompt_embeds: Optional[np.ndarray] = None,
                 ramping: Optional[np.ndarray] = None):
        self.cfg = cfg
        self.params = params
        self.unet = UNet2DCondition(cfg.unet)
        self.vae = AutoencoderKL(cfg.vae)
        self.prompt_embeds = (np.zeros((cfg.prompt_tokens, cfg.prompt_dim),
                                       np.float32)
                              if prompt_embeds is None else prompt_embeds)
        self.ramping = (np.zeros((cfg.prompt_tokens,), np.float32)
                        if ramping is None else ramping)
        self.vision_encoder = None    # callable: image [B,H,W,3] -> [B, D]

    # -------------------------------------------------------------- #
    @classmethod
    def init_random(cls, key=None,
                    cfg: Zero123PlusConfig = Zero123PlusConfig()
                    ) -> "Zero123PlusPipeline":
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        lh, lw = cfg.height // cfg.vae_factor, cfg.width // cfg.vae_factor
        unet = UNet2DCondition(cfg.unet)
        unet_params = unet.init(
            k1, jnp.zeros((1, lh, lw, cfg.unet.in_channels)),
            jnp.zeros((1,)),
            jnp.zeros((1, cfg.prompt_tokens, cfg.prompt_dim)))["params"]
        vae = AutoencoderKL(cfg.vae)
        vae_params = vae.init(k2, jnp.zeros((1, 64, 64, 3)))["params"]
        return cls({"unet": unet_params, "vae": vae_params}, cfg)

    @classmethod
    def from_pretrained(cls, path: str,
                        **cfg_overrides) -> "Zero123PlusPipeline":
        """Load a sudo-ai/zero123plus-v1.x diffusers directory
        (`model_index.json` + unet/ vae/ text_encoder/ vision_encoder/)
        through the torch→flax converters. Mirrors the reference's
        `DiffusionPipeline.from_pretrained` composition
        (`Zero123Plus/pipeline.py:272-313`): ramping coefficients come
        from model_index.json, global conditioning from the projected
        CLIPVisionModelWithProjection, prompt embedding from the empty
        prompt."""
        import os
        from ..diffusion.convert import (encode_empty_prompt,
                                         load_clip_vision_dir,
                                         load_unet_dir, load_vae_dir)
        from ..loader import read_json_config
        index = read_json_config(os.path.join(path, "model_index.json"))
        unet_cfg, unet_params, _ = load_unet_dir(
            os.path.join(path, "unet"))
        vae_cfg, vae_params, _ = load_vae_dir(os.path.join(path, "vae"))
        cfg = Zero123PlusConfig(
            unet=unet_cfg, vae=vae_cfg,
            prompt_dim=unet_cfg.cross_attention_dim, **cfg_overrides)
        ramping = np.asarray(
            index.get("ramping_coefficients")
            or np.zeros((cfg.prompt_tokens,)), np.float32)

        prompt_embeds = None
        te = os.path.join(path, "text_encoder")
        if os.path.isdir(te) and any(
                f.startswith(("model", "pytorch_model"))
                for f in os.listdir(te)):
            prompt_embeds = encode_empty_prompt(te)

        pipe = cls({"unet": unet_params, "vae": vae_params}, cfg,
                   prompt_embeds=prompt_embeds, ramping=ramping)

        ve = os.path.join(path, "vision_encoder")
        if os.path.isdir(ve) and any(
                f.startswith(("model", "pytorch_model"))
                for f in os.listdir(ve)):
            from ..clip import make_vision_conditioner
            vcfg, vparams, _ = load_clip_vision_dir(ve)
            pipe.set_vision_encoder(
                make_vision_conditioner(vparams, vcfg))
        return pipe

    def set_vision_encoder(self, fn):
        self.vision_encoder = fn

    # -------------------------------------------------------------- #
    def encode_condition(self, image):
        """image [B, S, S, 3] in [0,1] → cond latent (reference
        encode_condition_image: VAE-encode the affine-scaled image)."""
        x = scale_image(jnp.asarray(image) * 2.0 - 1.0)
        return self.vae.apply({"params": self.params["vae"]}, x,
                              method=AutoencoderKL.encode)

    def _encoder_states(self, image):
        emb = jnp.asarray(self.prompt_embeds)[None]        # [1, 77, D]
        if self.vision_encoder is not None:
            global_emb = self.vision_encoder(image)        # [B, D]
            emb = emb + global_emb[:, None, :] \
                * jnp.asarray(self.ramping)[None, :, None]
        return emb

    def __call__(self, image, num_inference_steps: int = 28,
                 guidance_scale: float = 4.0, seed: int = 0,
                 output_type: str = "image"):
        """image [S, S, 3] float [0,1] → [H, W, 3] grid of 6 views."""
        cfg = self.cfg
        image = jnp.asarray(image, jnp.float32)[None]
        if image.shape[1] != cfg.cond_size:
            image = jax.image.resize(
                image, (1, cfg.cond_size, cfg.cond_size, 3), "bilinear")

        sched = make_scheduler(
            getattr(self, "scheduler_name", None)
            or "EulerAncestralDiscreteScheduler",
            SchedulerConfig(prediction_type="v_prediction",
                            timestep_spacing="trailing"),
            num_inference_steps)

        cond_lat = self.encode_condition(image)
        states = self._encoder_states(image)
        use_cfg = guidance_scale > 1.0
        if use_cfg:
            neg_lat = self.encode_condition(jnp.zeros_like(image))
            cond_lat = jnp.concatenate([neg_lat, cond_lat])
            states = jnp.concatenate([jnp.asarray(
                self.prompt_embeds)[None], states])

        key = jax.random.PRNGKey(seed)
        lh, lw = cfg.height // cfg.vae_factor, cfg.width // cfg.vae_factor
        key, k_init = jax.random.split(key)
        latents = jax.random.normal(k_init, (1, lh, lw, 4)) \
            * sched.init_sigma

        unet_apply = partial(self.unet.apply,
                             {"params": self.params["unet"]})

        def body(i, carry):
            latents, aux, key = carry
            key, k_cond, k_step = jax.random.split(key, 3)
            t = sched.timesteps[i]
            tvec = jnp.full((cond_lat.shape[0],), t, jnp.float32)

            # reference pass: re-noise the cond latent at this step
            noisy_cond = sched.add_noise(
                cond_lat, jax.random.normal(k_cond, cond_lat.shape), i)
            noisy_cond = sched.scale_model_input(noisy_cond, i)
            _, ref = unet_apply(noisy_cond, tvec, states,
                                ref_mode="write")

            lat_in = jnp.concatenate([latents] * 2) if use_cfg else latents
            lat_in = sched.scale_model_input(lat_in, i)
            out, _ = unet_apply(lat_in, tvec, states, ref_mode="read",
                                ref_hidden=ref)
            if use_cfg:
                uncond, cond = jnp.split(out, 2)
                out = uncond + guidance_scale * (cond - uncond)
            latents, aux = sched.step_aux(out, i, latents, aux,
                                          key=k_step)
            return latents, aux, key

        latents, _, _ = jax.lax.fori_loop(
            0, sched.loop_steps, body,
            (latents, sched.init_aux(latents), key))
        latents = unscale_latents(latents)
        if output_type == "latent":
            return latents
        img = self.vae.apply({"params": self.params["vae"]},
                             latents, method=AutoencoderKL.decode)
        img = unscale_image(img)
        return jnp.clip(img[0] * 0.5 + 0.5, 0.0, 1.0)
