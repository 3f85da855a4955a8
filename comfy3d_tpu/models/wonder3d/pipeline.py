"""Wonder3D: single image → 6 views RGB + 6 normal maps, jointly.

Counterpart of `Gen_3D_Modules/Wonder3D/pipelines/
pipeline_mvdiffusion_image.py` on the shared SD-UNet substrate with
`mv_views` 3D attention + `cd_joint` cross-domain attention
(models/transformer_mv2d.py). The joint batch is domain-major
[2 (normal|color), V]; conditioning is the CLIP image embedding
(encoder_hidden_states), the VAE latent of the input image concatenated
on channels, and the fixed per-view camera table projected through the
'projection' class-embedding MLP (sin|cos of [e_cond, e, a, d_n, d_c]).

TPU notes: one jitted lax.scan over DDIM-style steps; the whole 12-frame
joint batch is a single static [12, h, w, 8] program.
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

# pipeline_mvdiffusion_image.py:139-152 — [e_cond, e, a, normal, color]
CAMERA_TABLE = np.array(
    [[0.0, 0.0000, 0.0000, 1.0, 0.0],
     [0.0, -0.2362, 0.8125, 1.0, 0.0],
     [0.0, -0.1686, 1.6934, 1.0, 0.0],
     [0.0, 0.5220, 3.1406, 1.0, 0.0],
     [0.0, 0.6904, 4.8359, 1.0, 0.0],
     [0.0, 0.3733, 5.5859, 1.0, 0.0],
     [0.0, 0.0000, 0.0000, 0.0, 1.0],
     [0.0, -0.2362, 0.8125, 0.0, 1.0],
     [0.0, -0.1686, 1.6934, 0.0, 1.0],
     [0.0, 0.5220, 3.1406, 0.0, 1.0],
     [0.0, 0.6904, 4.8359, 0.0, 1.0],
     [0.0, 0.3733, 5.5859, 0.0, 1.0]], np.float32)


@dataclasses.dataclass(frozen=True)
class Wonder3DConfig:
    image_size: int = 256
    num_views: int = 6
    prompt_dim: int = 768            # CLIP image-embed dim
    unet: UNetConfig = UNetConfig(
        in_channels=8, out_channels=4, cross_attention_dim=768,
        attention_head_dim=-8, mv_views=6, cd_joint=True)
    vae: VAEConfig = VAEConfig()
    scheduler: SchedulerConfig = SchedulerConfig()
    vae_scaling: float = 0.18215


class _ClassEmbedMLP(nn.Module):
    """diffusers class_embed_type='projection': Dense-SiLU-Dense from the
    10-dim sin|cos camera vector to the time-embedding width."""
    hidden: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden, name="linear_1")(x)
        return nn.Dense(self.hidden, name="linear_2")(nn.silu(h))


class Wonder3DPipeline:
    def __init__(self, params, cfg: Wonder3DConfig = Wonder3DConfig()):
        self.cfg = cfg
        self.unet = UNet2DCondition(cfg.unet)
        self.vae = AutoencoderKL(cfg.vae)
        self.class_mlp = _ClassEmbedMLP(cfg.unet.block_out_channels[0] * 4)
        self.params = params
        self.vision_encoder = None      # image [B,H,W,3] → [B, D]

    @classmethod
    def init_random(cls, key=None, cfg: Wonder3DConfig = Wonder3DConfig()
                    ) -> "Wonder3DPipeline":
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        lat = cfg.image_size // 8
        nf = 2 * cfg.num_views
        unet = UNet2DCondition(cfg.unet)
        params = {
            "unet": unet.init(
                k1, jnp.zeros((nf, lat, lat, cfg.unet.in_channels)),
                jnp.zeros((nf,)),
                jnp.zeros((nf, 1, cfg.prompt_dim)),
                class_emb=jnp.zeros(
                    (nf, cfg.unet.block_out_channels[0] * 4)))["params"],
            "vae": AutoencoderKL(cfg.vae).init(
                k2, jnp.zeros((1, 64, 64, 3)))["params"],
            "class_mlp": _ClassEmbedMLP(
                cfg.unet.block_out_channels[0] * 4).init(
                k3, jnp.zeros((1, 10)))["params"],
        }
        return cls(params, cfg)

    @classmethod
    def from_pretrained(cls, path: str,
                        **cfg_overrides) -> "Wonder3DPipeline":
        """Load a flamehaze1115/wonder3d-v1.0 diffusers directory: the
        UNetMV2DConditionModel (multiview + cross-domain joint
        attention + projection class embedding,
        `Wonder3D/models/unet_mv2d_condition.py`), AutoencoderKL, and
        CLIPVisionModelWithProjection image encoder."""
        import os
        from ..convert import convert_with_rules
        from ..diffusion.convert import (load_clip_vision_dir,
                                         load_unet_dir, load_vae_dir,
                                         unet_rules)
        from ..loader import load_dir_state_dict, read_json_config

        unet_dir = os.path.join(path, "unet")
        raw = read_json_config(os.path.join(unet_dir, "config.json"))
        unet_cfg, unet_params, _ = load_unet_dir(unet_dir)
        vae_cfg, vae_params, _ = load_vae_dir(os.path.join(path, "vae"))
        kw = dict(
            unet=unet_cfg, vae=vae_cfg,
            num_views=raw.get("num_views", 6),
            prompt_dim=unet_cfg.cross_attention_dim,
            image_size=raw.get("sample_size", 32) * 8)
        kw.update(cfg_overrides)
        cfg = Wonder3DConfig(**kw)

        # diffusers class_embed_type='projection' lives inside the unet
        # state dict; our pipeline keeps the MLP as a separate tree
        sd = load_dir_state_dict(unet_dir)
        ce = {k[len("class_embedding."):]: v for k, v in sd.items()
              if k.startswith("class_embedding.")}

        def ce_rules(key, val):
            from ..convert import t_linear
            for tk in ("linear_1", "linear_2"):
                if key == f"{tk}.weight":
                    return f"{tk}/kernel", t_linear(val)
                if key == f"{tk}.bias":
                    return f"{tk}/bias", val
            return None

        class_mlp = convert_with_rules(ce, ce_rules, strict=False)

        pipe = cls({"unet": unet_params, "vae": vae_params,
                    "class_mlp": class_mlp}, cfg)

        ie = os.path.join(path, "image_encoder")
        if os.path.isdir(ie) and any(
                f.startswith(("model", "pytorch_model"))
                for f in os.listdir(ie)):
            from ..clip import make_vision_conditioner
            vcfg, vparams, _ = load_clip_vision_dir(ie)
            pipe.set_vision_encoder(
                make_vision_conditioner(vparams, vcfg))
        return pipe

    def set_vision_encoder(self, fn):
        self.vision_encoder = fn

    # -------------------------------------------------------------- #
    def _camera_class_emb(self, nf):
        cam = jnp.asarray(CAMERA_TABLE[:nf])
        sincos = jnp.concatenate([jnp.sin(cam), jnp.cos(cam)], axis=-1)
        return self.class_mlp.apply({"params": self.params["class_mlp"]},
                                    sincos)

    @partial(jax.jit, static_argnums=(0, 5, 7))
    def _denoise(self, params, latents, image_latents, cond,
                 num_steps: int, guidance_scale,
                 scheduler_name: str = "DDIMScheduler"):
        cfg = self.cfg
        nf = latents.shape[0]
        sched = schedulers.make_scheduler(scheduler_name, cfg.scheduler,
                                          num_steps)
        class_emb = self._camera_class_emb(nf)
        class_emb2 = jnp.concatenate([class_emb, class_emb], axis=0)
        img_lat2 = jnp.concatenate(
            [jnp.zeros_like(image_latents), image_latents], axis=0)
        cond2 = jnp.concatenate([jnp.zeros_like(cond), cond], axis=0)

        def denoise_fn(x_in, i, t):
            x2 = jnp.concatenate([x_in, x_in], axis=0)
            x2 = jnp.concatenate([x2, img_lat2], axis=-1)
            tvec = jnp.broadcast_to(t, (2 * nf,))
            eps, _ = self.unet.apply({"params": params}, x2, tvec, cond2,
                                     class_emb=class_emb2)
            e_uncond, e_cond = jnp.split(eps, 2, axis=0)
            return e_uncond + guidance_scale * (e_cond - e_uncond)

        return schedulers.sample_loop(sched, denoise_fn,
                                      latents * sched.init_sigma)

    def __call__(self, image, num_inference_steps: int = 50,
                 guidance_scale: float = 1.0, seed: int = 0):
        """image [S, S, 3] in [0,1] → (colors [V, S, S, 3],
        normals [V, S, S, 3])."""
        cfg = self.cfg
        nf = 2 * cfg.num_views
        lat = cfg.image_size // 8
        image = jnp.asarray(image, jnp.float32)
        if image.ndim == 3:
            image = image[None]
        s = cfg.image_size
        if image.shape[1] != s:
            image = jax.image.resize(image, (1, s, s, 3), "bilinear")

        # CLIP global embedding (zeros when no encoder is attached)
        if self.vision_encoder is not None:
            emb = self.vision_encoder(image)
        else:
            emb = jnp.zeros((1, cfg.prompt_dim))
        cond = jnp.broadcast_to(emb[:, None, :], (nf, 1, cfg.prompt_dim))

        # VAE latent of the input image, repeated per frame
        img_lat = self.vae.apply({"params": self.params["vae"]},
                                 image * 2.0 - 1.0,
                                 method=AutoencoderKL.encode)
        img_lat = img_lat * cfg.vae_scaling
        img_lat = jnp.broadcast_to(
            img_lat, (nf,) + img_lat.shape[1:])

        lh, lw = img_lat.shape[1], img_lat.shape[2]
        noise = jax.random.normal(jax.random.PRNGKey(seed),
                                  (nf, lh, lw, 4))
        out = self._denoise(self.params["unet"], noise, img_lat, cond,
                            int(num_inference_steps),
                            jnp.float32(guidance_scale),
                            getattr(self, "scheduler_name", None)
                            or "DDIMScheduler")
        imgs = self.vae.apply({"params": self.params["vae"]},
                              out / cfg.vae_scaling,
                              method=AutoencoderKL.decode)
        imgs = jnp.clip(imgs * 0.5 + 0.5, 0.0, 1.0)
        normals, colors = jnp.split(imgs, 2, axis=0)
        return colors, normals
