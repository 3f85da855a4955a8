"""Stable3DGen StableX/Yoso: one-step SD normal estimation.

Counterpart of `Gen_3D_Modules/Stable3DGen/stablex/pipeline_yoso.py:
101-520` (`YosoPipeline`): the input image's VAE latent conditions a
ControlNet whose residuals are injected into ONE UNet call at a fixed
timestep; the predicted latent decodes directly to a normal map
(normalize-at-the-end). The geometry stage of Stable3DGen is the
TRELLIS fork — `models.trellis.TrellisImageTo3DPipeline` serves it.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.controlnet import ControlNetEncoder
from ..diffusion.unet import UNet2DCondition, UNetConfig
from ..diffusion.vae import AutoencoderKL, VAEConfig


@dataclasses.dataclass(frozen=True)
class YosoConfig:
    unet: UNetConfig = UNetConfig(cross_attention_dim=1024)
    vae: VAEConfig = VAEConfig()
    prompt_tokens: int = 257
    prompt_dim: int = 1024
    t_start: int = 999
    vae_scaling: float = 0.18215


class YosoNormalsPipeline:
    def __init__(self, params, cfg: YosoConfig = YosoConfig(),
                 raw_residuals: bool = False):
        self.cfg = cfg
        self.unet = UNet2DCondition(cfg.unet)
        self.controlnet = ControlNetEncoder(cfg.unet,
                                            raw_residuals=raw_residuals)
        self.vae = AutoencoderKL(cfg.vae)
        self.params = params
        self._run = jax.jit(self._run_impl)

    @classmethod
    def init_random(cls, key=None, cfg: Optional[YosoConfig] = None
                    ) -> "YosoNormalsPipeline":
        cfg = cfg or YosoConfig()
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        lat = 8
        ctx = jnp.zeros((1, cfg.prompt_tokens, cfg.prompt_dim))
        x = jnp.zeros((1, lat, lat, cfg.unet.in_channels))
        params = {
            "unet": UNet2DCondition(cfg.unet).init(
                k1, x, jnp.zeros((1,)), ctx)["params"],
            "controlnet": ControlNetEncoder(cfg.unet).init(
                k2, x, jnp.zeros((1,)), ctx, x)["params"],
            "vae": AutoencoderKL(cfg.vae).init(
                k3, jnp.zeros((1, 64, 64, 3)))["params"],
        }
        return cls(params, cfg)

    @classmethod
    def from_pretrained(cls, path: str, **cfg_overrides
                        ) -> "YosoNormalsPipeline":
        """Load a Stable-X/yoso-normal-* diffusers directory: unet/,
        vae/, controlnet/ (ControlNetVAEModel — the plain SD down+mid
        encoder whose state dict follows diffusers ControlNetModel
        naming; the conditioning-embedding and zero-conv weights it
        carries are dead at forward time, controlnetvae.py:161-200)."""
        import os

        from ..convert import convert_with_rules
        from ..diffusion.convert import (load_unet_dir, load_vae_dir,
                                         unet_rules)
        from ..loader import load_dir_state_dict

        unet_cfg, unet_params, _ = load_unet_dir(
            os.path.join(path, "unet"))
        vae_cfg, vae_params, _ = load_vae_dir(os.path.join(path, "vae"))
        cn_dir = os.path.join(path, "controlnet")
        cn_params = convert_with_rules(load_dir_state_dict(cn_dir),
                                       unet_rules(), strict=False)
        kw = dict(unet=unet_cfg, vae=vae_cfg,
                  prompt_dim=unet_cfg.cross_attention_dim)
        kw.update(cfg_overrides)
        cfg = YosoConfig(**kw)
        params = {"unet": unet_params, "vae": vae_params,
                  "controlnet": cn_params}
        return cls(params, cfg, raw_residuals=True)

    def _run_impl(self, params, image):
        cfg = self.cfg
        img_lat = self.vae.apply({"params": params["vae"]},
                                 image * 2.0 - 1.0,
                                 method=AutoencoderKL.encode)
        img_lat = img_lat * cfg.vae_scaling
        pred_lat = jnp.zeros_like(img_lat)
        ctx = jnp.zeros((image.shape[0], cfg.prompt_tokens,
                         cfg.prompt_dim))
        t = jnp.full((image.shape[0],), float(cfg.t_start))
        down, mid = self.controlnet.apply(
            {"params": params["controlnet"]}, img_lat, t, ctx, img_lat)
        eps, _ = self.unet.apply({"params": params["unet"]}, pred_lat,
                                 t, ctx, down_residuals=down,
                                 mid_residual=mid)
        out = self.vae.apply({"params": params["vae"]},
                             eps / cfg.vae_scaling,
                             method=AutoencoderKL.decode)
        # normalize_normals (pipeline_yoso.py): unit vectors from the
        # decoded [-1, 1] prediction
        n = out / jnp.maximum(
            jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-6)
        return n

    def __call__(self, image):
        """image [H, W, 3] (or [B, H, W, 3]) in [0,1] → unit normal map
        in [-1, 1] (same spatial size, /8-rounded)."""
        image = jnp.asarray(image, jnp.float32)
        if image.ndim == 3:
            image = image[None]
        h, w = image.shape[1], image.shape[2]
        h8, w8 = (h // 8) * 8, (w // 8) * 8
        if (h8, w8) != (h, w):
            image = jax.image.resize(image,
                                     (image.shape[0], h8, w8, 3),
                                     "bilinear")
        return self._run(self.params, image)
