"""MV-Adapter: geometry-guided multi-view generation (IG2MV / TG2MV).

Counterpart of `Gen_3D_Modules/MV_Adapter/mvadapter_node_utils.py`
(`mvadapter_prepare_pipeline` / `mvadapter_run_pipeline` :188-231 and
the tg2mv variants :616-654): the target mesh is rendered to per-view
position + normal maps, which enter the denoiser as a 6-channel
control image through a ControlNet-style encoder; generation is a
6-view joint-attention UNet conditioned on a reference image
(IG2MV — reference attention write/read) or text embeddings (TG2MV).
The upstream runs an SDXL base; this build keeps the same adapter
topology on the SD-class UNet substrate (cross-dim 1024) — the
conditioning pathways (control residuals, ref K/V injection, CFG) are
architecture-preserving while every matmul stays MXU-shaped.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import schedulers
from ..diffusion.controlnet import ControlNetEncoder
from ..diffusion.schedulers import SchedulerConfig
from ..diffusion.unet import UNet2DCondition, UNetConfig
from ..diffusion.vae import AutoencoderKL, VAEConfig


@dataclasses.dataclass(frozen=True)
class MVAdapterConfig:
    image_size: int = 768
    num_views: int = 6
    camera_azims: Tuple[float, ...] = (0., 45., 90., 180., 270., 315.)
    camera_elevs: Tuple[float, ...] = (0.,) * 6
    camera_distance: float = 1.8
    prompt_tokens: int = 77
    prompt_dim: int = 1024
    unet: UNetConfig = UNetConfig(
        in_channels=4, out_channels=4, cross_attention_dim=1024,
        mv_views=6)
    vae: VAEConfig = VAEConfig()
    scheduler: SchedulerConfig = SchedulerConfig()
    vae_scaling: float = 0.18215

    @property
    def vae_factor(self) -> int:
        return 2 ** (len(self.vae.block_out_channels) - 1)


def render_control_images(mesh, cfg: MVAdapterConfig,
                          size: Optional[int] = None):
    """→ (pos_maps [V,S,S,3] in [0,1], normal_maps [V,S,S,3] in [0,1])
    — the `render_out.pos + 0.5` / `normal/2 + 0.5` control images."""
    from ...core.camera import Camera
    from ...ops import rasterize as R
    s = size or cfg.image_size
    v = jnp.asarray(mesh.v, jnp.float32)
    f = jnp.asarray(mesh.f, jnp.int32)
    if mesh.vn is None:
        mesh = mesh.auto_normal()
    vn = jnp.asarray(mesh.vn, jnp.float32)
    pos_maps, normal_maps = [], []
    for e, a in zip(cfg.camera_elevs, cfg.camera_azims):
        cam = Camera.from_orbit(float(e), float(a),
                                cfg.camera_distance, width=s, height=s)
        rast = R.rasterize(v, f, cam.view_proj, s, s)
        hit = rast.mask[..., None]
        p = R.interpolate(v, rast, f)
        n = R.interpolate(vn, rast, f)
        pos_maps.append(jnp.where(hit, jnp.clip(p + 0.5, 0, 1), 0.0))
        normal_maps.append(jnp.where(hit, n * 0.5 + 0.5, 0.0))
    return jnp.stack(pos_maps), jnp.stack(normal_maps)


class _MVAdapterBase:
    def __init__(self, params, cfg: MVAdapterConfig = MVAdapterConfig()):
        self.cfg = cfg
        self.unet = UNet2DCondition(cfg.unet)
        self.controlnet = ControlNetEncoder(cfg.unet, cond_channels=6)
        self.vae = AutoencoderKL(cfg.vae)
        self.params = params
        self.prompt_embeds = np.zeros(
            (cfg.prompt_tokens, cfg.prompt_dim), np.float32)
        self.negative_embeds = np.zeros_like(self.prompt_embeds)

    @classmethod
    def init_random(cls, key=None,
                    cfg: MVAdapterConfig = MVAdapterConfig()):
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        v = cfg.num_views
        lat = cfg.image_size // cfg.vae_factor
        x = jnp.zeros((v, lat, lat, cfg.unet.in_channels))
        ctx = jnp.zeros((v, cfg.prompt_tokens, cfg.prompt_dim))
        params = {
            "unet": UNet2DCondition(cfg.unet).init(
                k1, x, jnp.zeros((v,)), ctx)["params"],
            "controlnet": ControlNetEncoder(cfg.unet, cond_channels=6)
            .init(k2, x, jnp.zeros((v,)), ctx,
                  jnp.zeros((v, lat, lat, 6)))["params"],
            "vae": AutoencoderKL(cfg.vae).init(
                k3, jnp.zeros((1, 64, 64, 3)))["params"],
        }
        return cls(params, cfg)

    def set_prompt_embeds(self, embeds, negative=None):
        self.prompt_embeds = np.asarray(embeds, np.float32)
        if negative is not None:
            self.negative_embeds = np.asarray(negative, np.float32)

    def _control_latents(self, pos_maps, normal_maps):
        """Downsample the raw control images to latent resolution and
        stack on channels (6ch conditioning input)."""
        lat = pos_maps.shape[1] // self.cfg.vae_factor
        v = pos_maps.shape[0]
        ctrl = jnp.concatenate([pos_maps, normal_maps], axis=-1)
        return jax.image.resize(ctrl, (v, lat, lat, 6), "bilinear")

    def _decode(self, latents):
        img = self.vae.apply({"params": self.params["vae"]},
                             latents / self.cfg.vae_scaling,
                             method=AutoencoderKL.decode)
        return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)


class MVAdapterIG2MVPipeline(_MVAdapterBase):
    """Reference image + mesh geometry → 6 views."""

    @partial(jax.jit, static_argnums=(0, 5, 8))
    def _denoise(self, params, noise, ctrl, img_lat, num_steps: int,
                 guidance_scale, ref_scale, scheduler_name, cond, uncond):
        cfg = self.cfg
        v = cfg.num_views
        sched = schedulers.make_scheduler(scheduler_name, cfg.scheduler,
                                          num_steps)
        states = jnp.concatenate(
            [jnp.tile(uncond[None], (v, 1, 1)),
             jnp.tile(cond[None], (v, 1, 1))], axis=0)
        ctrl2 = jnp.concatenate([ctrl, ctrl], axis=0)
        img2 = jnp.repeat(jnp.concatenate(
            [jnp.zeros_like(img_lat), img_lat * ref_scale], axis=0),
            v, axis=0)
        def denoise_fn(x_in, i, t):
            tvec = jnp.full((2 * v,), t, jnp.float32)
            x2 = jnp.concatenate([x_in, x_in], axis=0)
            down, mid = self.controlnet.apply(
                {"params": params["controlnet"]}, x2, tvec,
                states, ctrl2)
            _, ref = self.unet.apply(
                {"params": params["unet"]}, img2, tvec, states,
                ref_mode="write")
            eps, _ = self.unet.apply(
                {"params": params["unet"]}, x2, tvec, states,
                ref_mode="read", ref_hidden=ref,
                down_residuals=down, mid_residual=mid)
            e_u, e_c = jnp.split(eps, 2, axis=0)
            return e_u + guidance_scale * (e_c - e_u)

        return schedulers.sample_loop(sched, denoise_fn,
                                      noise * sched.init_sigma)

    def __call__(self, mesh, image, num_inference_steps: int = 50,
                 guidance_scale: float = 3.0,
                 reference_conditioning_scale: float = 1.0,
                 seed: int = 0, size: Optional[int] = None):
        """→ (views [V,S,S,3], pos_maps, normal_maps)."""
        cfg = self.cfg
        s = size or cfg.image_size
        pos_maps, normal_maps = render_control_images(mesh, cfg, s)
        ctrl = self._control_latents(pos_maps, normal_maps)
        image = jnp.asarray(image, jnp.float32)
        if image.ndim == 3:
            image = image[None]
        if image.shape[1] != s:
            image = jax.image.resize(image, (1, s, s, 3), "bilinear")
        img_lat = self.vae.apply({"params": self.params["vae"]},
                                 image * 2.0 - 1.0,
                                 method=AutoencoderKL.encode)
        img_lat = img_lat * cfg.vae_scaling
        noise = jax.random.normal(
            jax.random.PRNGKey(max(seed, 0)),
            (cfg.num_views, img_lat.shape[1], img_lat.shape[2], 4))
        out = self._denoise(self.params, noise, ctrl, img_lat,
                            int(num_inference_steps),
                            jnp.float32(guidance_scale),
                            jnp.float32(reference_conditioning_scale),
                            getattr(self, "scheduler_name", None)
                            or "DDIMScheduler",
                            jnp.asarray(self.prompt_embeds),
                            jnp.asarray(self.negative_embeds))
        return self._decode(out), pos_maps, normal_maps


class MVAdapterTG2MVPipeline(_MVAdapterBase):
    """Text + mesh geometry → 6 views."""

    @partial(jax.jit, static_argnums=(0, 4, 6))
    def _denoise(self, params, noise, ctrl, num_steps: int,
                 guidance_scale, scheduler_name, cond, uncond):
        cfg = self.cfg
        v = cfg.num_views
        sched = schedulers.make_scheduler(scheduler_name, cfg.scheduler,
                                          num_steps)
        states = jnp.concatenate(
            [jnp.tile(uncond[None], (v, 1, 1)),
             jnp.tile(cond[None], (v, 1, 1))], axis=0)
        ctrl2 = jnp.concatenate([ctrl, ctrl], axis=0)

        def denoise_fn(x_in, i, t):
            tvec = jnp.full((2 * v,), t, jnp.float32)
            x2 = jnp.concatenate([x_in, x_in], axis=0)
            down, mid = self.controlnet.apply(
                {"params": params["controlnet"]}, x2, tvec,
                states, ctrl2)
            eps, _ = self.unet.apply(
                {"params": params["unet"]}, x2, tvec, states,
                down_residuals=down, mid_residual=mid)
            e_u, e_c = jnp.split(eps, 2, axis=0)
            return e_u + guidance_scale * (e_c - e_u)

        return schedulers.sample_loop(sched, denoise_fn,
                                      noise * sched.init_sigma)

    def __call__(self, mesh, num_inference_steps: int = 50,
                 guidance_scale: float = 7.0, seed: int = 0,
                 size: Optional[int] = None):
        cfg = self.cfg
        s = size or cfg.image_size
        pos_maps, normal_maps = render_control_images(mesh, cfg, s)
        ctrl = self._control_latents(pos_maps, normal_maps)
        lat = s // cfg.vae_factor
        noise = jax.random.normal(
            jax.random.PRNGKey(max(seed, 0)),
            (cfg.num_views, lat, lat, 4))
        out = self._denoise(self.params, noise, ctrl,
                            int(num_inference_steps),
                            jnp.float32(guidance_scale),
                            getattr(self, "scheduler_name", None)
                            or "DDIMScheduler",
                            jnp.asarray(self.prompt_embeds),
                            jnp.asarray(self.negative_embeds))
        return self._decode(out), pos_maps, normal_maps
