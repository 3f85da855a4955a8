"""MV-Adapter: geometry-guided multi-view generation (IG2MV / TG2MV).

Checkpoint-faithful port of `Gen_3D_Modules/MV_Adapter`
(`mvadapter_node_utils.py:37` `prepare_pipeline` / `:516` tg2mv):
an SDXL base UNet whose every self-attention gains decoupled
multi-view (row+col across 6 views) and reference branches
(`mvadapter/models/attention_processor.py:380`
`DecoupledMVRowColSelfAttnProcessor2_0`, separate q/k/v/out weights
shipped in `mvadapter_{ig2mv,tg2mv}_sdxl.safetensors`), plus a
`T2IAdapter(full_adapter_xl)` condition encoder over 6-channel
position+normal control renders injected as
`down_intrablock_additional_residuals`
(`pipeline_mvadapter_i2mv_sdxl.py:268-760`).

IG2MV additionally runs the UNet ONCE on the clean reference-image
latents at t=0 (caching each self-attn's norm1 tokens,
pipeline:622-649) which the gen pass reads through the `_ref` branches;
the uncond CFG stream reads zeroed ref tokens.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import schedulers
from ..diffusion.schedulers import SchedulerConfig
from ..diffusion.unet import UNet2DCondition, UNetConfig
from ..diffusion.vae import AutoencoderKL, VAEConfig
from .adapter import T2IAdapterXL, T2IAdapterXLConfig


@dataclasses.dataclass(frozen=True)
class MVAdapterConfig:
    image_size: int = 768
    num_views: int = 6
    # the trained 6-view set (run_pipeline, mvadapter_node_utils.py:
    # 175-183): front/right/back/left/top/bottom ORTHOGRAPHIC cameras —
    # the row attention spans views 0-3, the col attention 0/2/4/5
    camera_azims: Tuple[float, ...] = (0., 90., 180., 270., 180., 180.)
    camera_elevs: Tuple[float, ...] = (0., 0., 0., 0., 89.99, -89.99)
    camera_distance: float = 1.8
    ortho_scale: float = 0.55
    prompt_tokens: int = 77
    prompt_dim: int = 2048            # SDXL dual-encoder context
    pooled_dim: int = 1280            # text_encoder_2 pooled
    use_ref: bool = True              # ig2mv; tg2mv sets False
    unet: UNetConfig = dataclasses.replace(
        UNetConfig.sdxl(), mv_views=6, mv_decoupled=True)
    adapter: T2IAdapterXLConfig = T2IAdapterXLConfig()
    vae: VAEConfig = VAEConfig()
    # ShiftSNR(DDPM, interpolated, scale 8) — prepare_pipeline:74-79
    scheduler: SchedulerConfig = SchedulerConfig(
        prediction_type="epsilon", snr_shift_scale=8.0)
    vae_scaling: float = 0.13025      # SDXL VAE

    @property
    def vae_factor(self) -> int:
        return 2 ** (len(self.vae.block_out_channels) - 1)


def render_control_images(mesh, cfg: MVAdapterConfig,
                          size: Optional[int] = None):
    """→ (pos_maps [V,S,S,3] in [0,1], normal_maps [V,S,S,3] in [0,1])
    — the `render_out.pos + 0.5` / `normal/2 + 0.5` control images,
    rendered through the reference's ORTHOGRAPHIC camera table
    (mvadapter_node_utils.py:175-183, bounds ±0.55)."""
    from ...core.camera import invert_rigid, orbit_c2w, orthographic
    from ...ops import rasterize as R
    s = size or cfg.image_size
    v = jnp.asarray(mesh.v, jnp.float32)
    f = jnp.asarray(mesh.f, jnp.int32)
    if mesh.vn is None:
        mesh = mesh.auto_normal()
    vn = jnp.asarray(mesh.vn, jnp.float32)
    b = cfg.ortho_scale
    proj = orthographic(-b, b, -b, b, near=0.1,
                        far=2.0 * cfg.camera_distance + 1.0)
    pos_maps, normal_maps = [], []
    for e, a in zip(cfg.camera_elevs, cfg.camera_azims):
        c2w = orbit_c2w(float(e), float(a), cfg.camera_distance)
        vp = proj @ invert_rigid(jnp.asarray(c2w, jnp.float32))
        rast = R.rasterize(v, f, vp, s, s)
        hit = rast.mask[..., None]
        p = R.interpolate(v, rast, f)
        n = R.interpolate(vn, rast, f)
        pos_maps.append(jnp.where(hit, jnp.clip(p + 0.5, 0, 1), 0.0))
        normal_maps.append(jnp.where(hit, n * 0.5 + 0.5, 0.0))
    return jnp.stack(pos_maps), jnp.stack(normal_maps)


class _MVAdapterBase:
    def __init__(self, params, cfg: MVAdapterConfig = MVAdapterConfig()):
        self.cfg = cfg
        ucfg = dataclasses.replace(cfg.unet, mv_views=cfg.num_views,
                                   mv_decoupled=True,
                                   mv_use_ref=cfg.use_ref)
        self.unet = UNet2DCondition(ucfg)
        self.cond_encoder = T2IAdapterXL(cfg.adapter)
        self.vae = AutoencoderKL(cfg.vae)
        self.params = params
        self.prompt_embeds = np.zeros(
            (cfg.prompt_tokens, cfg.prompt_dim), np.float32)
        self.negative_embeds = np.zeros_like(self.prompt_embeds)
        self.pooled_embeds = np.zeros((cfg.pooled_dim,), np.float32)
        self.negative_pooled = np.zeros((cfg.pooled_dim,), np.float32)

    @classmethod
    def init_random(cls, key=None,
                    cfg: MVAdapterConfig = MVAdapterConfig()):
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        v = cfg.num_views
        self_ = cls({}, cfg)
        # tiny spatial probe (param shapes are resolution-free); must
        # be even after the adapter's unshuffle+pool chain
        lat = 8
        s = lat * cfg.vae_factor
        x = jnp.zeros((v, lat, lat, cfg.unet.in_channels))
        ctx = jnp.zeros((v, cfg.prompt_tokens, cfg.prompt_dim))
        params = {
            "unet": self_.unet.init(
                k1, x, jnp.zeros((v,)), ctx,
                added_text_emb=jnp.zeros((v, cfg.pooled_dim)),
                added_time_ids=jnp.zeros((v, 6)))["params"],
            "cond_encoder": self_.cond_encoder.init(
                k2, jnp.zeros(
                    (v, s, s, cfg.adapter.in_channels)))["params"],
            "vae": AutoencoderKL(cfg.vae).init(
                k3, jnp.zeros((1, 64, 64, 3)))["params"],
        }
        self_.params = params
        return self_

    def set_prompt_embeds(self, embeds, negative=None, pooled=None,
                          negative_pooled=None):
        self.prompt_embeds = np.asarray(embeds, np.float32)
        if negative is not None:
            self.negative_embeds = np.asarray(negative, np.float32)
        if pooled is not None:
            self.pooled_embeds = np.asarray(pooled, np.float32)
        if negative_pooled is not None:
            self.negative_pooled = np.asarray(negative_pooled,
                                              np.float32)

    def _control_features(self, pos_maps, normal_maps, scale):
        ctrl = jnp.concatenate([pos_maps, normal_maps], axis=-1)
        feats = self.cond_encoder.apply(
            {"params": self.params["cond_encoder"]}, ctrl)
        # CFG: both streams get the control features
        # (prepare_control_image duplicates, pipeline:660-676)
        return [jnp.concatenate([f, f], axis=0) * scale for f in feats]

    def _time_ids(self, size: int):
        # [original h, w, crop top, left, target h, w]
        # (pipeline _get_add_time_ids)
        return jnp.asarray([size, size, 0, 0, size, size], jnp.float32)

    def _decode(self, latents):
        img = self.vae.apply({"params": self.params["vae"]},
                             latents / self.cfg.vae_scaling,
                             method=AutoencoderKL.decode)
        return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)


class MVAdapterIG2MVPipeline(_MVAdapterBase):
    """Reference image + mesh geometry → 6 views."""

    @partial(jax.jit, static_argnums=(0, 5, 7))
    def _denoise(self, params, noise, feats, img_lat, num_steps: int,
                 guidance_scale, scheduler_name, cond, uncond,
                 pooled, neg_pooled, time_ids):
        cfg = self.cfg
        v = cfg.num_views
        sched = schedulers.make_scheduler(scheduler_name, cfg.scheduler,
                                          num_steps)
        states = jnp.concatenate(
            [jnp.tile(uncond[None], (v, 1, 1)),
             jnp.tile(cond[None], (v, 1, 1))], axis=0)
        ptxt = jnp.concatenate(
            [jnp.tile(neg_pooled[None], (v, 1)),
             jnp.tile(pooled[None], (v, 1))], axis=0)
        tids = jnp.tile(time_ids[None], (2 * v, 1))

        # reference pass: ONCE, clean ref latents, t=0, cond prompt
        # (pipeline:622-641); the write pass disables mv/ref branches
        _, ref = self.unet.apply(
            {"params": params["unet"]}, img_lat, jnp.zeros((1,)),
            cond[None], ref_mode="write",
            added_text_emb=pooled[None],
            added_time_ids=time_ids[None])
        # CFG: uncond stream reads ZEROED ref tokens (pipeline:645-649)
        ref2 = jax.tree.map(
            lambda t: jnp.concatenate(
                [jnp.zeros_like(jnp.repeat(t, v, axis=0)),
                 jnp.repeat(t, v, axis=0)], axis=0), ref)

        def denoise_fn(x_in, i, t):
            tvec = jnp.full((2 * v,), t, jnp.float32)
            x2 = jnp.concatenate([x_in, x_in], axis=0)
            eps, _ = self.unet.apply(
                {"params": params["unet"]}, x2, tvec, states,
                ref_mode="read", ref_hidden=ref2,
                intrablock_residuals=feats,
                added_text_emb=ptxt, added_time_ids=tids)
            e_u, e_c = jnp.split(eps, 2, axis=0)
            return e_u + guidance_scale * (e_c - e_u)

        return schedulers.sample_loop(sched, denoise_fn,
                                      noise * sched.init_sigma)

    def __call__(self, mesh, image, num_inference_steps: int = 50,
                 guidance_scale: float = 3.0,
                 reference_conditioning_scale: float = 1.0,
                 control_conditioning_scale: float = 1.0,
                 seed: int = 0, size: Optional[int] = None):
        """→ (views [V,S,S,3], pos_maps, normal_maps)."""
        cfg = self.cfg
        s = size or cfg.image_size
        pos_maps, normal_maps = render_control_images(mesh, cfg, s)
        feats = self._control_features(
            pos_maps, normal_maps, float(control_conditioning_scale))
        image = jnp.asarray(image, jnp.float32)
        if image.ndim == 3:
            image = image[None]
        if image.shape[1] != s:
            image = jax.image.resize(image, (1, s, s, 3), "bilinear")
        img_lat = self.vae.apply({"params": self.params["vae"]},
                                 image * 2.0 - 1.0,
                                 method=AutoencoderKL.encode)
        img_lat = img_lat * cfg.vae_scaling \
            * float(reference_conditioning_scale)
        noise = jax.random.normal(
            jax.random.PRNGKey(max(seed, 0)),
            (cfg.num_views, img_lat.shape[1], img_lat.shape[2], 4))
        out = self._denoise(self.params, noise, feats, img_lat,
                            int(num_inference_steps),
                            jnp.float32(guidance_scale),
                            getattr(self, "scheduler_name", None)
                            or "DDPMScheduler",
                            jnp.asarray(self.prompt_embeds),
                            jnp.asarray(self.negative_embeds),
                            jnp.asarray(self.pooled_embeds),
                            jnp.asarray(self.negative_pooled),
                            self._time_ids(s))
        return self._decode(out), pos_maps, normal_maps


class MVAdapterTG2MVPipeline(_MVAdapterBase):
    """Text + mesh geometry → 6 views (use_ref=False,
    pipeline_mvadapter_t2mv_sdxl.py:719-757)."""

    def __init__(self, params, cfg: MVAdapterConfig = MVAdapterConfig()):
        super().__init__(params, dataclasses.replace(cfg,
                                                     use_ref=False))

    @classmethod
    def init_random(cls, key=None,
                    cfg: MVAdapterConfig = MVAdapterConfig()):
        return super().init_random(
            key=key, cfg=dataclasses.replace(cfg, use_ref=False))

    @partial(jax.jit, static_argnums=(0, 4, 6))
    def _denoise(self, params, noise, feats, num_steps: int,
                 guidance_scale, scheduler_name, cond, uncond,
                 pooled, neg_pooled, time_ids):
        cfg = self.cfg
        v = cfg.num_views
        sched = schedulers.make_scheduler(scheduler_name, cfg.scheduler,
                                          num_steps)
        states = jnp.concatenate(
            [jnp.tile(uncond[None], (v, 1, 1)),
             jnp.tile(cond[None], (v, 1, 1))], axis=0)
        ptxt = jnp.concatenate(
            [jnp.tile(neg_pooled[None], (v, 1)),
             jnp.tile(pooled[None], (v, 1))], axis=0)
        tids = jnp.tile(time_ids[None], (2 * v, 1))

        def denoise_fn(x_in, i, t):
            tvec = jnp.full((2 * v,), t, jnp.float32)
            x2 = jnp.concatenate([x_in, x_in], axis=0)
            eps, _ = self.unet.apply(
                {"params": params["unet"]}, x2, tvec, states,
                intrablock_residuals=feats,
                added_text_emb=ptxt, added_time_ids=tids)
            e_u, e_c = jnp.split(eps, 2, axis=0)
            return e_u + guidance_scale * (e_c - e_u)

        return schedulers.sample_loop(sched, denoise_fn,
                                      noise * sched.init_sigma)

    def __call__(self, mesh, num_inference_steps: int = 50,
                 guidance_scale: float = 7.0,
                 control_conditioning_scale: float = 1.0,
                 seed: int = 0, size: Optional[int] = None):
        cfg = self.cfg
        s = size or cfg.image_size
        pos_maps, normal_maps = render_control_images(mesh, cfg, s)
        feats = self._control_features(
            pos_maps, normal_maps, float(control_conditioning_scale))
        lat = s // cfg.vae_factor
        noise = jax.random.normal(
            jax.random.PRNGKey(max(seed, 0)),
            (cfg.num_views, lat, lat, 4))
        out = self._denoise(self.params, noise, feats,
                            int(num_inference_steps),
                            jnp.float32(guidance_scale),
                            getattr(self, "scheduler_name", None)
                            or "DDPMScheduler",
                            jnp.asarray(self.prompt_embeds),
                            jnp.asarray(self.negative_embeds),
                            jnp.asarray(self.pooled_embeds),
                            jnp.asarray(self.negative_pooled),
                            self._time_ids(s))
        return self._decode(out), pos_maps, normal_maps
