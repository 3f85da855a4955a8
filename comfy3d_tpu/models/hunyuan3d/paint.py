"""Hunyuan3D-V2 paint: mesh + reference image → textured mesh.

Counterpart of `Gen_3D_Modules/Hunyuan3D_V2/hy3dgen/texgen/
pipelines.py:53-231` (`Hunyuan3DPaintPipeline`) and the multiview
model it drives (`hunyuanpaint/pipeline.py:193`):

1. render per-view geometry images — world-space normal maps
   (`use_abs_coor=True`) and position (CCM) maps — for the 6 candidate
   cameras (azims [0,90,180,270,0,180], elevs [0,0,0,0,90,-90],
   pipelines.py:40-42);
2. a 6-view SD UNet (our `mv_views` joint attention) denoises the view
   latents with the VAE-encoded normal+position latents concatenated
   on channels (in 4+4+4), the reference image injected by reference
   attention (write/read), and a per-view camera_info class embedding
   (pipelines.py:209-212);
3. cos^bake_exp view-weighted back-projection with the candidate view
   weights [1,.1,.5,.1,.05,.05] → UV texture bake + inpaint
   (`bake_from_multiview` / `texture_inpaint`, pipelines.py:118-143).

The delight model (lighting remover, a one-step SD img2img) slot is
pluggable via `set_delight`; identity by default.

All 6 views denoise as ONE batched jit program — the MV UNet batch is
the view axis, so the whole loop is a lax.fori_loop over steps with
every matmul MXU-shaped [6·HW, C]; the reference's per-view Python
loop (and its CUDA custom_rasterizer) have no TPU counterpart to
translate.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.schedulers import make_scheduler, SchedulerConfig
from ..diffusion.unet import UNet2DCondition, UNetConfig
from ..diffusion.vae import AutoencoderKL, VAEConfig


@dataclasses.dataclass(frozen=True)
class PaintConfig:
    render_size: int = 512
    texture_size: int = 1024
    camera_azims: Tuple[float, ...] = (0., 90., 180., 270., 0., 180.)
    camera_elevs: Tuple[float, ...] = (0., 0., 0., 0., 90., -90.)
    view_weights: Tuple[float, ...] = (1., .1, .5, .1, .05, .05)
    camera_distance: float = 1.45
    bake_exp: float = 4.0
    # camera_info embedding table: 5 reference labels + 44 gen labels
    # (UNet2p5D init_camera_embedding, hunyuanpaint/unet/modules.py:
    # 450-456: max_num_ref_image=5, max_num_gen_image=44); gen labels
    # from `_camera_info` are offset by num_ref_cls at lookup
    num_cls: int = 49
    num_ref_cls: int = 5
    prompt_tokens: int = 77
    prompt_dim: int = 1024
    # Hunyuan 2.1 PBR: attribute groups denoised jointly with learned
    # per-attribute prompt embeddings (hunyuanpaintpbr/unet/model.py:56,
    # 332-335: pbr_settings + learned_text_clip_{albedo,mr}); empty →
    # RGB-only (the V2 paint model)
    pbr_settings: Tuple[str, ...] = ()
    unet: UNetConfig = UNetConfig(
        in_channels=12, out_channels=4, cross_attention_dim=1024,
        mv_views=6)
    vae: VAEConfig = VAEConfig()
    scheduler: SchedulerConfig = SchedulerConfig(
        prediction_type="v_prediction", timestep_spacing="trailing")
    vae_scaling: float = 0.18215


class _ClsEmbed(nn.Module):
    num_cls: int
    dim: int

    @nn.compact
    def __call__(self, labels):
        table = self.param("embedding", nn.initializers.normal(0.02),
                           (self.num_cls, self.dim))
        return table[labels]


def _camera_info(azims, elevs) -> np.ndarray:
    """pipelines.py:209-212 — discretized per-view camera label."""
    div = {-20: 1, 0: 1, 20: 1, -90: 3, 90: 3}
    off = {-20: 0, 0: 12, 20: 24, -90: 36, 90: 40}
    return np.array(
        [(((int(a) // 30) + 9) % 12) // div[int(e)] + off[int(e)]
         for a, e in zip(azims, elevs)], np.int32)


class Hunyuan3DPaintPipeline:
    def __init__(self, params, cfg: PaintConfig = PaintConfig()):
        self.cfg = cfg
        # gen stream always carries the 2p5D attentions (attn_refview +
        # attn_multiview, hunyuanpaint/unet/modules.py:409-418); the
        # dual ("write") stream is the original 4-channel UNet copied
        # before conv_in widening, with neither (modules.py:415-417)
        self.gen_cfg = dataclasses.replace(
            cfg.unet, use_ma=True, use_ra=True,
            mv_views=len(cfg.camera_azims))
        self.dual_cfg = dataclasses.replace(
            cfg.unet, in_channels=4, use_ma=False, use_ra=False,
            mv_views=1)
        self.unet = UNet2DCondition(self.gen_cfg)
        self.unet_dual = UNet2DCondition(self.dual_cfg)
        self.vae = AutoencoderKL(cfg.vae)
        self.cls_embed = _ClsEmbed(cfg.num_cls,
                                   cfg.unet.block_out_channels[0] * 4)
        self.params = params
        self.delight = None            # image [H,W,3] -> [H,W,3]
        self.superres = None           # views [V,S,S,3] -> [V,S',S',3]
        self.vision_encoder = None

    @classmethod
    def init_random(cls, key=None, cfg: Optional[PaintConfig] = None
                    ) -> "Hunyuan3DPaintPipeline":
        cfg = cfg or PaintConfig()
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
        v = len(cfg.camera_azims)
        # param shapes don't depend on spatial dims (no learned pos
        # emb in the UNet) — init with a tiny probe so flax init never
        # runs full-resolution attention on host
        lat = min(cfg.render_size // 8, 8)
        self_ = cls({}, cfg)
        params = {
            "unet": self_.unet.init(
                k1, jnp.zeros((v, lat, lat, cfg.unet.in_channels)),
                jnp.zeros((v,)),
                jnp.zeros((v, cfg.prompt_tokens, cfg.prompt_dim)),
                class_emb=jnp.zeros(
                    (v, cfg.unet.block_out_channels[0] * 4)))["params"],
            "unet_dual": self_.unet_dual.init(
                k5, jnp.zeros((1, lat, lat, 4)), jnp.zeros((1,)),
                jnp.zeros((1, cfg.prompt_tokens, cfg.prompt_dim)),
                class_emb=jnp.zeros(
                    (1, cfg.unet.block_out_channels[0] * 4)))["params"],
            "vae": AutoencoderKL(cfg.vae).init(
                k2, jnp.zeros((1, 64, 64, 3)))["params"],
            "cls": _ClsEmbed(cfg.num_cls,
                             cfg.unet.block_out_channels[0] * 4).init(
                k3, jnp.zeros((v,), jnp.int32))["params"],
            # learned_text_clip_{gen,ref} (modules.py:447-448)
            "text_gen": 0.02 * jax.random.normal(
                k6, (cfg.prompt_tokens, cfg.prompt_dim)),
            "text_ref": 0.02 * jax.random.normal(
                jax.random.fold_in(k6, 1),
                (cfg.prompt_tokens, cfg.prompt_dim)),
        }
        if cfg.pbr_settings:
            # learned_text_clip_{attr} role (2.1 model.py:332-335)
            params["attr_embeds"] = 0.02 * jax.random.normal(
                k4, (len(cfg.pbr_settings), cfg.prompt_tokens,
                     cfg.prompt_dim))
        self_.params = params
        return self_

    def set_delight(self, fn):
        self.delight = fn

    def set_superres(self, fn):
        """Per-view enhancement before baking (the RealESRGAN slot,
        textureGenPipeline.py:160-166)."""
        self.superres = fn

    # ---------------------------------------------------------------- #
    def render_geometry(self, mesh):
        """→ (normal_maps [V,S,S,3] in [0,1], position_maps [V,S,S,3]
        in [0,1]) for the candidate cameras."""
        from ...core.camera import Camera
        from ...ops import rasterize as R
        cfg = self.cfg
        s = cfg.render_size
        v = jnp.asarray(mesh.v, jnp.float32)
        f = jnp.asarray(mesh.f, jnp.int32)
        if mesh.vn is None:
            mesh = mesh.auto_normal()
        vn = jnp.asarray(mesh.vn, jnp.float32)
        normals, positions = [], []
        for e, a in zip(cfg.camera_elevs, cfg.camera_azims):
            cam = Camera.from_orbit(float(e), float(a),
                                    cfg.camera_distance,
                                    width=s, height=s)
            rast = R.rasterize(v, f, cam.view_proj, s, s)
            n_img = R.interpolate(vn, rast, f)     # world-space normals
            p_img = R.interpolate(v, rast, f)
            hit = rast.mask[..., None]
            normals.append(jnp.where(hit, n_img * 0.5 + 0.5, 0.0))
            positions.append(jnp.where(hit, p_img * 0.5 + 0.5, 0.0))
        return jnp.stack(normals), jnp.stack(positions)

    def _encode(self, images):
        lat = self.vae.apply({"params": self.params["vae"]},
                             images * 2.0 - 1.0,
                             method=AutoencoderKL.encode)
        return lat * self.cfg.vae_scaling

    @partial(jax.jit, static_argnums=(0, 5, 7))
    def _denoise(self, params, geom_lat, img_lat, cam_labels,
                 num_steps: int, guidance_scale,
                 scheduler_name: str = "EulerAncestralDiscreteScheduler",
                 noise=None):
        """Rows are ordered [attr, view] — each contiguous `mv_views`
        group is one pbr-attribute set, so the joint MV attention never
        mixes attributes (the SelfAttnProcessor per-attribute split of
        hunyuanpaintpbr/unet/attn_processor.py:745-756).

        Reference conditioning follows the checkpoint contract
        (hunyuanpaint/unet/modules.py:525-558 + pipeline.py:338-341):
        the dual-stream UNet runs ONCE on the clean reference latents at
        t=0 with the learned ref text tokens, capturing per-block norm1
        tokens; the gen UNet reads them through attn_refview. CFG: the
        uncond stream has zero prompt tokens and ref_scale 0 (here: no
        ref read at all), the cond stream learned_text_clip_gen (or the
        per-attribute tokens) and ref_scale 1."""
        cfg = self.cfg
        nv = geom_lat.shape[0]
        n_pbr = max(1, len(cfg.pbr_settings))
        rows = n_pbr * nv
        sched = make_scheduler(scheduler_name, cfg.scheduler, num_steps)
        cls_gen = self.cls_embed.apply(
            {"params": params["cls"]}, cam_labels + cfg.num_ref_cls)
        cls_gen = jnp.tile(cls_gen, (n_pbr, 1))
        # reference write pass: clean latents, timestep 0, ref label 0
        n_ref = img_lat.shape[0]
        cls_ref = self.cls_embed.apply(
            {"params": params["cls"]}, jnp.zeros((n_ref,), jnp.int32))
        ctx_ref = jnp.tile(params["text_ref"][None], (n_ref, 1, 1))
        _, ref = self.unet_dual.apply(
            {"params": params["unet_dual"]}, img_lat,
            jnp.zeros((n_ref,)), ctx_ref, ref_mode="write",
            class_emb=cls_ref)
        if cfg.pbr_settings:
            ctx_c = jnp.repeat(params["attr_embeds"], nv, axis=0)
        else:
            ctx_c = jnp.tile(params["text_gen"][None], (rows, 1, 1))
        ctx_u = jnp.zeros_like(ctx_c)
        geom = jnp.tile(geom_lat, (n_pbr, 1, 1, 1))
        latents = noise * sched.init_sigma

        def body(i, carry):
            latents, aux, key = carry
            key, k_step = jax.random.split(key)
            t = sched.timesteps[i]
            tvec = jnp.full((rows,), t, jnp.float32)
            x = sched.scale_model_input(latents, i)
            x = jnp.concatenate([x, geom], axis=-1)
            e_u, _ = self.unet.apply(
                {"params": params["unet"]}, x, tvec, ctx_u,
                class_emb=cls_gen)
            e_c, _ = self.unet.apply(
                {"params": params["unet"]}, x, tvec, ctx_c,
                ref_mode="read", ref_hidden=ref, class_emb=cls_gen)
            eps = e_u + guidance_scale * (e_c - e_u)
            latents, aux = sched.step_aux(eps, i, latents, aux,
                                          key=k_step)
            return latents, aux, key

        latents, _, _ = jax.lax.fori_loop(
            0, sched.loop_steps, body,
            (latents, sched.init_aux(latents), jax.random.PRNGKey(0)))
        return latents

    def paint_views(self, mesh, image, num_steps: int = 15,
                    guidance_scale: float = 3.0, seed: int = 0):
        """→ views [V, S, S, 3] in [0,1]; with pbr_settings a dict
        {attr: [V, S, S, 3]} (albedo + metallic/roughness views)."""
        cfg = self.cfg
        s = cfg.render_size
        n_pbr = max(1, len(cfg.pbr_settings))
        image = jnp.asarray(image, jnp.float32)
        if image.ndim == 3:
            image = image[None]
        if image.shape[1] != s:
            image = jax.image.resize(image, (1, s, s, 3), "bilinear")
        if self.delight is not None:
            image = self.delight(image)
        normals, positions = self.render_geometry(mesh)
        n_lat = self._encode(normals)
        p_lat = self._encode(positions)
        geom_lat = jnp.concatenate([n_lat, p_lat], axis=-1)
        img_lat = self._encode(image)
        labels = jnp.asarray(_camera_info(cfg.camera_azims,
                                          cfg.camera_elevs))
        noise = jax.random.normal(
            jax.random.PRNGKey(seed),
            (n_pbr * geom_lat.shape[0],) + geom_lat.shape[1:3] + (4,))
        out = self._denoise(self.params, geom_lat, img_lat, labels,
                            int(num_steps), jnp.float32(guidance_scale),
                            getattr(self, "scheduler_name", None)
                            or "EulerAncestralDiscreteScheduler",
                            noise)
        views = self.vae.apply({"params": self.params["vae"]},
                               out / cfg.vae_scaling,
                               method=AutoencoderKL.decode)
        views = jnp.clip(views * 0.5 + 0.5, 0.0, 1.0)
        if not cfg.pbr_settings:
            return views
        nv = geom_lat.shape[0]
        return {attr: views[i * nv:(i + 1) * nv]
                for i, attr in enumerate(cfg.pbr_settings)}

    def _bake(self, mesh, views, cams):
        from ...algorithms import color_project
        cfg = self.cfg
        views = np.asarray(views)
        if self.superres is not None:
            views = np.asarray(self.superres(views))
            if views.shape[1] != cfg.render_size:
                import jax.image as jimage
                views = np.asarray(jimage.resize(
                    jnp.asarray(views),
                    (views.shape[0], cfg.render_size, cfg.render_size,
                     3), "bilinear"))
        return color_project.bake_projection(
            mesh, views, cams, texture_size=cfg.texture_size,
            cos_power=cfg.bake_exp, view_weights=cfg.view_weights)

    def __call__(self, mesh, image, num_steps: int = 15,
                 guidance_scale: float = 3.0, seed: int = 0):
        """mesh + reference image [H,W,3] → mesh with baked albedo
        (+ metallicRoughness texture in PBR mode, the
        textureGenPipeline.py:174-217 role)."""
        from ...core.camera import Camera
        cfg = self.cfg
        views = self.paint_views(mesh, image, num_steps,
                                 guidance_scale, seed)
        cams = Camera.from_orbit(
            np.asarray(cfg.camera_elevs, np.float32),
            np.asarray(cfg.camera_azims, np.float32),
            cfg.camera_distance, width=cfg.render_size,
            height=cfg.render_size)
        if not cfg.pbr_settings:
            return self._bake(mesh, views, cams).auto_normal()
        out = self._bake(mesh, views["albedo"], cams)
        if "mr" in views:
            from ...core.mesh import Mesh
            mr_carrier = Mesh(v=out.v, f=out.f, vt=out.vt, ft=out.ft,
                              vn=out.vn)
            mr_carrier = self._bake(mr_carrier, views["mr"], cams)
            out.metallic_roughness = np.asarray(mr_carrier.albedo)
        return out.auto_normal()
