"""MVDream / ImageDream: text (or image) → 4 consistent orbit views.

Counterpart of the reference `MVDreamPipeline`
(`Gen_3D_Modules/LGM/mvdream/pipeline_mvdream.py`, fed to LGM by the
MVDream_Model node, `nodes.py:1716`), re-derived: an SD-1.5-class UNet
with 3D self-attention across the 4 views (UNetConfig.mv_views) and a
camera embedding — the flattened 4×4 c2w per view through a small MLP —
added to the time embedding (the MVDream camera-conditioning hook).
DDIM sampling with CFG.

Text conditioning is pluggable: pass `prompt_embeds` [77, D] (from a CLIP
text encoder when weights are available); the uncond embedding defaults
to zeros.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.schedulers import (SchedulerConfig, make_scheduler,
                                     sample_loop)
from ..diffusion.unet import UNet2DCondition, UNetConfig
from ..diffusion.vae import AutoencoderKL, VAEConfig


@dataclasses.dataclass(frozen=True)
class MVDreamConfig:
    image_size: int = 256
    num_views: int = 4
    camera_elevation: float = 0.0
    camera_radius: float = 1.5
    unet: UNetConfig = dataclasses.field(
        default_factory=lambda: dataclasses.replace(UNetConfig.sd15(),
                                                    mv_views=4))
    vae: VAEConfig = VAEConfig()
    prompt_tokens: int = 77
    prompt_dim: int = 768
    camera_dim: int = 16
    # ImageDream ("ipmv"): ip_dim image-prompt tokens from a Resampler
    # over CLIP penultimate hidden states; the conditioning image's VAE
    # latent rides as an extra (num_views+1)-th frame
    # (LGM/mvdream/mv_unet.py:746-760, pipeline_mvdream.py:483-526)
    ip_dim: int = 0
    ip_weight: float = 1.0
    ip_embed_dim: int = 1280      # CLIP ViT-H hidden size
    resampler_depth: int = 4
    resampler_heads: int = 12
    resampler_dim_head: int = 64

    @property
    def vae_factor(self) -> int:
        return 2 ** (len(self.vae.block_out_channels) - 1)


class PerceiverAttention(nn.Module):
    """mv_unet.py:355-403: latents query [image tokens ; latents]."""
    dim: int
    heads: int
    dim_head: int

    @nn.compact
    def __call__(self, x, latents):
        inner = self.heads * self.dim_head
        x = nn.LayerNorm(name="norm1")(x)
        latents = nn.LayerNorm(name="norm2")(latents)
        b, l, _ = latents.shape
        q = nn.Dense(inner, use_bias=False, name="to_q")(latents)
        kv_in = jnp.concatenate([x, latents], axis=1)
        kv = nn.Dense(inner * 2, use_bias=False, name="to_kv")(kv_in)
        k, v = jnp.split(kv, 2, axis=-1)
        nk = k.shape[1]
        q = q.reshape(b, l, self.heads, self.dim_head)
        k = k.reshape(b, nk, self.heads, self.dim_head)
        v = v.reshape(b, nk, self.heads, self.dim_head)
        out = jax.nn.dot_product_attention(q, k, v)
        return nn.Dense(self.dim, use_bias=False,
                        name="to_out")(out.reshape(b, l, inner))


class Resampler(nn.Module):
    """ImageDream image-prompt projector (mv_unet.py:406-450): learned
    query latents attend to CLIP image tokens over `depth` perceiver
    blocks → ip_dim tokens of output_dim."""
    dim: int
    depth: int
    dim_head: int
    heads: int
    num_queries: int
    output_dim: int
    ff_mult: int = 4

    @nn.compact
    def __call__(self, x):
        lat = self.param("latents", nn.initializers.normal(
            self.dim ** -0.5), (1, self.num_queries, self.dim))
        latents = jnp.broadcast_to(
            lat, (x.shape[0], self.num_queries, self.dim))
        x = nn.Dense(self.dim, name="proj_in")(x)
        for i in range(self.depth):
            latents = latents + PerceiverAttention(
                self.dim, self.heads, self.dim_head,
                name=f"layers_{i}_attn")(x, latents)
            h = nn.LayerNorm(name=f"layers_{i}_norm")(latents)
            h = nn.Dense(self.dim * self.ff_mult, use_bias=False,
                         name=f"layers_{i}_fc1")(h)
            h = nn.Dense(self.dim, use_bias=False,
                         name=f"layers_{i}_fc2")(
                nn.gelu(h, approximate=False))
            latents = latents + h
        out = nn.Dense(self.output_dim, name="proj_out")(latents)
        return nn.LayerNorm(name="norm_out")(out)


class CameraEmbed(nn.Module):
    """flattened c2w [B, 16] → time-embedding-sized vector (MVDream's
    camera MLP added to the timestep embedding)."""
    dim: int

    @nn.compact
    def __call__(self, cam):
        h = nn.Dense(self.dim, name="linear_1")(cam)
        return nn.Dense(self.dim, name="linear_2")(nn.silu(h))


def orbit_c2w_flat(num_views: int, elevation: float, radius: float):
    from ...core.camera import orbit_c2w
    azims = jnp.arange(num_views) * (360.0 / num_views)
    c2w = orbit_c2w(jnp.full((num_views,), elevation), azims, radius)
    return c2w.reshape(num_views, 16)


class MVDreamPipeline:
    def __init__(self, params, cfg: MVDreamConfig = MVDreamConfig()):
        self.cfg = cfg
        self.params = params
        self.unet = UNet2DCondition(cfg.unet)
        self.vae = AutoencoderKL(cfg.vae)
        self.cam_embed = CameraEmbed(cfg.unet.block_out_channels[0] * 4)
        self.resampler = None
        if cfg.ip_dim > 0:
            self.resampler = Resampler(
                dim=cfg.prompt_dim, depth=cfg.resampler_depth,
                dim_head=cfg.resampler_dim_head,
                heads=cfg.resampler_heads, num_queries=cfg.ip_dim,
                output_dim=cfg.prompt_dim)
        # pluggable CLIP hooks (loaded from the checkpoint when present)
        self.vision_encoder = None   # image → penultimate tokens
        self.prompt_encoder = None   # unused when embeds passed directly

    def set_vision_encoder(self, fn):
        self.vision_encoder = fn

    @classmethod
    def init_random(cls, key=None, cfg: MVDreamConfig = MVDreamConfig()
                    ) -> "MVDreamPipeline":
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        lat = cfg.image_size // cfg.vae_factor
        unet = UNet2DCondition(cfg.unet)
        ctx_tokens = cfg.prompt_tokens + cfg.ip_dim
        unet_params = unet.init(
            k1, jnp.zeros((cfg.num_views, lat, lat,
                           cfg.unet.in_channels)),
            jnp.zeros((cfg.num_views,)),
            jnp.zeros((cfg.num_views, ctx_tokens, cfg.prompt_dim)),
            class_emb=jnp.zeros(
                (cfg.num_views, cfg.unet.block_out_channels[0] * 4))
        )["params"]
        vae_params = AutoencoderKL(cfg.vae).init(
            k2, jnp.zeros((1, 64, 64, 3)))["params"]
        cam_params = CameraEmbed(cfg.unet.block_out_channels[0] * 4).init(
            k3, jnp.zeros((1, cfg.camera_dim)))["params"]
        params = {"unet": unet_params, "vae": vae_params,
                  "camera": cam_params}
        if cfg.ip_dim > 0:
            params["resampler"] = Resampler(
                dim=cfg.prompt_dim, depth=cfg.resampler_depth,
                dim_head=cfg.resampler_dim_head,
                heads=cfg.resampler_heads, num_queries=cfg.ip_dim,
                output_dim=cfg.prompt_dim).init(
                k4, jnp.zeros((1, 5, cfg.ip_embed_dim)))["params"]
        return cls(params, cfg)

    @classmethod
    def from_pretrained(cls, path: str,
                        **cfg_overrides) -> "MVDreamPipeline":
        """Load an ashawkey/imagedream-ipmv-diffusers (or mvdream-sd2.1)
        directory: the LDM-layout MultiViewUNetModel through
        `convert.mv_unet_rules`, AutoencoderKL, CLIP text encoder for
        the empty prompt, CLIPVisionModel for IP conditioning."""
        from .convert import load_mvdream_dir
        return load_mvdream_dir(cls, path, **cfg_overrides)

    @classmethod
    def from_ldm_checkpoint(cls, ckpt_path: str,
                            **cfg_overrides) -> "MVDreamPipeline":
        """Load a single-file LDM checkpoint (the CRM
        pixel/ccm-diffusion stages, reference nodes.py:2188-2211)."""
        from .convert import load_ldm_checkpoint
        return load_ldm_checkpoint(cls, ckpt_path, **cfg_overrides)

    def __call__(self, prompt_embeds: Optional[np.ndarray] = None,
                 negative_embeds: Optional[np.ndarray] = None,
                 image: Optional[np.ndarray] = None,
                 num_inference_steps: int = 30,
                 guidance_scale: float = 7.0, seed: int = 0,
                 elevation: Optional[float] = None,
                 adapter_residuals=None,
                 pixel_images: Optional[np.ndarray] = None):
        """→ [V, S, S, 3] images in [0,1].

        image: [S, S, 3] in [0,1] — ImageDream conditioning (requires
        cfg.ip_dim > 0): IP tokens from the CLIP penultimate states ride
        the context, and the image's VAE latent is pinned as the
        (V+1)-th frame each step (pipeline_mvdream.py:483-526).
        adapter_residuals: optional T2I-Adapter feature pyramid (one
        [V, h, w, c] per down stage — the CRM T2I conditioning path);
        applied to both CFG branches.
        pixel_images: [V, S, S, 3] in [0,1] — CRM stage-2 ("Stage2")
        conditioning: each view's VAE latent is channel-concatenated to
        the noisy latent at every step (in_channels 4→8; zeros on the
        uncond half). Matches `MultiViewUNetModelStage2.forward`
        (CRM/imagedream/.../openaimodel.py:1113-1117 `x = cat((x,
        pixel_images), 1)`) and `ImageDreamDiffusionStage2.i2iStage2`
        (CRM/libs/sample.py:307-311). Stage-2 samplers keep num_frames
        == num_views (ref_position null), so no extra ip frame is
        pinned — the reference image still contributes IP tokens."""
        cfg = self.cfg
        v = cfg.num_views
        use_pixel = pixel_images is not None
        if use_pixel and cfg.unet.in_channels != 8:
            import warnings
            warnings.warn(
                "pixel_images conditioning needs a stage-2 (in_channels"
                f"=8) UNet; this pipeline has {cfg.unet.in_channels} — "
                "ignoring pixel_images")
            use_pixel = False
        if cfg.unet.in_channels == 8 and not use_pixel:
            raise ValueError(
                "stage-2 (in_channels=8) UNet requires pixel_images")
        use_ip = image is not None and cfg.ip_dim > 0
        # stage-2 keeps F == V (camera_views has no ref slot)
        pin_frame = use_ip and not use_pixel
        nf = v + 1 if pin_frame else v    # actual_num_frames
        emb_dim = cfg.prompt_dim
        if prompt_embeds is None:
            prompt_embeds = getattr(
                self, "default_prompt_embeds",
                np.zeros((cfg.prompt_tokens, emb_dim), np.float32))
        if negative_embeds is None:
            negative_embeds = getattr(
                self, "default_negative_embeds",
                np.zeros_like(prompt_embeds))
        cond = jnp.tile(jnp.asarray(prompt_embeds)[None], (nf, 1, 1))
        uncond = jnp.tile(jnp.asarray(negative_embeds)[None],
                          (nf, 1, 1))

        ip_img2 = None
        if use_ip:
            img = jnp.asarray(image, jnp.float32)
            if img.ndim == 3:
                img = img[None]
            if self.vision_encoder is not None:
                hidden = self.vision_encoder(img)        # [1, N, 1280]
            else:
                hidden = jnp.zeros((1, 257, cfg.ip_embed_dim))
            rs = partial(self.resampler.apply,
                         {"params": self.params["resampler"]})
            ip_pos = rs(hidden)                          # [1, ip, D]
            ip_neg = rs(jnp.zeros_like(hidden))
            cond = jnp.concatenate(
                [cond, jnp.tile(ip_pos, (nf, 1, 1))], axis=1)
            uncond = jnp.concatenate(
                [uncond, jnp.tile(ip_neg, (nf, 1, 1))], axis=1)
            if pin_frame:
                # cond image VAE latent pinned as the extra frame
                # (encode already applies the scaling factor)
                s = cfg.image_size
                img_s = jax.image.resize(img, (1, s, s, 3), "bilinear")
                lat_img = self.vae.apply(
                    {"params": self.params["vae"]}, img_s * 2.0 - 1.0,
                    method=AutoencoderKL.encode)
                ip_img2 = jnp.concatenate(
                    [jnp.zeros_like(lat_img), lat_img])  # [neg, pos]
        states = jnp.concatenate([uncond, cond])         # [2F, T(+ip), D]

        pix2 = None
        if use_pixel:
            pix = jnp.asarray(pixel_images, jnp.float32)
            s = cfg.image_size
            if pix.shape[1] != s or pix.shape[2] != s:
                pix = jax.image.resize(pix, (pix.shape[0], s, s, 3),
                                       "bilinear")
            pix_lat = self.vae.apply(
                {"params": self.params["vae"]}, pix * 2.0 - 1.0,
                method=AutoencoderKL.encode)             # [V, l, l, 4]
            pix2 = jnp.concatenate(
                [jnp.zeros_like(pix_lat), pix_lat])      # [neg, pos]

        cams = orbit_c2w_flat(v, elevation if elevation is not None
                              else cfg.camera_elevation, cfg.camera_radius)
        if pin_frame:
            cams = jnp.concatenate(
                [cams, jnp.zeros((1, 16))])   # extra view: zero camera
        cam_emb = self.cam_embed.apply({"params": self.params["camera"]},
                                       cams)
        cam_emb2 = jnp.concatenate([cam_emb, cam_emb])

        sched = make_scheduler(
            getattr(self, "scheduler_name", None) or "DDIMScheduler",
            SchedulerConfig(), num_inference_steps)
        lat = cfg.image_size // cfg.vae_factor
        key = jax.random.PRNGKey(seed)
        latents = jax.random.normal(key, (nf, lat, lat, 4)) \
            * sched.init_sigma

        unet_apply = partial(self.unet.apply,
                             {"params": self.params["unet"]})

        ad2 = (None if adapter_residuals is None else
               [jnp.concatenate([r, r]) for r in adapter_residuals])

        def denoise_fn(x_in, i, t):
            lat_in = jnp.concatenate([x_in, x_in])
            if ip_img2 is not None:
                # pin the clean cond latent at the extra-frame slot of
                # each CFG half (mv_unet.py forward: x[(F-1)::F] = ip_img)
                lat_in = lat_in.at[nf - 1].set(ip_img2[0])
                lat_in = lat_in.at[2 * nf - 1].set(ip_img2[1])
            if pix2 is not None:
                # stage-2: pixel-stage latents ride as extra channels
                lat_in = jnp.concatenate([lat_in, pix2], axis=-1)
            tvec = jnp.full((2 * nf,), t, jnp.float32)
            out, _ = unet_apply(lat_in, tvec, states, class_emb=cam_emb2,
                                adapter_residuals=ad2, mv_views=nf)
            un, co = jnp.split(out, 2)
            return un + guidance_scale * (co - un)

        latents = sample_loop(sched, denoise_fn, latents, key=key)
        img_out = self.vae.apply({"params": self.params["vae"]},
                                 latents[:v], method=AutoencoderKL.decode)
        return jnp.clip(img_out * 0.5 + 0.5, 0.0, 1.0)
