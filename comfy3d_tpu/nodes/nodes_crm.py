"""CRM nodes (reference nodes.py:2155-2412)."""

from __future__ import annotations

import numpy as np

from .base import maybe_shard, register


def _masked_ref(image, mask):
    """Reference image composited on white via its mask — the
    `torch_imgs_to_pils(reference_image, reference_mask)` +
    `CRMSampler.process_pixel_img` preprocessing (reference
    nodes.py:2325-2326). Returns [H, W, 3] float32 or None."""
    if image is None:
        return None
    img = np.asarray(image, np.float32)
    if img.ndim == 4:
        img = img[0]
    if mask is not None:
        m = np.asarray(mask, np.float32)
        if m.ndim == 3:
            m = m[0]
        img = img * m[..., None] + (1.0 - m[..., None])
    return img


def _mvdream_6view(ckpt_path=None, stage2=False):
    """CRM's ImageDream 6-view sampler. `stage2` shapes the random
    fallback like the CCM stage (MultiViewUNetModelStage2: in_channels
    8, conditioned on stage-1 pixel latents — the checkpoint path
    infers this from conv_in itself)."""
    import dataclasses as dc
    from ..models.mvdream import MVDreamConfig, MVDreamPipeline
    if ckpt_path:
        return MVDreamPipeline.from_ldm_checkpoint(ckpt_path,
                                                   num_views=6)
    cfg = MVDreamConfig()
    cfg = dc.replace(
        cfg, num_views=6, ip_dim=16, prompt_dim=1024,
        unet=dc.replace(cfg.unet, mv_views=6, ip_dim=16,
                        cross_attention_dim=1024,
                        in_channels=8 if stage2 else 4))
    return MVDreamPipeline.init_random(cfg=cfg)


@register
class Load_CRM_MVDiffusion_Model:
    """reference nodes.py:2155 — the ImageDream-arch 6-view samplers
    (pixel + CCM). Image-prompt conditioning is parity backlog; the
    6-view 3D-attention denoiser is the MVDream substrate."""

    CATEGORY = "Comfy3D/Import|Export"
    RETURN_TYPES = ("CRM_MVDIFFUSION_SAMPLER", "CRM_MVDIFFUSION_SAMPLER")
    RETURN_NAMES = ("crm_mvdiffusion_sampler", "crm_ccm_sampler")
    FUNCTION = "load"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "model_name": (["ccm-diffusion", "pixel-diffusion"],),
        }}

    def load(self, model_name="pixel-diffusion"):
        import os
        from . import base
        root = os.path.join(base.CKPT_ROOT_PATH, "CRM")
        out = []
        for name in ("pixel-diffusion", "ccm-diffusion"):
            path = os.path.join(root, f"{name}.pth")
            if os.path.exists(path):
                print(f"[Load_CRM_MVDiffusion_Model] loading {path}")
                out.append(maybe_shard(_mvdream_6view(path)))
            else:
                print(f"[Load_CRM_MVDiffusion_Model] {path} not found "
                      "— random weights")
                out.append(maybe_shard(_mvdream_6view(
                    stage2=(name == "ccm-diffusion"))))
        return tuple(out)


@register
class CRM_Images_MVDiffusion_Model:
    """reference nodes.py:2213 — 6 orbit RGB views."""

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "crm_mvdiffusion_sampler": ("CRM_MVDIFFUSION_SAMPLER",),
            "reference_image": ("IMAGE",),
            "reference_mask": ("MASK",),
            "prompt": ("STRING", {"default": "3D assets",
                                  "multiline": True}),
            "prompt_neg": ("STRING", {"default": "ugly, blurry",
                                      "multiline": True}),
            "seed": ("INT", {"default": 1234, "min": 0,
                             "max": 0xffffffffffffffff}),
            "mv_guidance_scale": ("FLOAT", {"default": 5.5, "min": 0.0,
                                            "step": 0.01}),
            "num_inference_steps": ("INT", {"default": 50, "min": 1}),
        }}

    RETURN_TYPES = ("IMAGE", "ORBIT_CAMPOSES")
    RETURN_NAMES = ("multiview_images", "orbit_camposes")
    FUNCTION = "run_model"
    CATEGORY = "Comfy3D/Algorithm"

    def run_model(self, crm_mvdiffusion_sampler, reference_image,
                  reference_mask, prompt="3D assets", prompt_neg="",
                  seed=1234, mv_guidance_scale=5.5,
                  num_inference_steps=50):
        out = crm_mvdiffusion_sampler(
            image=_masked_ref(reference_image, reference_mask),
            num_inference_steps=int(num_inference_steps),
            guidance_scale=float(mv_guidance_scale),
            seed=int(seed) % (2 ** 31))
        return (np.asarray(out), _crm6_camposes())


@register
class CRM_CCMs_MVDiffusion_Model:
    """reference nodes.py:2279 — 6 canonical-coordinate maps conditioned
    on the pixel views."""

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "crm_mvdiffusion_sampler": ("CRM_MVDIFFUSION_SAMPLER",),
            "reference_image": ("IMAGE",),
            "reference_mask": ("MASK",),
            "multiview_images": ("IMAGE",),
            "prompt": ("STRING", {"default": "3D assets",
                                  "multiline": True}),
            "prompt_neg": ("STRING", {"default": "ugly, blurry",
                                      "multiline": True}),
            "seed": ("INT", {"default": 1234, "min": 0,
                             "max": 0xffffffffffffffff}),
            "mv_guidance_scale": ("FLOAT", {"default": 5.5, "min": 0.0,
                                            "step": 0.01}),
            "num_inference_steps": ("INT", {"default": 50, "min": 1}),
        }}

    RETURN_TYPES = ("IMAGE",)
    RETURN_NAMES = ("multiview_CCMs",)
    FUNCTION = "run_model"
    CATEGORY = "Comfy3D/Algorithm"

    def run_model(self, crm_mvdiffusion_sampler, reference_image=None,
                  reference_mask=None, multiview_images=None,
                  prompt="3D assets", prompt_neg="", seed=1234,
                  mv_guidance_scale=5.5, num_inference_steps=50):
        out = crm_mvdiffusion_sampler(
            image=_masked_ref(reference_image, reference_mask),
            pixel_images=(None if multiview_images is None
                          else np.asarray(multiview_images,
                                          np.float32)),
            num_inference_steps=int(num_inference_steps),
            guidance_scale=float(mv_guidance_scale),
            seed=int(seed) % (2 ** 31) + 1)
        return (np.asarray(out),)


@register
class Load_Convolutional_Reconstruction_Model:
    """reference nodes.py:2341."""

    CATEGORY = "Comfy3D/Import|Export"
    RETURN_TYPES = ("CRM_MODEL",)
    RETURN_NAMES = ("crm_model",)
    FUNCTION = "load"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"model_name": (["CRM.pth"],)}}

    def load(self, model_name="CRM.pth"):
        import os
        from . import base
        from ..models.crm import CRMReconPipeline
        path = os.path.join(base.CKPT_ROOT_PATH, "CRM", model_name)
        if os.path.exists(path):
            print(f"[Load_Convolutional_Reconstruction_Model] loading "
                  f"{path}")
            return (maybe_shard(CRMReconPipeline.from_pretrained(path)),)
        print(f"[Load_Convolutional_Reconstruction_Model] {path} not "
              "found — random weights")
        return (maybe_shard(CRMReconPipeline.init_random()),)


@register
class Convolutional_Reconstruction_Model:
    """reference nodes.py:2382 — 6 views + 6 CCMs → mesh."""

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "crm_model": ("CRM_MODEL",),
            "multiview_images": ("IMAGE",),
            "multiview_CCMs": ("IMAGE",),
        }}

    RETURN_TYPES = ("MESH",)
    RETURN_NAMES = ("mesh",)
    FUNCTION = "run_model"
    CATEGORY = "Comfy3D/Algorithm"

    def run_model(self, crm_model, multiview_images, multiview_CCMs):
        mesh = crm_model(np.asarray(multiview_images, np.float32),
                         np.asarray(multiview_CCMs, np.float32))
        return (mesh,)


# ------------------------------------------------------------------ #
# CRM T2I (adapter-conditioned MV diffusion, V2 RGB / V3 PBR)
# ------------------------------------------------------------------ #
class _T2IAdapterRunner:
    """T2IADAPTER_V2 carrier: flax T2IAdapter params + jitted apply."""

    def __init__(self, cfg=None):
        import jax
        import jax.numpy as jnp
        from ..models.crm.t2i_adapter import T2IAdapter, T2IAdapterConfig
        self.cfg = cfg or T2IAdapterConfig()
        self.model = T2IAdapter(self.cfg)
        self.params = self.model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, self.cfg.in_channels)))["params"]
        self._apply = jax.jit(lambda p, x: self.model.apply(
            {"params": p}, x))

    def __call__(self, cond_images):
        import jax.numpy as jnp
        return self._apply(self.params,
                           jnp.asarray(cond_images, jnp.float32))


def _crm6_camposes():
    from ..core.camera import ORBITPOSE_PRESETS
    return [[1.63634, e, a, 0.0, 0.0, 0.0]
            for e, a in ORBITPOSE_PRESETS["CRM(6)"]]


def _adapter_for(sampler):
    """T2IAdapterV2 runner: real weights from Checkpoints/T2I_V2 when
    present (reference nodes.py:3560/3693 `T2IAdapterV2.from_pretrained
    (t2i_v2_checkpoints_dir)`), else random at the sampler's UNet stage
    widths."""
    import os
    from . import base
    from ..models.crm.t2i_adapter import T2IAdapterConfig
    from ..models.crm.t2i_convert import load_adapter_dir
    adir = os.path.join(base.CKPT_ROOT_PATH, "T2I_V2")
    loaded = load_adapter_dir(adir) if os.path.isdir(adir) else None
    if loaded is not None:
        cfg, params = loaded
        print(f"[Load_CRM_T2I] loaded T2IAdapterV2 from {adir}")
        runner = _T2IAdapterRunner(cfg)
        runner.params = params
        return runner
    return _T2IAdapterRunner(T2IAdapterConfig(
        channels=tuple(sampler.cfg.unet.block_out_channels)))


@register
class Load_CRM_T2I_V2_Models:
    """reference nodes.py:3479 — T2IAdapterV2 + the pixel-diffusion
    ImageDream sampler (`CRM_T2I_V2/model/t2i_adapter_v2.py:265`)."""

    CATEGORY = "Comfy3D/Import|Export"
    RETURN_TYPES = ("T2IADAPTER_V2", "CRM_MVDIFFUSION_SAMPLER_V2")
    RETURN_NAMES = ("t2iadapter_v2", "crm_mvdiffusion_sampler_v2")
    FUNCTION = "load_CRM"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "crm_model_name": (["pixel-diffusion.pth"],),
            "crm_config_path": (["sd_v2_base_ipmv_zero_SNR.yaml"],),
        }}

    def load_CRM(self, crm_model_name="pixel-diffusion.pth",
                 crm_config_path="sd_v2_base_ipmv_zero_SNR.yaml"):
        import os
        from . import base
        path = os.path.join(base.CKPT_ROOT_PATH, "CRM", crm_model_name)
        if os.path.exists(path):
            print(f"[Load_CRM_T2I_V2_Models] loading {path}")
            sampler = maybe_shard(_mvdream_6view(path))
        else:
            print("[Load_CRM_T2I_V2_Models] initializing random "
                  f"weights ({path} not found)")
            sampler = maybe_shard(_mvdream_6view())
        return (_adapter_for(sampler), sampler)


@register
class Load_CRM_T2I_V3_Models:
    """reference nodes.py:3629 — Hyper-SD LoRA/DoRA PBR variant. The
    low-rank delta is folded into the sampler weights at load time, so
    the runtime graph is identical to V2; rank/use_dora are recorded."""

    CATEGORY = "Comfy3D/Import|Export"
    RETURN_TYPES = ("T2IADAPTER_V2", "CRM_MVDIFFUSION_SAMPLER_V3")
    RETURN_NAMES = ("t2iadapter_v2", "crm_mvdiffusion_sampler_v3")
    FUNCTION = "load_CRM"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "crm_model_name": (["pixel-diffusion_Hyper.pth"],),
            "crm_t2i_v3_model_name":
                (["pixel-diffusion_lora_80k_rank_60_Hyper.pth",
                  "pixel-diffusion_dora_90k_rank_128_Hyper.pth"],),
            "crm_config_path": (["sd_v2_base_ipmv_zero_SNR_Hyper.yaml"],),
            "rank": ("INT", {"default": 64, "min": 1}),
            "use_dora": ("BOOLEAN", {"default": False}),
        }}

    def load_CRM(self, crm_model_name="pixel-diffusion_Hyper.pth",
                 crm_t2i_v3_model_name="", crm_config_path="",
                 rank=64, use_dora=False):
        import os
        from . import base
        path = os.path.join(base.CKPT_ROOT_PATH, "CRM", crm_model_name)
        if os.path.exists(path):
            print(f"[Load_CRM_T2I_V3_Models] loading {path}")
            sampler = _mvdream_6view(path)
            lora = os.path.join(base.CKPT_ROOT_PATH, "CRM_T2I_V3",
                                crm_t2i_v3_model_name)
            if crm_t2i_v3_model_name and os.path.exists(lora):
                from ..models.mvdream.convert import fold_lora_checkpoint
                fold_lora_checkpoint(sampler, lora)
            sampler = maybe_shard(sampler)
        else:
            print("[Load_CRM_T2I_V3_Models] initializing random "
                  f"weights ({path} not found)")
            sampler = maybe_shard(_mvdream_6view())
        sampler.lora_rank = int(rank)
        sampler.use_dora = bool(use_dora)
        return (_adapter_for(sampler), sampler)


def _run_t2i_stage1(adapter, sampler, reference_image, reference_mask,
                    normal_maps, seed, guidance, steps):
    """Shared V2/V3 stage-1: adapter features from the 6 normal maps →
    adapter-conditioned 6-view sampling (nodes.py:3585-3607)."""
    import jax.numpy as jnp
    import jax
    nm = np.asarray(normal_maps, np.float32)
    if nm.ndim == 3:
        nm = nm[None]
    v = sampler.cfg.num_views
    if nm.shape[0] != v:     # broadcast a single map to all views
        nm = np.broadcast_to(nm[:1], (v,) + nm.shape[1:])
    # adapter encoder downscales /16; feed maps at 16x the sampler's
    # latent size so the pyramid lines up with the UNet stages (for
    # SD-class /8 VAEs that is 2x the image size, nodes.py:3563 feeds
    # 512 normal maps to the 256 pixel sampler)
    lat = sampler.cfg.image_size // sampler.cfg.vae_factor
    target = lat * 16
    if nm.shape[1] != target:
        nm = np.asarray(jax.image.resize(
            jnp.asarray(nm), (v, target, target, 3), "bilinear"))
    residuals = adapter(nm)
    views = sampler(num_inference_steps=int(steps),
                    guidance_scale=float(guidance), seed=int(seed),
                    adapter_residuals=residuals)
    return np.asarray(views)


@register
class CRM_T2I_V2_Models:
    """reference nodes.py:3547 — normal-map-conditioned 6-view RGB."""

    CATEGORY = "Comfy3D/Algorithm"
    RETURN_TYPES = ("IMAGE", "ORBIT_CAMPOSES")
    RETURN_NAMES = ("multiview_images", "orbit_camposes")
    FUNCTION = "run_model"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "t2iadapter_v2": ("T2IADAPTER_V2",),
            "crm_mvdiffusion_sampler_v2": ("CRM_MVDIFFUSION_SAMPLER_V2",),
            "reference_image": ("IMAGE",),
            "reference_mask": ("MASK",),
            "normal_maps": ("IMAGE",),
            "prompt": ("STRING", {"default": "3D assets",
                                  "multiline": True}),
            "prompt_neg": ("STRING", {"default": "ugly, blurry",
                                      "multiline": True}),
            "seed": ("INT", {"default": 1234, "min": 0,
                             "max": 0xffffffffffffffff}),
            "mv_guidance_scale": ("FLOAT", {"default": 5.5, "min": 0.0,
                                            "step": 0.01}),
            "num_inference_steps": ("INT", {"default": 50, "min": 1}),
        }}

    def run_model(self, t2iadapter_v2, crm_mvdiffusion_sampler_v2,
                  reference_image, reference_mask, normal_maps,
                  prompt="3D assets", prompt_neg="", seed=1234,
                  mv_guidance_scale=5.5, num_inference_steps=50):
        views = _run_t2i_stage1(
            t2iadapter_v2, crm_mvdiffusion_sampler_v2, reference_image,
            reference_mask, normal_maps, seed, mv_guidance_scale,
            num_inference_steps)
        return (views, _crm6_camposes())


@register
class CRM_T2I_V3_Models:
    """reference nodes.py:3730 — PBR variant: albedo + metalness +
    roughness view sets (the Hyper sampler decodes three heads; here
    three decodes of the adapter-conditioned trajectory)."""

    CATEGORY = "Comfy3D/Algorithm"
    RETURN_TYPES = ("IMAGE", "IMAGE", "IMAGE", "ORBIT_CAMPOSES")
    RETURN_NAMES = ("multiview_albedos", "multiview_metalness",
                    "multiview_roughness", "orbit_camposes")
    FUNCTION = "run_model"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "t2iadapter_v2": ("T2IADAPTER_V2",),
            "crm_mvdiffusion_sampler_v3": ("CRM_MVDIFFUSION_SAMPLER_V3",),
            "reference_image": ("IMAGE",),
            "reference_mask": ("MASK",),
            "normal_maps": ("IMAGE",),
            "prompt": ("STRING", {"default": "3D assets",
                                  "multiline": True}),
            "prompt_neg": ("STRING", {"default": "ugly, blurry",
                                      "multiline": True}),
            "seed": ("INT", {"default": 1234, "min": 0,
                             "max": 0xffffffffffffffff}),
            "mv_guidance_scale": ("FLOAT", {"default": 5.5, "min": 0.0,
                                            "step": 0.01}),
            "num_inference_steps": ("INT", {"default": 50, "min": 1}),
        }}

    def run_model(self, t2iadapter_v2, crm_mvdiffusion_sampler_v3,
                  reference_image, reference_mask, normal_maps,
                  prompt="3D assets", prompt_neg="", seed=1234,
                  mv_guidance_scale=5.5, num_inference_steps=50):
        outs = [_run_t2i_stage1(
            t2iadapter_v2, crm_mvdiffusion_sampler_v3, reference_image,
            reference_mask, normal_maps, seed + k, mv_guidance_scale,
            num_inference_steps) for k in range(3)]
        return (outs[0], outs[1], outs[2], _crm6_camposes())
