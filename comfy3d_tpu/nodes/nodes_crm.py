"""CRM nodes (reference nodes.py:2155-2412)."""

from __future__ import annotations

import numpy as np

from .base import register


def _mvdream_6view():
    import dataclasses as dc
    from ..models.mvdream import MVDreamConfig, MVDreamPipeline
    cfg = MVDreamConfig()
    cfg = dc.replace(cfg, num_views=6,
                     unet=dc.replace(cfg.unet, mv_views=6))
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
        return (_mvdream_6view(), _mvdream_6view())


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
            "seed": ("INT", {"default": 1234, "min": 0,
                             "max": 0xffffffffffffffff}),
            "mv_guidance_scale": ("FLOAT", {"default": 5.5, "min": 0.0,
                                            "step": 0.01}),
            "num_inference_steps": ("INT", {"default": 30, "min": 1}),
        }}

    RETURN_TYPES = ("IMAGE",)
    RETURN_NAMES = ("multiview_images",)
    FUNCTION = "run_model"
    CATEGORY = "Comfy3D/Algorithm"

    def run_model(self, crm_mvdiffusion_sampler, reference_image,
                  reference_mask, prompt="3D assets", seed=1234,
                  mv_guidance_scale=5.5, num_inference_steps=30):
        out = crm_mvdiffusion_sampler(
            num_inference_steps=int(num_inference_steps),
            guidance_scale=float(mv_guidance_scale), seed=int(seed))
        return (np.asarray(out),)


@register
class CRM_CCMs_MVDiffusion_Model:
    """reference nodes.py:2279 — 6 canonical-coordinate maps conditioned
    on the pixel views."""

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "crm_ccm_sampler": ("CRM_MVDIFFUSION_SAMPLER",),
            "multiview_images": ("IMAGE",),
            "prompt": ("STRING", {"default": "3D assets",
                                  "multiline": True}),
            "seed": ("INT", {"default": 1234, "min": 0,
                             "max": 0xffffffffffffffff}),
            "mv_guidance_scale": ("FLOAT", {"default": 5.5, "min": 0.0,
                                            "step": 0.01}),
            "num_inference_steps": ("INT", {"default": 30, "min": 1}),
        }}

    RETURN_TYPES = ("IMAGE",)
    RETURN_NAMES = ("multiview_CCMs",)
    FUNCTION = "run_model"
    CATEGORY = "Comfy3D/Algorithm"

    def run_model(self, crm_ccm_sampler, multiview_images,
                  prompt="3D assets", seed=1234, mv_guidance_scale=5.5,
                  num_inference_steps=30):
        out = crm_ccm_sampler(
            num_inference_steps=int(num_inference_steps),
            guidance_scale=float(mv_guidance_scale), seed=int(seed) + 1)
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
        from ..models.crm import CRMReconPipeline
        return (CRMReconPipeline.init_random(),)


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
