"""CharacterGen nodes (reference nodes.py:3167-3330)."""

from __future__ import annotations

import numpy as np

from . import base
from .base import maybe_shard, register


@register
class Load_CharacterGen_MVDiffusion_Model:
    """reference nodes.py:3167 — the Stage-2D 4-view pipeline
    (`CharacterGen/character_inference.py:81`)."""

    CATEGORY = "Comfy3D/Import|Export"
    RETURN_TYPES = ("CHARACTER_MV_GEN_PIPE",)
    RETURN_NAMES = ("character_mv_gen_pipe",)
    FUNCTION = "load_model"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "force_download": ("BOOLEAN", {"default": False}),
        }}

    def load_model(self, force_download=False):
        import os

        from ..models.charactergen import CharacterGen2DPipeline
        root = os.path.join(base.CKPT_ROOT_PATH, "CharacterGen")
        ckpt_dir = os.path.join(root, "2D_Stage", "models",
                                "checkpoint")
        if os.path.exists(os.path.join(ckpt_dir, "pytorch_model.bin")):
            from ..models.charactergen.convert import \
                load_charactergen_2d
            sd_base = os.path.join(base.CKPT_ROOT_PATH, "Diffusers",
                                   "stabilityai",
                                   "stable-diffusion-2-1")
            pipe = load_charactergen_2d(
                root, sd_base if os.path.isdir(sd_base) else None)
        else:
            print("[Load_CharacterGen_MVDiffusion_Model] no local "
                  f"checkpoint under {ckpt_dir} — initializing random "
                  "weights")
            pipe = CharacterGen2DPipeline.init_random()
        return (maybe_shard(pipe),)


@register
class CharacterGen_MVDiffusion_Model:
    """reference nodes.py:3200 — reference character image → 4
    canonical views + CharacterGen(4) orbit poses."""

    CATEGORY = "Comfy3D/Algorithm"
    RETURN_TYPES = ("IMAGE", "ORBIT_CAMPOSES")
    RETURN_NAMES = ("multiviews", "orbit_camposes")
    FUNCTION = "run_model"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "character_mv_gen_pipe": ("CHARACTER_MV_GEN_PIPE",),
            "reference_image": ("IMAGE",),
            "reference_mask": ("MASK",),
            "target_image_width": ("INT", {"default": 512, "min": 128,
                                           "max": 8192}),
            "target_image_height": ("INT", {"default": 768, "min": 128,
                                            "max": 8192}),
            "seed": ("INT", {"default": 2333, "min": 0,
                             "max": 0xffffffffffffffff}),
            "guidance_scale": ("FLOAT", {"default": 5.0, "min": 0.0,
                                         "step": 0.01}),
            "num_inference_steps": ("INT", {"default": 40, "min": 1}),
            "prompt": ("STRING", {"default": "high quality, best "
                                  "quality", "multiline": True}),
            "prompt_neg": ("STRING", {"default": "", "multiline": True}),
            "radius": ("FLOAT", {"default": 1.5, "min": 0.1,
                                 "step": 0.01}),
        }}

    def run_model(self, character_mv_gen_pipe, reference_image,
                  reference_mask, target_image_width=512,
                  target_image_height=768, seed=2333,
                  guidance_scale=5.0, num_inference_steps=40,
                  prompt="", prompt_neg="", radius=1.5):
        from ..core.camera import ORBITPOSE_PRESETS
        img = np.asarray(reference_image, np.float32)
        if img.ndim == 4:
            img = img[0]
        mask = np.asarray(reference_mask, np.float32)
        if mask.ndim == 3:
            mask = mask[0]
        img = img[..., :3] * mask[..., None] + (1.0 - mask[..., None])
        views = np.asarray(character_mv_gen_pipe.inference(
            img, target_image_width, target_image_height,
            prompt=prompt, prompt_neg=prompt_neg,
            guidance_scale=float(guidance_scale),
            num_inference_steps=int(num_inference_steps),
            seed=int(seed)))
        camposes = [[float(radius), e, a, 0.0, 0.0, 0.0]
                    for e, a in ORBITPOSE_PRESETS["CharacterGen(4)"]]
        return (views, camposes)


@register
class Load_CharacterGen_Reconstruction_Model:
    """reference nodes.py:3266 — the Stage-3D LRM
    (`character_inference.py:192`)."""

    CATEGORY = "Comfy3D/Import|Export"
    RETURN_TYPES = ("CHARACTER_LRM_PIPE",)
    RETURN_NAMES = ("character_lrm_pipe",)
    FUNCTION = "load_model"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "force_download": ("BOOLEAN", {"default": False}),
        }}

    def load_model(self, force_download=False):
        import os

        from ..models.charactergen import CharacterGenLRMPipeline
        root = os.path.join(base.CKPT_ROOT_PATH, "CharacterGen")
        ckpt = os.path.join(root, "3D_Stage", "models", "lrm.ckpt")
        if os.path.exists(ckpt):
            from ..models.charactergen.convert import \
                load_charactergen_lrm
            pipe = load_charactergen_lrm(root)
        else:
            print("[Load_CharacterGen_Reconstruction_Model] no local "
                  f"checkpoint at {ckpt} — initializing random weights")
            pipe = CharacterGenLRMPipeline.init_random()
        return (maybe_shard(pipe),)


@register
class CharacterGen_Reconstruction_Model:
    """reference nodes.py:3299 — 4 views → character mesh."""

    CATEGORY = "Comfy3D/Algorithm"
    RETURN_TYPES = ("MESH",)
    RETURN_NAMES = ("mesh",)
    FUNCTION = "run_LRM"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "character_lrm_pipe": ("CHARACTER_LRM_PIPE",),
            "multiview_images": ("IMAGE",),
            "multiview_masks": ("MASK",),
        }}

    def run_LRM(self, character_lrm_pipe, multiview_images,
                multiview_masks):
        imgs = np.asarray(multiview_images, np.float32)
        masks = np.asarray(multiview_masks, np.float32)
        if masks.ndim == imgs.ndim - 1:
            masks = masks[..., None]
        # alpha_min 0.2 composite onto white (reference torch_imgs_to_pils)
        masks = np.where(masks > 0.2, masks, 0.0)
        imgs = imgs[..., :3] * masks + (1.0 - masks)
        # pad non-square views to square (reference center-pastes)
        h, w = imgs.shape[1], imgs.shape[2]
        if h != w:
            m = max(h, w)
            pad_h, pad_w = (m - h) // 2, (m - w) // 2
            imgs = np.pad(imgs, ((0, 0), (pad_h, m - h - pad_h),
                                 (pad_w, m - w - pad_w), (0, 0)),
                          constant_values=1.0)
        mesh = character_lrm_pipe.inference(
            imgs, mesh_size=getattr(character_lrm_pipe,
                                    "default_mesh_size", 256))
        return (mesh,)
