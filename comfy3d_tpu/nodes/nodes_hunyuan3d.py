"""Hunyuan3D-V2 shape-generation nodes (reference nodes.py:3960, 4285).

Node names / INPUT_TYPES mirror the reference so its example workflows
(e.g. `Hunyuan3D_V2/Hunyuan3D_V2_Turbo.json`) run unchanged.
"""

from __future__ import annotations

import os

import numpy as np

from . import base
from .base import register


_MODES = {
    # name → (repo dir, subfolder, default steps, guidance-distilled)
    "Hunyuan3D-2": ("Hunyuan3D-2", "hunyuan3d-dit-v2-0", 30, False),
    "Hunyuan3D-2-Fast": ("Hunyuan3D-2", "hunyuan3d-dit-v2-0-fast", 20,
                         False),
    "Hunyuan3D-2-Turbo": ("Hunyuan3D-2", "hunyuan3d-dit-v2-0-turbo", 5,
                          True),
    "Hunyuan3D-2mv": ("Hunyuan3D-2mv", "hunyuan3d-dit-v2-mv", 30, False),
    "Hunyuan3D-2mv-Fast": ("Hunyuan3D-2mv", "hunyuan3d-dit-v2-mv-fast",
                           20, False),
    "Hunyuan3D-2mv-Turbo": ("Hunyuan3D-2mv", "hunyuan3d-dit-v2-mv-turbo",
                            5, True),
}


@register
class Load_Hunyuan3D_V2_ShapeGen_Pipeline:
    """reference nodes.py:4285 — builds the flow-matching shape pipeline.

    Looks for local checkpoints under
    `<ckpt_root>/tencent/<repo>/<subfolder>/model.fp16.safetensors` (+
    sibling `hunyuan3d-vae-v2-0/model.fp16.safetensors`); in zero-egress
    environments without them, initializes random weights so graphs still
    execute end-to-end.
    """

    CATEGORY = "Comfy3D/Import|Export"
    RETURN_TYPES = ("DIFFUSERS_PIPE",)
    RETURN_NAMES = ("shapegen_pipe",)
    FUNCTION = "load"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "generation_mode": (list(_MODES.keys()),),
            "weights_format": (["safetensors", "ckpt"],),
            "flash_vdm": ("BOOLEAN", {"default": True}),
        }}

    def load(self, generation_mode="Hunyuan3D-2",
             weights_format="safetensors", flash_vdm=True):
        from ..models.hunyuan3d import (Hunyuan3DShapeConfig,
                                        Hunyuan3DShapePipeline)
        repo, sub, steps, distilled = _MODES[generation_mode]
        import dataclasses
        cfg = Hunyuan3DShapeConfig(num_steps=steps)
        if distilled:
            cfg = dataclasses.replace(
                cfg, dit=dataclasses.replace(cfg.dit, guidance_embed=True))
        ext = "safetensors" if weights_format == "safetensors" else "ckpt"
        root = os.path.join(base.CKPT_ROOT_PATH, "Diffusers", "tencent",
                            repo)
        dit_path = os.path.join(root, sub, f"model.fp16.{ext}")
        vae_path = os.path.join(root, "hunyuan3d-vae-v2-0",
                                f"model.fp16.{ext}")
        if os.path.exists(dit_path) and os.path.exists(vae_path):
            pipe = Hunyuan3DShapePipeline.from_pretrained(
                dit_path, vae_path, cfg=cfg)
        else:
            print(f"[Load_Hunyuan3D_V2_ShapeGen_Pipeline] checkpoints "
                  f"not found under {root} — initializing random weights")
            pipe = Hunyuan3DShapePipeline.init_random(cfg=cfg)
        return (pipe,)


@register
class Hunyuan3D_V2_DiT_Flow_Matching_Model:
    """reference nodes.py:3960 — image+mask → mesh via flow sampling +
    volume decode + surface extraction."""

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "hunyuan3d_v2_i23d_pipe": ("DIFFUSERS_PIPE",),
            "reference_image": ("IMAGE",),
            "reference_mask": ("MASK",),
            "seed": ("INT", {"default": 1234, "min": 0,
                             "max": 0xffffffffffffffff}),
            "guidance_scale": ("FLOAT", {"default": 5.5, "min": 0.0,
                                         "step": 0.01}),
            "num_inference_steps": ("INT", {"default": 30, "min": 1}),
            "octree_resolution": ("INT", {"default": 256, "min": 1}),
        }}

    RETURN_TYPES = ("MESH",)
    RETURN_NAMES = ("mesh",)
    FUNCTION = "run_model"
    CATEGORY = "Comfy3D/Algorithm"

    def run_model(self, hunyuan3d_v2_i23d_pipe, reference_image,
                  reference_mask, seed=1234, guidance_scale=5.5,
                  num_inference_steps=30, octree_resolution=256):
        import jax.numpy as jnp
        from ..core import image as img_utils

        img = np.asarray(img_utils.composite_background(
            jnp.asarray(reference_image), jnp.asarray(reference_mask),
            (1.0, 1.0, 1.0)))[0]
        mesh = hunyuan3d_v2_i23d_pipe(
            img, seed=int(seed), num_steps=int(num_inference_steps),
            guidance_scale=float(guidance_scale),
            octree_resolution=int(octree_resolution))[0]
        return (_cleanup(mesh),)


def _cleanup(mesh):
    """FloaterRemover + DegenerateFaceRemover role
    (shapegen/postprocessors.py) via the native clean op."""
    try:
        from .. import native
        from ..core.mesh import Mesh
        v, f = native.clean_mesh(np.asarray(mesh.v), np.asarray(mesh.f),
                                 weld_eps=0.0, min_component_frac=0.05)
        return Mesh(v=v, f=f).auto_normal()
    except Exception as e:                        # keep raw mesh usable
        print(f"[Hunyuan3D] mesh cleanup skipped: {e}")
        return mesh.auto_normal()


def _estimate_alpha(img: np.ndarray) -> np.ndarray:
    """[H, W, 3] → [H, W] foreground mask. Role of the reference's
    BiRefNet rembg (`hy3dgen/rembg.py`) without a network: distance from
    the border-median background color, Otsu-ish fixed threshold."""
    h, w, _ = img.shape
    border = np.concatenate([img[0], img[-1], img[:, 0], img[:, -1]])
    bg = np.median(border, axis=0)
    dist = np.linalg.norm(img - bg, axis=-1)
    return (dist > 0.12).astype(np.float32)


@register
class Multi_Background_Remover:
    """reference nodes.py:4449 — 1-3 views → list of RGBA arrays."""

    CATEGORY = "Comfy3D/Preprocessors"
    RETURN_TYPES = ("LIST",)
    RETURN_NAMES = ("images",)
    FUNCTION = "run"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"image_front": ("IMAGE",)},
                "optional": {"image_back": ("IMAGE",),
                             "image_left": ("IMAGE",)}}

    def run(self, image_front, image_back=None, image_left=None,
            image_right=None):
        views = [v for v in (image_front, image_back, image_left,
                             image_right) if v is not None]
        out = []
        for tensor_img in views:
            img = np.asarray(tensor_img, np.float32)
            if img.ndim == 4:
                img = img[0]
            if img.shape[-1] == 4:
                rgba = img
            else:
                alpha = _estimate_alpha(img)
                rgba = np.concatenate([img, alpha[..., None]], axis=-1)
            out.append(rgba)
        return (out,)


@register
class Load_Hunyuan3D_21_ShapeGen_Pipeline:
    """reference nodes.py:5209 — the 2.1 shape DiT is the same
    architecture as V2 (hy3dshape denoisers/hunyuan3ddit.py matches
    hy3dgen's), loaded from the tencent/Hunyuan3D-2.1 layout."""

    CATEGORY = "Comfy3D/Algorithm/Hunyuan3D-2.1"
    RETURN_TYPES = ("DIFFUSERS_PIPE",)
    RETURN_NAMES = ("shapegen_pipe",)
    FUNCTION = "load"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "use_fp16": ("BOOLEAN", {"default": True}),
        }}

    def load(self, use_fp16=True):
        from ..models.hunyuan3d import (Hunyuan3DShapeConfig,
                                        Hunyuan3DShapePipeline)
        root = os.path.join(base.CKPT_ROOT_PATH, "Diffusers", "tencent",
                            "Hunyuan3D-2.1")
        dit = os.path.join(root, "hunyuan3d-dit-v2-1",
                           "model.fp16.safetensors")
        vae = os.path.join(root, "hunyuan3d-vae-v2-1",
                           "model.fp16.safetensors")
        cfg = Hunyuan3DShapeConfig()
        if os.path.exists(dit) and os.path.exists(vae):
            pipe = Hunyuan3DShapePipeline.from_pretrained(dit, vae,
                                                          cfg=cfg)
        else:
            print("[Load_Hunyuan3D_21_ShapeGen_Pipeline] checkpoints "
                  f"not found under {root} — initializing random weights")
            pipe = Hunyuan3DShapePipeline.init_random(cfg=cfg)
        return (pipe,)


@register
class Hunyuan3D_21_ShapeGen:
    """reference nodes.py:5397 — image → mesh + processed image."""

    CATEGORY = "Comfy3D/Algorithm/Hunyuan3D-2.1"
    RETURN_TYPES = ("MESH", "IMAGE")
    RETURN_NAMES = ("mesh", "processed_image")
    FUNCTION = "generate"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "shapegen_pipe": ("DIFFUSERS_PIPE",),
            "image": ("IMAGE",),
            "seed": ("INT", {"default": 1234, "min": 0,
                             "max": 0xffffffffffffffff}),
            "steps": ("INT", {"default": 30, "min": 1, "max": 100}),
            "guidance_scale": ("FLOAT", {"default": 7.5, "min": 0.0,
                                         "step": 0.1}),
            "octree_resolution": ("INT", {"default": 256, "min": 64,
                                          "max": 512}),
            "remove_background": ("BOOLEAN", {"default": True}),
            "auto_cleanup": ("BOOLEAN", {"default": True}),
        }}

    def generate(self, shapegen_pipe, image, seed=1234, steps=30,
                 guidance_scale=7.5, octree_resolution=256,
                 remove_background=True, auto_cleanup=True):
        img = np.asarray(image, np.float32)
        if img.ndim == 4:
            img = img[0]
        if remove_background:
            alpha = _estimate_alpha(img)
            img = img * alpha[..., None] + (1.0 - alpha[..., None])
        mesh = shapegen_pipe(
            img, seed=int(seed), num_steps=int(steps),
            guidance_scale=float(guidance_scale),
            octree_resolution=int(octree_resolution))[0]
        return (_cleanup(mesh), img[None])


@register
class Hunyuan3D_V2_ShapeGen_MV:
    """reference nodes.py:4509 — list of RGBA views → mesh."""

    CATEGORY = "Comfy3D/Algorithm"
    RETURN_TYPES = ("MESH",)
    RETURN_NAMES = ("mesh",)
    FUNCTION = "run"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "shapegen_pipe": ("DIFFUSERS_PIPE",),
            "images": ("LIST",),
            "seed": ("INT", {"default": 1234, "min": 0,
                             "max": 0xffffffffffffffff}),
            "guidance_scale": ("FLOAT", {"default": 5.0, "min": 0.0,
                                         "step": 0.1}),
            "num_inference_steps": ("INT", {"default": 5, "min": 0}),
            "octree_resolution": ("INT", {"default": 256, "min": 64}),
        }}

    def run(self, shapegen_pipe, images, seed=1234, guidance_scale=5.0,
            num_inference_steps=5, octree_resolution=256):
        if not isinstance(images, list) or not images:
            raise ValueError("'images' must be a non-empty list")
        # composite RGBA onto white (conditioner value_range handling)
        rgb = []
        for im in images:
            im = np.asarray(im, np.float32)
            if im.shape[-1] == 4:
                a = im[..., 3:4]
                im = im[..., :3] * a + (1.0 - a)
            rgb.append(im)
        if len(rgb) > 1:
            print("[Hunyuan3D_V2_ShapeGen_MV] multi-view conditioning "
                  "not yet implemented — using the front view")
        steps = (int(num_inference_steps) if num_inference_steps
                 else shapegen_pipe.cfg.num_steps)
        mesh = shapegen_pipe(
            rgb[0], seed=int(seed), num_steps=steps,
            guidance_scale=float(guidance_scale),
            octree_resolution=int(octree_resolution))[0]
        return (_cleanup(mesh),)
