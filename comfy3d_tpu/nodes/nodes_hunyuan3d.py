"""Hunyuan3D-V2 shape-generation nodes (reference nodes.py:3960, 4285).

Node names / INPUT_TYPES mirror the reference so its example workflows
(e.g. `Hunyuan3D_V2/Hunyuan3D_V2_Turbo.json`) run unchanged.
"""

from __future__ import annotations

import os

import numpy as np

from . import base
from .base import maybe_shard, register


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
        return (maybe_shard(pipe),)


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
        return (maybe_shard(pipe),)


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


# ------------------------------------------------------------------ #
# Hunyuan3D V1 (mvd grid + SVRM reconstruction)
# ------------------------------------------------------------------ #
@register
class Hunyuan3D_V1_MVDiffusion_Model:
    """reference nodes.py:3833 — single image → 3×2 grid of 6 views +
    the conditioning image. The std/lite mvd pipelines are
    reference-attention SD pipelines (`Hunyuan3D_V1/mvd/
    hunyuan3d_mvd_std_pipeline.py:187`), the mechanism our
    Zero123Plus-style pipeline implements (ref_mode write/read +
    ramping global embeds), so any grid-producing DIFFUSERS_PIPE
    plugs in here."""

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "mvdiffusion_pipe": ("DIFFUSERS_PIPE",),
            "reference_image": ("IMAGE",),
            "reference_mask": ("MASK",),
            "seed": ("INT", {"default": 0, "min": 0,
                             "max": 0xffffffffffffffff}),
            "mv_guidance_scale": ("FLOAT", {"default": 2.0, "min": 0.0,
                                            "step": 0.01}),
            "num_inference_steps": ("INT", {"default": 50, "min": 1}),
        }}

    RETURN_TYPES = ("IMAGE", "IMAGE")
    RETURN_NAMES = ("multiview_image_grid", "condition_image")
    FUNCTION = "run_mvdiffusion"
    CATEGORY = "Comfy3D/Algorithm"

    def run_mvdiffusion(self, mvdiffusion_pipe, reference_image,
                        reference_mask, seed=0, mv_guidance_scale=2.0,
                        num_inference_steps=50):
        import numpy as _np
        img = _np.asarray(reference_image, _np.float32)
        if img.ndim == 4:
            img = img[0]
        mask = _np.asarray(reference_mask, _np.float32)
        if mask.ndim == 3:
            mask = mask[0]
        img = img * mask[..., None] + (1.0 - mask[..., None])
        grid = mvdiffusion_pipe(
            img, seed=int(seed),
            guidance_scale=float(mv_guidance_scale),
            num_inference_steps=int(num_inference_steps))
        grid = _np.asarray(grid, _np.float32)
        if grid.ndim == 4:
            grid = grid[0]
        return (grid[None], img[None])


@register
class Load_Hunyuan3D_V1_Reconstruction_Model:
    """reference nodes.py:3883 — builds the Views2Mesh SVRM predictor."""

    CATEGORY = "Comfy3D/Import|Export"
    RETURN_TYPES = ("HUNYUAN3D_V1_RECONSTRUCTION_MODEL",)
    RETURN_NAMES = ("hunyuan3d_v1_reconstruction_model",)
    FUNCTION = "load_model"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "force_download": ("BOOLEAN", {"default": False}),
            "use_lite": ("BOOLEAN", {"default": True}),
        }}

    def load_model(self, force_download=False, use_lite=True):
        import dataclasses as _dc
        import os

        from ..models.hunyuan3d_v1 import SVRMConfig, SVRMPipeline
        sub = "svrm-lite/svrm.safetensors" if use_lite \
            else "svrm/svrm.safetensors"
        ckpt = os.path.join(base.CKPT_ROOT_PATH, "Diffusers", "tencent",
                            "Hunyuan3D-1", *sub.split("/"))
        if not os.path.exists(ckpt) and use_lite:
            ckpt = os.path.join(base.CKPT_ROOT_PATH, "Diffusers",
                                "tencent", "Hunyuan3D-1", "svrm",
                                "svrm.safetensors")
        if os.path.exists(ckpt):
            from ..models.hunyuan3d_v1.convert import \
                load_svrm_checkpoint
            pipe = load_svrm_checkpoint(ckpt)
        else:
            print("[Load_Hunyuan3D_V1_Reconstruction_Model] no local "
                  f"svrm checkpoint at {ckpt} — initializing random "
                  "weights")
            cfg = SVRMConfig()
            if use_lite:
                cfg = _dc.replace(cfg, depth=8, pos_emb_dim=768,
                                  heads=12)
            pipe = SVRMPipeline.init_random(cfg=cfg)
        pipe.use_lite = bool(use_lite)
        return (maybe_shard(pipe),)


@register
class Hunyuan3D_V1_Reconstruction_Model:
    """reference nodes.py:3918 — grid + condition image → colored mesh
    (`infer/views_to_mesh.py:37`): the 3×2 grid is split into 6 views,
    reordered ([0,1,2,3,4,5] lite / [0,2,4,5,3,1] std), and the
    condition image is prepended as view 0."""

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "hunyuan3d_v1_reconstruction_model":
                ("HUNYUAN3D_V1_RECONSTRUCTION_MODEL",),
            "multiview_image_grid": ("IMAGE",),
            "condition_image": ("IMAGE",),
            "seed": ("INT", {"default": 0, "min": 0,
                             "max": 0xffffffffffffffff}),
            "target_face_count": ("INT", {"default": 90000, "min": 1}),
        }}

    RETURN_TYPES = ("MESH",)
    RETURN_NAMES = ("mesh",)
    FUNCTION = "run_model"
    CATEGORY = "Comfy3D/Algorithm"

    def run_model(self, hunyuan3d_v1_reconstruction_model,
                  multiview_image_grid, condition_image, seed=0,
                  target_face_count=90000, mesh_size=None):
        import numpy as _np
        pipe = hunyuan3d_v1_reconstruction_model
        grid = _np.asarray(multiview_image_grid, _np.float32)
        if grid.ndim == 4:
            grid = grid[0]
        cond = _np.asarray(condition_image, _np.float32)
        if cond.ndim == 4:
            cond = cond[0]
        gh, gw = grid.shape[0] // 3, grid.shape[1] // 2
        views = [grid[r * gh:(r + 1) * gh, c * gw:(c + 1) * gw]
                 for r in range(3) for c in range(2)]
        order = ([0, 1, 2, 3, 4, 5]
                 if getattr(pipe, "use_lite", True)
                 else [0, 2, 4, 5, 3, 1])
        s = pipe.cfg.cond_size
        import jax as _jax
        import jax.numpy as _jnp
        stack = [cond] + [views[i] for i in order]
        stack = [_np.asarray(_jax.image.resize(
            _jnp.asarray(v[..., :3]), (s, s, 3), "bilinear"))
            for v in stack]
        ms = mesh_size or (384 if pipe.cfg.pos_emb_size >= 64 else 32)
        mesh = pipe.views_to_mesh(_np.stack(stack), mesh_size=ms,
                                  target_faces=int(target_face_count))
        return (mesh,)
