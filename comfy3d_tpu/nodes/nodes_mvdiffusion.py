"""Multi-view diffusion nodes: Wonder3D, Era3D (reference nodes.py:1621,
2587)."""

from __future__ import annotations

import numpy as np

from . import base
from .base import maybe_shard, register


def _local_ckpt(repo_id: str):
    """Local-first checkpoint lookup under Checkpoints/Diffusers/<repo>
    (reference shared_utils/common_utils.py:73-82 role)."""
    import os
    from .nodes_diffusers import CKPT_DIFFUSERS_PATH, _has_weights
    cand = os.path.join(CKPT_DIFFUSERS_PATH, repo_id)
    return cand if _has_weights(cand) else None


def _composite(reference_image, reference_mask):
    import jax.numpy as jnp
    from ..core import image as img_utils
    return np.asarray(img_utils.composite_background(
        jnp.asarray(reference_image), jnp.asarray(reference_mask),
        (1.0, 1.0, 1.0)))[0]


@register
class Load_Wonder3D_Pipeline:
    """Loader for the Wonder3D joint RGB+normal MV pipeline (the
    reference builds it through Load_Diffusers_Pipeline; a dedicated
    loader keeps the zero-egress random-init fallback explicit)."""

    CATEGORY = "Comfy3D/Import|Export"
    RETURN_TYPES = ("DIFFUSERS_PIPE",)
    RETURN_NAMES = ("mvdiffusion_pipe",)
    FUNCTION = "load"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "repo_id": ("STRING", {"default": "flamehaze1115/wonder3d-v1.0",
                                   "multiline": False}),
        }}

    def load(self, repo_id="flamehaze1115/wonder3d-v1.0"):
        from ..models.wonder3d import Wonder3DPipeline
        ckpt = _local_ckpt(repo_id)
        if ckpt:
            print(f"[Load_Wonder3D_Pipeline] loading {ckpt}")
            return (maybe_shard(Wonder3DPipeline.from_pretrained(ckpt)),)
        print(f"[Load_Wonder3D_Pipeline] initializing random weights "
              f"(no local checkpoints for {repo_id})")
        return (maybe_shard(Wonder3DPipeline.init_random()),)


@register
class Wonder3D_MVDiffusion_Model:
    """reference nodes.py:1621 — image+mask → 6 views + 6 normals +
    camera poses."""

    # CAMERA_TABLE azimuth/elevation (radians → degrees)
    _POSES = [[4.0, 0.0, 0.0], [4.0, -13.5, 46.6], [4.0, -9.7, 97.0],
              [4.0, 29.9, 180.0], [4.0, 39.6, 277.1], [4.0, 21.4, 320.1]]

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "mvdiffusion_pipe": ("DIFFUSERS_PIPE",),
            "reference_image": ("IMAGE",),
            "reference_mask": ("MASK",),
            "seed": ("INT", {"default": 0, "min": 0,
                             "max": 0xffffffffffffffff}),
            "mv_guidance_scale": ("FLOAT", {"default": 1.0, "min": 0.0,
                                            "step": 0.01}),
            "num_inference_steps": ("INT", {"default": 50, "min": 1}),
        }}

    RETURN_TYPES = ("IMAGE", "IMAGE", "ORBIT_CAMPOSES")
    RETURN_NAMES = ("multiview_images", "multiview_normals",
                    "orbit_camposes")
    FUNCTION = "run_model"
    CATEGORY = "Comfy3D/Algorithm"

    def run_model(self, mvdiffusion_pipe, reference_image, reference_mask,
                  seed=0, mv_guidance_scale=1.0, num_inference_steps=50):
        img = _composite(reference_image, reference_mask)
        colors, normals = mvdiffusion_pipe(
            img, num_inference_steps=int(num_inference_steps),
            guidance_scale=float(mv_guidance_scale), seed=int(seed))
        poses = [[r, e, a, 0.0, 0.0, 0.0] for r, e, a in self._POSES]
        return (np.asarray(colors), np.asarray(normals), poses)


@register
class Load_Era3D_Pipeline:
    CATEGORY = "Comfy3D/Import|Export"
    RETURN_TYPES = ("DIFFUSERS_PIPE",)
    RETURN_NAMES = ("era3d_pipe",)
    FUNCTION = "load"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "repo_id": ("STRING", {"default": "pengHTYX/MacLab-Era3D-512-6view",
                                   "multiline": False}),
        }}

    def load(self, repo_id="pengHTYX/MacLab-Era3D-512-6view"):
        from ..models.era3d import Era3DPipeline
        ckpt = _local_ckpt(repo_id)
        if ckpt:
            print(f"[Load_Era3D_Pipeline] loading {ckpt}")
            return (maybe_shard(Era3DPipeline.from_pretrained(ckpt)),)
        print(f"[Load_Era3D_Pipeline] initializing random weights "
              f"(no local checkpoints for {repo_id})")
        return (maybe_shard(Era3DPipeline.init_random()),)


@register
class Era3D_MVDiffusion_Model:
    """reference nodes.py:2587 — image+mask → 6 views + normals +
    camera poses (orthographic-ish orbit)."""

    _AZIMUTHS = [0.0, 45.0, 90.0, 180.0, 270.0, 315.0]

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "era3d_pipe": ("DIFFUSERS_PIPE",),
            "reference_image": ("IMAGE",),
            "reference_mask": ("MASK",),
            "image_crop_size": ("INT", {"default": 420, "min": 400,
                                        "max": 8192}),
            "seed": ("INT", {"default": 600, "min": 0,
                             "max": 0xffffffffffffffff}),
            "guidance_scale": ("FLOAT", {"default": 3.0, "min": 0.0,
                                         "step": 0.01}),
            "num_inference_steps": ("INT", {"default": 40, "min": 1}),
            "eta": ("FLOAT", {"default": 1.0, "min": 0.0, "step": 0.01}),
            "radius": ("FLOAT", {"default": 4.0, "min": 0.1,
                                 "step": 0.01}),
        }}

    RETURN_TYPES = ("IMAGE", "IMAGE", "ORBIT_CAMPOSES")
    RETURN_NAMES = ("multiviews", "multiview_normals", "orbit_camposes")
    FUNCTION = "run_model"
    CATEGORY = "Comfy3D/Algorithm"

    def run_model(self, era3d_pipe, reference_image, reference_mask,
                  image_crop_size=420, seed=600, guidance_scale=3.0,
                  num_inference_steps=40, eta=1.0, radius=4.0):
        img = _composite(reference_image, reference_mask)
        colors, normals = era3d_pipe(
            img, num_inference_steps=int(num_inference_steps),
            guidance_scale=float(guidance_scale), seed=int(seed))
        poses = [[float(radius), 0.0, a, 0.0, 0.0, 0.0]
                 for a in self._AZIMUTHS]
        return (np.asarray(colors), np.asarray(normals), poses)
