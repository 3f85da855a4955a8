"""Stable3DGen (Hi3DGen) nodes (reference nodes.py:4573-4817)."""

from __future__ import annotations

import numpy as np

from .base import maybe_shard, register


@register
class Load_StableGen_Trellis_Pipeline:
    """reference nodes.py:4573 — the geometry stage is the TRELLIS fork
    (`Stable3DGen/pipeline_builders.py:75`)."""

    CATEGORY = "Comfy3D/Import|Export"
    RETURN_TYPES = ("TRELLIS_PIPE",)
    RETURN_NAMES = ("trellis_pipe",)
    FUNCTION = "load"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "repo_id": ("STRING", {"default": "Stable-X/trellis-normal-v0-1",
                                   "multiline": False}),
        }}

    def load(self, repo_id="Stable-X/trellis-normal-v0-1"):
        import os
        from . import base
        from ..models.trellis import TrellisImageTo3DPipeline
        from ..models.trellis import convert as trellis_convert
        for cand in (os.path.join(base.CKPT_ROOT_PATH,
                                  repo_id.split("/")[-1]),
                     os.path.join(base.CKPT_ROOT_PATH, "Diffusers",
                                  repo_id)):
            if os.path.exists(os.path.join(cand, "pipeline.json")):
                print(f"[Load_StableGen_Trellis_Pipeline] loading "
                      f"{cand}")
                return (maybe_shard(trellis_convert.from_pretrained(cand)),)
        print(f"[Load_StableGen_Trellis_Pipeline] initializing random "
              f"weights (no local checkpoints for {repo_id})")
        return (maybe_shard(TrellisImageTo3DPipeline.init_random()),)


@register
class Load_StableGen_StableX_Pipeline:
    """reference nodes.py:4628 — the Yoso one-step normal estimator."""

    CATEGORY = "Comfy3D/Import|Export"
    RETURN_TYPES = ("DIFFUSERS_PIPE",)
    RETURN_NAMES = ("stablex_pipe",)
    FUNCTION = "load"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "model_variant": (["yoso-normal-v1-8-1"],),
        }}

    def load(self, model_variant="yoso-normal-v1-8-1"):
        from ..models.stablegen import YosoNormalsPipeline
        from .nodes_mvdiffusion import _local_ckpt
        ckpt = _local_ckpt(f"Stable-X/{model_variant}")
        if ckpt:
            print(f"[Load_StableGen_StableX_Pipeline] loading {ckpt}")
            return (maybe_shard(YosoNormalsPipeline.from_pretrained(ckpt)),)
        print("[Load_StableGen_StableX_Pipeline] initializing random "
              "weights")
        return (maybe_shard(YosoNormalsPipeline.init_random()),)


@register
class StableGen_StableX_Process_Image:
    """reference nodes.py:4770 — image → predicted normal map."""

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "stablex_pipe": ("DIFFUSERS_PIPE",),
            "image": ("IMAGE",),
            "seed": ("INT", {"default": 0, "min": 0,
                             "max": 0xffffffffffffffff}),
            "controlnet_scale": ("FLOAT", {"default": 1.0, "min": 0.0,
                                           "step": 0.01}),
        }}

    RETURN_TYPES = ("IMAGE",)
    RETURN_NAMES = ("processed_image",)
    FUNCTION = "run"
    CATEGORY = "Comfy3D/Algorithm"

    def run(self, stablex_pipe, image, seed=0, controlnet_scale=1.0):
        img = np.asarray(image, np.float32)
        if img.ndim == 4:
            img = img[0]
        normals = np.asarray(stablex_pipe(img))[0]
        return ((normals * 0.5 + 0.5)[None],)


@register
class StableGen_Trellis_Image_To_3D:
    """reference nodes.py:4664 — (normal) image → GS + mesh via the
    TRELLIS fork."""

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "trellis_pipe": ("DIFFUSERS_PIPE",),
            "images": ("IMAGE", {"list": True}),
            "mode": (["single", "multi"],),
            "seed": ("INT", {"default": 1234, "min": 0,
                             "max": 0xffffffffffffffff}),
            "ss_guidance_strength": ("FLOAT", {"default": 7.5,
                                               "min": 0.0,
                                               "step": 0.1}),
            "ss_sampling_steps": ("INT", {"default": 12, "min": 1}),
            "slat_guidance_strength": ("FLOAT", {"default": 3.0,
                                                 "min": 0.0,
                                                 "step": 0.1}),
            "slat_sampling_steps": ("INT", {"default": 12, "min": 1}),
            "mesh_simplify": ("FLOAT", {"default": 0.95, "min": 0.9,
                                        "max": 1.0, "step": 0.01}),
        }}

    RETURN_TYPES = ("MESH",)
    RETURN_NAMES = ("mesh",)
    FUNCTION = "run"
    CATEGORY = "Comfy3D/Algorithm"

    def run(self, trellis_pipe, images, mode="single", seed=1234,
            ss_guidance_strength=7.5, ss_sampling_steps=12,
            slat_guidance_strength=3.0, slat_sampling_steps=12,
            mesh_simplify=0.95):
        import dataclasses
        trellis_pipe.cfg = dataclasses.replace(
            trellis_pipe.cfg, ss_cfg=float(ss_guidance_strength),
            ss_steps=int(ss_sampling_steps),
            slat_cfg=float(slat_guidance_strength),
            slat_steps=int(slat_sampling_steps))
        img = np.asarray(images, np.float32)
        if img.ndim == 4:
            img = img[0]   # "single" mode uses the first view
        out = trellis_pipe.run(img, seed=int(seed), formats=("mesh",))
        mesh = out["mesh"]
        if mesh_simplify < 1.0 and len(mesh.f) > 4:
            # TRELLIS convention: simplify = fraction of faces REMOVED
            from .. import native
            from ..core.mesh import Mesh
            target = max(4, int(len(mesh.f) * (1.0 - float(
                mesh_simplify))))
            v, f = native.decimate_mesh(mesh.v, mesh.f, target)
            mesh = Mesh(v=v, f=f)
        return (mesh.auto_normal(),)
