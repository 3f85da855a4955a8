"""PartCrafter nodes (reference nodes.py:5592-5989).

Object pipe ("wgsxm/PartCrafter") and scene pipe
("wgsxm/PartCrafter-Scene") share the same architecture — the scene
variant is trained to split a scene image into object parts instead of
an object into components — so both loaders build the same
`PartCrafterPipeline` with a flag on the returned pipe.
"""

from __future__ import annotations

import os
import zipfile

import numpy as np

from .base import OUTPUT_ROOT_PATH, register


def _explode(meshes, factor: float = 0.3):
    """Translate each part outward from the composition centroid
    (`explode_mesh` role, reference partcrafter utils)."""
    from ..core.mesh import Mesh
    centers = [np.asarray(m.v).mean(0) for m in meshes if m.num_vertices]
    if not centers:
        return meshes
    global_c = np.stack(centers).mean(0)
    out = []
    for m in meshes:
        if not m.num_vertices:
            out.append(m)
            continue
        off = (np.asarray(m.v).mean(0) - global_c) * factor
        out.append(Mesh(v=np.asarray(m.v) + off, f=m.f, vc=m.vc,
                        vn=m.vn))
    return out


class _PartCrafterLoaderBase:
    CATEGORY = "Comfy3D/Algorithm/PartCrafter"
    FUNCTION = "load"
    _SCENE = False

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {}}

    def load(self):
        from ..models.partcrafter import PartCrafterPipeline
        from .nodes_mvdiffusion import _local_ckpt
        ckpt = _local_ckpt(self._REPO_ID)
        if ckpt:
            print(f"[{type(self).__name__}] loading {ckpt}")
            pipe = PartCrafterPipeline.from_pretrained(ckpt)
        else:
            print(f"[{type(self).__name__}] initializing random weights "
                  f"(no local checkpoint for {self._REPO_ID})")
            pipe = PartCrafterPipeline.init_random()
        pipe.is_scene = self._SCENE
        from .base import maybe_shard
        return (maybe_shard(pipe),)


@register
class Load_PartCrafter_Pipeline(_PartCrafterLoaderBase):
    """reference nodes.py:5592 — part-level object generation pipe."""
    RETURN_TYPES = ("DIFFUSERS_PIPE",)
    RETURN_NAMES = ("partcrafter_pipe",)
    _REPO_ID = "wgsxm/PartCrafter"


@register
class Load_PartCrafter_Scene_Pipeline(_PartCrafterLoaderBase):
    """reference nodes.py:5795 — scene decomposition pipe."""
    RETURN_TYPES = ("DIFFUSERS_PIPE",)
    RETURN_NAMES = ("partcrafter_scene_pipe",)
    _REPO_ID = "wgsxm/PartCrafter-Scene"
    _SCENE = True


@register
class PartCrafter_Generate:
    """reference nodes.py:5650/:5854 — image → num_parts colored part
    meshes; saves a per-part GLB zip + merged scene GLB and returns
    their paths (the reference contract feeds Preview_3DMesh)."""

    CATEGORY = "Comfy3D/Algorithm/PartCrafter"
    RETURN_TYPES = ("STRING", "STRING", "IMAGE", "MESH")
    RETURN_NAMES = ("parts_zip_path", "glb_mesh_path",
                    "processed_image", "merged_mesh")
    FUNCTION = "generate"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "partcrafter_pipe": ("DIFFUSERS_PIPE",),
            "image": ("IMAGE",),
            "num_parts": ("INT", {"default": 4, "min": 1, "max": 16}),
            "seed": ("INT", {"default": 1234, "min": 0,
                             "max": 0xffffffffffffffff}),
            "num_tokens": ("INT", {"default": 1024, "min": 256,
                                   "max": 2048}),
            "num_inference_steps": ("INT", {"default": 50, "min": 1,
                                            "max": 100}),
            "guidance_scale": ("FLOAT", {"default": 7.0, "min": 0.0,
                                         "step": 0.1}),
            "octree_resolution": ("INT", {"default": 128, "min": 16}),
            "explode_factor": ("FLOAT", {"default": 0.3, "min": 0.0,
                                         "step": 0.01}),
        }}

    def generate(self, partcrafter_pipe, image, num_parts=4, seed=1234,
                 num_tokens=1024, num_inference_steps=50,
                 guidance_scale=7.0, octree_resolution=128,
                 explode_factor=0.3):
        from ..models.partcrafter import merge_parts
        img = np.asarray(image, np.float32)
        if img.ndim == 4:
            img = img[0]
        if img.shape[-1] == 4:
            a = img[..., 3:4]
            img = img[..., :3] * a + (1.0 - a)
        parts = partcrafter_pipe(
            img, num_parts=int(num_parts), seed=int(seed),
            num_steps=int(num_inference_steps),
            guidance_scale=float(guidance_scale),
            octree_resolution=int(octree_resolution))

        parts_dir = os.path.join(OUTPUT_ROOT_PATH, "partcrafter_parts")
        scene_dir = os.path.join(OUTPUT_ROOT_PATH, "partcrafter_scenes")
        os.makedirs(parts_dir, exist_ok=True)
        os.makedirs(scene_dir, exist_ok=True)
        zip_path = os.path.join(parts_dir, "parts.zip")
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
            for i, m in enumerate(parts):
                p = os.path.join(parts_dir, f"part_{i:02d}.glb")
                m.auto_normal().write(p)
                zf.write(p, f"part_{i:02d}.glb")
                os.remove(p)

        merged = merge_parts(_explode(parts, float(explode_factor)))
        scene_path = os.path.join(scene_dir, "scene.glb")
        merged.auto_normal().write(scene_path)
        print(f"[PartCrafter_Generate] {len(parts)} parts → {zip_path}, "
              f"merged scene → {scene_path}")
        return (zip_path, "partcrafter_scenes/scene.glb", img[None],
                merged)
