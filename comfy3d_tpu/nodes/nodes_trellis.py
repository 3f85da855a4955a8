"""TRELLIS nodes (reference nodes.py:4059, 4087)."""

from __future__ import annotations

import numpy as np

from .base import maybe_shard, register


@register
class Load_Trellis_Structured_3D_Latents_Models:
    """reference nodes.py:4059."""

    default_repo_id = "jetx/TRELLIS-image-large"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "repo_id": ("STRING", {"default": cls.default_repo_id,
                                   "multiline": False}),
        }}

    RETURN_TYPES = ("TRELLIS_PIPE",)
    RETURN_NAMES = ("trellis_pipe",)
    FUNCTION = "load_pipe"
    CATEGORY = "Comfy3D/Import|Export"

    def load_pipe(self, repo_id="jetx/TRELLIS-image-large"):
        import os

        from . import base
        from ..models.trellis import TrellisImageTo3DPipeline
        from ..models.trellis import convert as trellis_convert

        # local-first: <ckpts>/TRELLIS/pipeline.json or
        # <ckpts>/<repo tail>/pipeline.json (reference base.py:21-45
        # resolves a pipeline.json the same way before HF fallback)
        for cand in (os.path.join(base.CKPT_ROOT_PATH, "TRELLIS"),
                     os.path.join(base.CKPT_ROOT_PATH,
                                  repo_id.split("/")[-1])):
            if os.path.exists(os.path.join(cand, "pipeline.json")):
                print(f"[Load_Trellis] loading checkpoints from {cand}")
                return (maybe_shard(trellis_convert.from_pretrained(cand)),)
        print("[Load_Trellis] no local checkpoint tree for "
              f"{repo_id} under {base.CKPT_ROOT_PATH} — random weights "
              "(place pipeline.json + ckpts/ there to load real ones)")
        return (maybe_shard(TrellisImageTo3DPipeline.init_random()),)


@register
class Trellis_Structured_3D_Latents_Models:
    """reference nodes.py:4087 — image+mask → mesh (+GS colors)."""

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "trellis_pipe": ("TRELLIS_PIPE",),
            "reference_image": ("IMAGE",),
            "reference_mask": ("MASK",),
            "seed": ("INT", {"default": 1, "min": 0,
                             "max": 0xffffffffffffffff}),
            "sparse_structure_guidance_scale": ("FLOAT",
                                                {"default": 7.5,
                                                 "min": 0.0,
                                                 "step": 0.01}),
            "sparse_structure_sample_steps": ("INT", {"default": 12,
                                                      "min": 1}),
            "structured_latent_guidance_scale": ("FLOAT",
                                                 {"default": 3.0,
                                                  "min": 0.0,
                                                  "step": 0.01}),
            "structured_latent_sample_steps": ("INT", {"default": 12,
                                                       "min": 1}),
        }}

    RETURN_TYPES = ("MESH", "GS_PLY")
    RETURN_NAMES = ("mesh", "gs_ply")
    FUNCTION = "run_model"
    CATEGORY = "Comfy3D/Algorithm"

    def run_model(self, trellis_pipe, reference_image, reference_mask,
                  seed=1, sparse_structure_guidance_scale=7.5,
                  sparse_structure_sample_steps=12,
                  structured_latent_guidance_scale=3.0,
                  structured_latent_sample_steps=12):
        import dataclasses
        import jax.numpy as jnp
        from ..core import image as img_utils

        cfg = dataclasses.replace(
            trellis_pipe.cfg,
            ss_cfg=float(sparse_structure_guidance_scale),
            ss_steps=int(sparse_structure_sample_steps),
            slat_cfg=float(structured_latent_guidance_scale),
            slat_steps=int(structured_latent_sample_steps))
        trellis_pipe.cfg = cfg
        img = np.asarray(img_utils.composite_background(
            jnp.asarray(reference_image), jnp.asarray(reference_mask),
            (1.0, 1.0, 1.0)))[0]
        out = trellis_pipe.run(img, seed=int(seed),
                               formats=("gaussian", "mesh"))
        mesh = out["mesh"]
        splat = out["gaussian"]
        # vertex colors from the nearest gaussian (texture bake is the
        # round-3 finalize_mesh path, postprocessing_utils.py:273)
        try:
            from ..ops import knn as knn_ops
            alive = np.asarray(splat.alive)
            pts = np.asarray(splat.xyz)[alive]
            if len(pts) and mesh.num_vertices:
                cols = np.asarray(jnp.clip(
                    splat.sh[:, 0][jnp.asarray(alive)] + 0.5, 0, 1))
                idx = np.asarray(knn_ops.knn(
                    jnp.asarray(mesh.v), jnp.asarray(pts), k=1)[1])[:, 0]
                mesh.vc = cols[idx]
        except Exception as e:
            print(f"[Trellis] vertex-color projection skipped: {e}")
        return (mesh.auto_normal(), splat)
