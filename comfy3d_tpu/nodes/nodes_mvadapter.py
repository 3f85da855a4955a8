"""MV-Adapter nodes (reference nodes.py:4818-5208)."""

from __future__ import annotations

import os

import numpy as np

from .base import maybe_shard, OUTPUT_ROOT_PATH, register


def _load_mesh(mesh_path):
    from ..core.mesh import Mesh
    if not mesh_path or not os.path.exists(mesh_path):
        raise ValueError(f"Mesh path does not exist: {mesh_path}")
    return Mesh.load(mesh_path).auto_size().auto_normal()


def _load_or_random(kind: str, base_model: str, num_views: int,
                    node_name: str):
    """Local-first loading (reference prepare_pipeline,
    mvadapter_node_utils.py:37-120): SDXL base from
    Checkpoints/Diffusers/<base_model>, adapter safetensors from
    Checkpoints/MV-Adapter/."""
    import dataclasses as dc

    from . import base
    from ..models.mvadapter import MVAdapterConfig
    base_dir = os.path.join(base.CKPT_ROOT_PATH, "Diffusers",
                            *(base_model or
                              "stabilityai/stable-diffusion-xl-base-1.0"
                              ).split("/"))
    adapter = os.path.join(base.CKPT_ROOT_PATH, "MV-Adapter",
                           f"mvadapter_{kind}_sdxl.safetensors")
    if os.path.isdir(os.path.join(base_dir, "unet")) and \
            os.path.exists(adapter):
        from ..models.mvadapter.convert import load_mvadapter_pipeline
        return load_mvadapter_pipeline(kind, base_dir, adapter,
                                       num_views=num_views)
    print(f"[{node_name}] no local SDXL base under {base_dir} or "
          f"adapter at {adapter} — initializing random weights")
    from ..models.mvadapter import (MVAdapterIG2MVPipeline,
                                    MVAdapterTG2MVPipeline)
    cfg = MVAdapterConfig()
    if num_views != cfg.num_views:
        azims = tuple(float(a) for a in
                      np.linspace(0, 360, num_views, endpoint=False))
        cfg = dc.replace(
            cfg, num_views=int(num_views), camera_azims=azims,
            camera_elevs=(0.0,) * int(num_views),
            unet=dc.replace(cfg.unet, mv_views=int(num_views)))
    cls = (MVAdapterIG2MVPipeline if kind == "ig2mv"
           else MVAdapterTG2MVPipeline)
    return cls.init_random(cfg=cfg)


def _views_to_grid(views):
    """[V, S, S, 3] → one row-major grid image [H, W, 3] (3 cols)."""
    v, s = views.shape[0], views.shape[1]
    cols = 3
    rows = -(-v // cols)
    pad = rows * cols - v
    if pad:
        views = np.concatenate(
            [views, np.zeros((pad,) + views.shape[1:], views.dtype)])
    return (views.reshape(rows, cols, s, s, 3)
            .transpose(0, 2, 1, 3, 4).reshape(rows * s, cols * s, 3))


@register
class Load_MVAdapter_IG2MV_Pipeline:
    """reference nodes.py:4818 — image-guided MV pipeline."""

    CATEGORY = "Comfy3D/Algorithm"
    RETURN_TYPES = ("DIFFUSERS_PIPE",)
    RETURN_NAMES = ("mvadapter_pipe",)
    FUNCTION = "load"

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "base_model": (["stabilityai/stable-diffusion-xl-base-1.0"],),
                "vae_model": (["madebyollin/sdxl-vae-fp16-fix", "None"],),
                "adapter_path": (["huanngzh/mv-adapter"],),
                "scheduler": (["ddpm"],),
                "num_views": ("INT", {"default": 6, "min": 1, "max": 16}),
                "use_fp16": ("BOOLEAN", {"default": True}),
                "use_mmgp": ("BOOLEAN", {"default": True}),
            },
            "optional": {"lora_model": ("STRING", {"default": ""})},
        }

    def load(self, base_model="", vae_model="", adapter_path="",
             scheduler="ddpm", num_views=6, use_fp16=True,
             use_mmgp=True, lora_model=""):
        return (maybe_shard(_load_or_random(
            "ig2mv", base_model, int(num_views),
            self.__class__.__name__)),)


@register
class MVAdapter_IG2MV:
    """reference nodes.py:4873 — reference image + mesh → views."""

    CATEGORY = "Comfy3D/Algorithm"
    RETURN_TYPES = ("IMAGE",)
    RETURN_NAMES = ("multiview_images",)
    FUNCTION = "run"

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "mvadapter_pipe": ("DIFFUSERS_PIPE",),
                "mesh_path": ("STRING", {"default": ""}),
                "reference_image": ("IMAGE",),
                "prompt": ("STRING", {"default": "high quality",
                                      "multiline": True}),
                "negative_prompt": ("STRING", {"default": "",
                                               "multiline": True}),
                "num_inference_steps": ("INT", {"default": 50, "min": 1,
                                                "max": 200}),
                "guidance_scale": ("FLOAT", {"default": 3.0, "min": 0.0,
                                             "max": 20.0, "step": 0.1}),
                "reference_conditioning_scale":
                    ("FLOAT", {"default": 1.0, "min": 0.0, "max": 2.0,
                               "step": 0.1}),
                "height": ("INT", {"default": 768, "min": 256,
                                   "max": 2048, "step": 8}),
                "width": ("INT", {"default": 768, "min": 256,
                                  "max": 2048, "step": 8}),
                "seed": ("INT", {"default": -1, "min": -1,
                                 "max": 0xffffffffffffffff}),
                "remove_background": ("BOOLEAN", {"default": False}),
            },
            "optional": {
                "lora_scale": ("FLOAT", {"default": 1.0, "min": 0.0,
                                         "max": 2.0, "step": 0.1}),
            },
        }

    def run(self, mvadapter_pipe, mesh_path, reference_image,
            prompt="", negative_prompt="", num_inference_steps=50,
            guidance_scale=3.0, reference_conditioning_scale=1.0,
            height=768, width=768, seed=-1, remove_background=False,
            lora_scale=1.0, **_):
        mesh = _load_mesh(mesh_path)
        img = np.asarray(reference_image, np.float32)
        if img.ndim == 4:
            img = img[0]
        if img.shape[-1] == 4:
            a = img[..., 3:4]
            img = img[..., :3] * a + (1.0 - a)
        views, _, _ = mvadapter_pipe(
            mesh, img, num_inference_steps=int(num_inference_steps),
            guidance_scale=float(guidance_scale),
            reference_conditioning_scale=float(
                reference_conditioning_scale),
            seed=int(seed), size=int(height))
        return (np.asarray(views),)


@register
class Load_MVAdapter_TG2MV_Pipeline:
    """reference nodes.py:4934 — text-guided MV pipeline."""

    CATEGORY = "Comfy3D/Algorithm"
    RETURN_TYPES = ("DIFFUSERS_PIPE",)
    RETURN_NAMES = ("mvadapter_tg2mv_pipe",)
    FUNCTION = "load"

    @classmethod
    def INPUT_TYPES(cls):
        return Load_MVAdapter_IG2MV_Pipeline.INPUT_TYPES()

    def load(self, base_model="", vae_model="", adapter_path="",
             scheduler="ddpm", num_views=6, use_fp16=True,
             use_mmgp=False, lora_model=""):
        return (maybe_shard(_load_or_random(
            "tg2mv", base_model, int(num_views),
            self.__class__.__name__)),)


@register
class MVAdapter_TG2MV:
    """reference nodes.py:4995 — text + mesh → views."""

    CATEGORY = "Comfy3D/Algorithm"
    RETURN_TYPES = ("IMAGE",)
    RETURN_NAMES = ("multiview_images",)
    FUNCTION = "run"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "mvadapter_tg2mv_pipe": ("DIFFUSERS_PIPE",),
            "mesh_path": ("STRING", {"default": ""}),
            "prompt": ("STRING", {"default": "high quality",
                                  "multiline": True}),
            "negative_prompt": ("STRING", {"default": "",
                                           "multiline": True}),
            "num_views": ("INT", {"default": 6, "min": 1, "max": 16}),
            "num_inference_steps": ("INT", {"default": 50, "min": 1,
                                            "max": 200}),
            "guidance_scale": ("FLOAT", {"default": 7.0, "min": 0.0,
                                         "max": 20.0, "step": 0.1}),
            "height": ("INT", {"default": 768, "min": 256,
                               "max": 2048, "step": 8}),
            "width": ("INT", {"default": 768, "min": 256, "max": 2048,
                              "step": 8}),
            "seed": ("INT", {"default": -1, "min": -1,
                             "max": 0xffffffffffffffff}),
        }}

    def run(self, mvadapter_tg2mv_pipe, mesh_path, prompt="",
            negative_prompt="", num_views=6, num_inference_steps=50,
            guidance_scale=7.0, height=768, width=768, seed=-1, **_):
        mesh = _load_mesh(mesh_path)
        views, _, _ = mvadapter_tg2mv_pipe(
            mesh, num_inference_steps=int(num_inference_steps),
            guidance_scale=float(guidance_scale), seed=int(seed),
            size=int(height))
        return (np.asarray(views),)


@register
class Load_MVAdapter_Texture_Pipeline:
    """reference nodes.py:5047 — projection/bake pipeline handle. The
    upscaler (RealESRGAN role → models.esrgan) and inpainter slots are
    carried on the handle."""

    CATEGORY = "Comfy3D/Algorithm"
    RETURN_TYPES = ("TEXTURE_PIPE",)
    RETURN_NAMES = ("texture_pipeline",)
    FUNCTION = "load"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "upscaler_ckpt_name": ("STRING",
                                   {"default": "RealESRGAN_x2plus.pth"}),
            "inpaint_ckpt_name": ("STRING", {"default": "big-lama.pt"}),
            "use_mmgp": ("BOOLEAN", {"default": False}),
            "auto_download": ("BOOLEAN", {"default": True}),
        }}

    def load(self, upscaler_ckpt_name="", inpaint_ckpt_name="",
             use_mmgp=False, auto_download=True):
        from . import base
        handle = {"upscaler": upscaler_ckpt_name,
                  "inpainter": inpaint_ckpt_name}
        sr_ckpt = os.path.join(base.CKPT_ROOT_PATH, "RealESRGAN",
                               upscaler_ckpt_name or "")
        if upscaler_ckpt_name and os.path.exists(sr_ckpt):
            import jax.numpy as jnp
            import torch as _torch
            from ..models import esrgan
            raw = _torch.load(sr_ckpt, map_location="cpu",
                              weights_only=True)
            raw = raw.get("params_ema", raw.get("params", raw))
            sd = {k: v.float().numpy() for k, v in raw.items()}
            sr_params = esrgan.convert_rrdb(sd)
            sr_cfg = esrgan.RRDBConfig()

            def upscale(view):
                return np.asarray(esrgan.upscale(
                    sr_params, jnp.asarray(view), sr_cfg))

            handle["upscale_fn"] = upscale
            print("[Load_MVAdapter_Texture_Pipeline] RealESRGAN view "
                  "upscaler wired")
        return (handle,)


@register
class MVAdapter_Texture_Projection:
    """reference nodes.py:5087 — project a view grid back onto the
    mesh UV texture; writes shaded + PBR GLBs and returns their paths."""

    CATEGORY = "Comfy3D/Algorithm"
    RETURN_TYPES = ("STRING", "STRING")
    RETURN_NAMES = ("shaded_model_path", "pbr_model_path")
    FUNCTION = "run"

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "texture_pipeline": ("TEXTURE_PIPE",),
                "grid_image": ("IMAGE",),
                "mesh_path": ("STRING", {"default": ""}),
                "save_dir": ("STRING", {"default": "./output"}),
                "save_name": ("STRING", {"default": "textured_model"}),
                "uv_size": ("INT", {"default": 4096, "min": 512,
                                    "max": 8192, "step": 256}),
                "view_upscale": ("BOOLEAN", {"default": True}),
                "inpaint_mode": (["none", "uv", "view"],),
                "uv_unwarp": ("BOOLEAN", {"default": True}),
                "preprocess_mesh": ("BOOLEAN", {"default": False}),
                "move_to_center": ("BOOLEAN", {"default": False}),
                "front_x": ("BOOLEAN", {"default": True}),
                "create_pbr_model": ("BOOLEAN", {"default": True}),
                "apply_dilate": ("BOOLEAN", {"default": True}),
            },
            "optional": {
                "camera_azimuth_deg": ("STRING",
                                       {"default": "0,90,180,270,180,180"}),
                "camera_elevation_deg":
                    ("STRING", {"default": "0,0,0,0,89.99,-89.99"}),
                "camera_distance": ("FLOAT", {"default": 1.0,
                                              "min": 0.1, "max": 10.0,
                                              "step": 0.1}),
                "camera_ortho_scale": ("FLOAT", {"default": 1.1,
                                                 "min": 0.1, "max": 5.0,
                                                 "step": 0.1}),
            },
        }

    def run(self, texture_pipeline, grid_image, mesh_path,
            save_dir="./output", save_name="textured_model",
            uv_size=4096, view_upscale=True, inpaint_mode="view",
            uv_unwarp=True, preprocess_mesh=False, move_to_center=False,
            front_x=True, create_pbr_model=True, apply_dilate=True,
            camera_azimuth_deg="0,90,180,270,180,180",
            camera_elevation_deg="0,0,0,0,89.99,-89.99",
            camera_distance=1.0, camera_ortho_scale=1.1, **_):
        from ..algorithms import color_project
        from ..core.camera import Camera
        mesh = _load_mesh(mesh_path)
        grid = np.asarray(grid_image, np.float32)
        if grid.ndim == 4:
            grid = grid[0]
        try:
            azims = [float(x) for x in camera_azimuth_deg.split(",")]
            elevs = [float(x) for x in camera_elevation_deg.split(",")]
        except ValueError:
            azims = [0, 90, 180, 270, 180, 180]
            elevs = [0, 0, 0, 0, 89.99, -89.99]
        v = len(azims)
        # split the 3-column grid back into views
        s = grid.shape[0] // (-(-v // 3))
        cols = grid.shape[1] // s
        views = [grid[r * s:(r + 1) * s, c * s:(c + 1) * s]
                 for r in range(grid.shape[0] // s)
                 for c in range(cols)][:v]
        up = (texture_pipeline or {}).get("upscale_fn") \
            if isinstance(texture_pipeline, dict) else None
        if view_upscale and up is not None:
            views = [up(vw) for vw in views]
            s = views[0].shape[0]
        cams = Camera.from_orbit(
            np.asarray(elevs, np.float32), np.asarray(azims, np.float32),
            float(camera_distance) + 0.8, width=s, height=s)
        mesh = color_project.bake_projection(
            mesh, np.stack(views), cams,
            texture_size=min(int(uv_size), 2048))
        save_dir = (save_dir if os.path.isabs(save_dir)
                    else os.path.join(OUTPUT_ROOT_PATH,
                                      save_dir.lstrip("./")))
        os.makedirs(save_dir, exist_ok=True)
        shaded = os.path.join(save_dir, f"{save_name}_shaded.glb")
        mesh.write(shaded)
        pbr = ""
        if create_pbr_model:
            pbr = os.path.join(save_dir, f"{save_name}_pbr.glb")
            mesh.write(pbr)
        print(f"[MVAdapter_Texture_Projection] shaded={shaded} "
              f"pbr={pbr}")
        return (shaded, pbr)
