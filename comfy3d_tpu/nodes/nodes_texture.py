"""Texture / color-projection nodes (reference nodes.py:3045, 3137,
5472)."""

from __future__ import annotations

import os

import numpy as np

from . import base
from .base import maybe_shard, register, error_none


@register
class ExplicitTarget_Color_Projection:
    """reference nodes.py:3045 — project multiview images onto a mesh's
    vertex colors (Unique3D `multiview_color_projection` role)."""

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "mesh": ("MESH",),
            "reference_images": ("IMAGE",),
            "reference_masks": ("MASK",),
            "projection_resolution": ("INT", {"default": 1024,
                                              "min": 128, "max": 8192}),
            "complete_unseen_rgb": ("BOOLEAN", {"default": True}),
            "render_orbit_camera_fovy": ("FLOAT",
                                         {"default": 47.5, "min": 0.0,
                                          "max": 180.0, "step": 0.1}),
            "projection_weights": ("STRING",
                                   {"default": "2.0, 0.2, 1.0, 0.2"}),
            "confidence_threshold": ("FLOAT",
                                     {"default": 0.02, "min": 0.001,
                                      "max": 1.0, "step": 0.001}),
        }, "optional": {
            "reference_orbit_camera_poses": ("ORBIT_CAMPOSES",),
        }}

    RETURN_TYPES = ("MESH",)
    RETURN_NAMES = ("mesh",)
    FUNCTION = "run_color_projection"
    CATEGORY = "Comfy3D/Algorithm"

    def run_color_projection(self, mesh, reference_images,
                             reference_masks,
                             projection_resolution=1024,
                             complete_unseen_rgb=True,
                             render_orbit_camera_fovy=47.5,
                             projection_weights="2.0, 0.2, 1.0, 0.2",
                             confidence_threshold=0.02,
                             reference_orbit_camera_poses=None):
        import jax.numpy as jnp
        from ..algorithms import color_project
        from ..core import image as img_utils
        from ..core.camera import Camera

        imgs = np.asarray(img_utils.composite_background(
            jnp.asarray(reference_images), jnp.asarray(reference_masks),
            (1.0, 1.0, 1.0)))
        n = imgs.shape[0]
        if reference_orbit_camera_poses is None:
            az = np.linspace(0.0, 360.0, n, endpoint=False)
            poses = [[1.8, 0.0, a, 0, 0, 0] for a in az]
        else:
            poses = reference_orbit_camera_poses
        if len(poses) != n:
            return error_none(self.__class__.__name__,
                              f"{n} images vs {len(poses)} poses")
        poses = np.asarray(poses, np.float32)
        cams = Camera.from_orbit(
            poses[:, 1], poses[:, 2], poses[:, 0],
            target=poses[:, 3:6], fovy_deg=render_orbit_camera_fovy,
            width=int(projection_resolution),
            height=int(projection_resolution))
        mesh = color_project.project_and_inpaint(
            mesh, imgs, cams,
            confidence_min=float(confidence_threshold)
            if complete_unseen_rgb else -1.0)
        return (mesh,)


@register
class Convert_Vertex_Color_To_Texture:
    """reference nodes.py:3137 — vertex colors → UV albedo texture."""

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "mesh": ("MESH",),
            "texture_resolution": ("INT", {"default": 1024, "min": 128,
                                           "max": 8192}),
            "batch_size": ("INT", {"default": 128, "min": 1}),
        }}

    RETURN_TYPES = ("MESH",)
    RETURN_NAMES = ("mesh",)
    FUNCTION = "run_convert_func"
    CATEGORY = "Comfy3D/Algorithm"

    def run_convert_func(self, mesh, texture_resolution=1024,
                         batch_size=128):
        import jax.numpy as jnp
        from ..ops import texture as T

        if mesh.vc is None:
            print(f"[{self.__class__.__name__}] no vertex colors; "
                  "skipping")
            return (mesh,)
        if mesh.vt is None or mesh.ft is None:
            vt, ft = T.auto_unwrap(np.asarray(mesh.v),
                                  np.asarray(mesh.f))
            mesh.vt, mesh.ft = vt, ft
        albedo = T.bake_vertex_colors(
            jnp.asarray(mesh.v), jnp.asarray(mesh.f),
            jnp.asarray(mesh.vt), jnp.asarray(mesh.ft),
            jnp.asarray(mesh.vc),
            texture_size=int(texture_resolution))
        mesh.albedo = np.asarray(albedo)
        return (mesh,)


@register
class Hunyuan3D_21_TexGen:
    """reference nodes.py:5472 — textured mesh from reference image
    through the PBR multiview paint pipeline
    (hy3dpaint/textureGenPipeline.py:97-217): albedo + MR multiview
    diffusion → optional superres → weighted bake → mesh with
    metallicRoughness texture. Falls back to a single-view projection
    bake when no paint pipeline is connected."""

    CATEGORY = "Comfy3D/Algorithm/Hunyuan3D-2.1"
    RETURN_TYPES = ("MESH",)
    RETURN_NAMES = ("textured_mesh",)
    FUNCTION = "generate"

    @classmethod
    def INPUT_TYPES(cls):
        # reference contract (nodes.py:5475-5484): the mesh arrives as
        # a FILE PATH (linked from Save 3D Mesh's STRING output)
        return {
            "required": {
                "texgen_pipe": ("DIFFUSERS_PIPE",),
                "mesh_path": ("STRING", {"default": ""}),
                "image": ("IMAGE",),
                "create_pbr": ("BOOLEAN", {"default": True}),
                "use_remesh": ("BOOLEAN", {"default": False}),
            },
            "optional": {
                "mesh": ("MESH",),
            },
        }

    def generate(self, texgen_pipe, mesh_path="", image=None,
                 create_pbr=True, use_remesh=False, mesh=None):
        from ..models.hunyuan3d import Hunyuan3DPaintPipeline

        if mesh is None:
            from ..core.mesh import Mesh
            if not mesh_path or not os.path.exists(mesh_path):
                return base.error_none(
                    self.__class__.__name__,
                    f"mesh file not found: {mesh_path}")
            mesh = Mesh.load(mesh_path)

        if use_remesh:
            # reference hy3dpaint `remesh_mesh`
            # (`utils/simplify_mesh_utils.py:19-32`): QEM simplification
            # to 40k faces before UV wrap + texturing
            import dataclasses as _dc
            from .. import native
            v, f = native.decimate_mesh(np.asarray(mesh.v),
                                        np.asarray(mesh.f), 40000)
            mesh = _dc.replace(mesh, v=v, f=f, vn=None, fn=None, vt=None,
                               ft=None, vc=None, albedo=None).auto_normal()

        img = np.asarray(image, np.float32)
        if img.ndim == 4:
            img = img[0]
        if img.shape[-1] == 4:
            a = img[..., 3:4]
            img = img[..., :3] * a + (1.0 - a)
        if isinstance(texgen_pipe, Hunyuan3DPaintPipeline):
            steps = getattr(texgen_pipe, "default_steps", 8)
            out = texgen_pipe(mesh, img, num_steps=steps)
            if not create_pbr:
                out.metallic_roughness = None
            return (out,)
        from ..algorithms import color_project
        from ..core.camera import Camera
        cam = Camera.from_orbit(0.0, 0.0, 1.9, width=img.shape[1],
                                height=img.shape[0])
        mesh = color_project.bake_projection(mesh, img[None], cam,
                                             texture_size=1024)
        return (mesh.auto_normal(),)


@register
class Load_Hunyuan3D_V2_TexGen_Pipeline:
    """reference nodes.py:4365 — builds the multiview paint pipeline
    (`hy3dgen/texgen/pipelines.py:53`): geometry-conditioned 6-view
    diffusion + weighted bake. Turbo = fewer denoise steps."""

    CATEGORY = "Comfy3D/Import|Export"
    RETURN_TYPES = ("DIFFUSERS_PIPE",)
    RETURN_NAMES = ("texgen_pipe",)
    FUNCTION = "load"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "model_variant": (["Turbo", "Standard"],),
        }}

    def load(self, model_variant="Turbo"):
        from ..models.hunyuan3d import Hunyuan3DPaintPipeline
        root = os.path.join(base.CKPT_ROOT_PATH, "Diffusers", "tencent",
                            "Hunyuan3D-2")
        sub = ("hunyuan3d-paint-v2-0-turbo" if model_variant == "Turbo"
               else "hunyuan3d-paint-v2-0")
        model_dir = os.path.join(root, sub)
        if not os.path.isdir(os.path.join(model_dir, "unet")):
            model_dir = os.path.join(root, "hunyuan3d-paint-v2-0")
        if os.path.isdir(os.path.join(model_dir, "unet")):
            from ..models.hunyuan3d.paint_convert import \
                load_paint_checkpoint
            pipe = load_paint_checkpoint(model_dir)
        else:
            print("[Load_Hunyuan3D_V2_TexGen_Pipeline] no local paint "
                  f"checkpoint under {root} — initializing random "
                  "weights")
            pipe = Hunyuan3DPaintPipeline.init_random()
        pipe.default_steps = 8 if model_variant == "Turbo" else 25
        return (maybe_shard(pipe),)


@register
class Hunyuan3D_V2_Paint_Model:
    """reference nodes.py:4016 — mesh + reference image → textured
    mesh through the multiview paint pipeline."""

    CATEGORY = "Comfy3D/Algorithm"
    RETURN_TYPES = ("MESH",)
    RETURN_NAMES = ("mesh",)
    FUNCTION = "run_model"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "hunyuan3d_v2_texgen_pipe": ("DIFFUSERS_PIPE",),
            "reference_image": ("IMAGE",),
            "reference_mask": ("MASK",),
            "mesh": ("MESH",),
        }}

    def run_model(self, hunyuan3d_v2_texgen_pipe, reference_image,
                  reference_mask, mesh):
        img = np.asarray(reference_image, np.float32)
        if img.ndim == 4:
            img = img[0]
        mask = np.asarray(reference_mask, np.float32)
        if mask.ndim == 3:
            mask = mask[0]
        img = img[..., :3] * mask[..., None] + (1.0 - mask[..., None])
        pipe = hunyuan3d_v2_texgen_pipe
        steps = getattr(pipe, "default_steps", 8)
        return (pipe(mesh, img, num_steps=steps),)


@register
class Hunyuan3D_V2_Paint_Model_Turbo_MV:
    """reference nodes.py:4410 — paint a mesh from 1-3 reference views
    (simplified projection bake; the PBR multiview diffusion is the
    remaining delta)."""

    CATEGORY = "Comfy3D/Algorithm"
    RETURN_TYPES = ("MESH",)
    RETURN_NAMES = ("mesh",)
    FUNCTION = "run_model"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "hunyuan3d_v2_texgen_pipe": ("DIFFUSERS_PIPE",),
            "images": ("LIST",),
            "mesh": ("MESH",),
        }}

    def run_model(self, hunyuan3d_v2_texgen_pipe, images, mesh):
        from ..algorithms import color_project
        from ..core.camera import Camera
        from ..models.hunyuan3d import Hunyuan3DPaintPipeline

        if (isinstance(hunyuan3d_v2_texgen_pipe, Hunyuan3DPaintPipeline)
                and len(images) == 1):
            im = np.asarray(images[0], np.float32)
            if im.shape[-1] == 4:
                a = im[..., 3:4]
                im = im[..., :3] * a + (1.0 - a)
            steps = getattr(hunyuan3d_v2_texgen_pipe, "default_steps", 8)
            return (hunyuan3d_v2_texgen_pipe(mesh, im,
                                             num_steps=steps),)

        views = []
        for im in images:
            im = np.asarray(im, np.float32)
            if im.shape[-1] == 4:
                a = im[..., 3:4]
                im = im[..., :3] * a + (1.0 - a)
            views.append(im)
        azimuths = [0.0, 180.0, 90.0][:len(views)]
        size = views[0].shape[0]
        cams = Camera.from_orbit(
            np.zeros(len(views), np.float32),
            np.asarray(azimuths, np.float32), 1.9,
            width=size, height=size)
        mesh = color_project.bake_projection(
            mesh, np.stack(views), cams, texture_size=1024)
        return (mesh.auto_normal(),)


@register
class Load_Hunyuan3D_21_TexGen_Pipeline:
    """reference nodes.py:5277 — the 2.1 PBR multiview paint pipeline
    (hy3dpaint/textureGenPipeline.py:75-95): albedo + metallic/roughness
    attribute groups with learned per-attribute embeddings, optional
    RealESRGAN superres in the loop when its checkpoint is present under
    Checkpoints/RealESRGAN."""

    CATEGORY = "Comfy3D/Algorithm/Hunyuan3D-2.1"
    RETURN_TYPES = ("DIFFUSERS_PIPE",)
    RETURN_NAMES = ("texgen_pipe",)
    FUNCTION = "load"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "model_variant": (["Turbo", "Standard"],),
        }}

    def load(self, model_variant="Turbo"):
        import dataclasses
        import os
        from ..models.hunyuan3d import Hunyuan3DPaintPipeline
        from ..models.hunyuan3d.paint import PaintConfig
        model_dir = os.path.join(base.CKPT_ROOT_PATH, "Diffusers",
                                 "tencent", "Hunyuan3D-2.1",
                                 "hunyuan3d-paintpbr-v2-1")
        if os.path.isdir(os.path.join(model_dir, "unet")):
            from ..models.hunyuan3d.paint_convert import \
                load_paint_checkpoint
            pipe = load_paint_checkpoint(model_dir, pbr=True)
        else:
            cfg = dataclasses.replace(PaintConfig(),
                                      pbr_settings=("albedo", "mr"))
            print("[Load_Hunyuan3D_21_TexGen_Pipeline] no local PBR "
                  f"paint checkpoint under {model_dir} — initializing "
                  "random weights")
            pipe = Hunyuan3DPaintPipeline.init_random(cfg=cfg)
        pipe.default_steps = 8 if model_variant == "Turbo" else 25
        sr_dir = os.path.join(base.CKPT_ROOT_PATH, "RealESRGAN")
        sr_ckpt = os.path.join(sr_dir, "RealESRGAN_x4plus.pth")
        if os.path.exists(sr_ckpt):
            import jax.numpy as jnp
            import torch as _torch
            from ..models import esrgan
            raw = _torch.load(sr_ckpt, map_location="cpu",
                              weights_only=True)
            raw = raw.get("params_ema", raw.get("params", raw))
            sd = {k: v.float().numpy() for k, v in raw.items()}
            sr_params = esrgan.convert_rrdb(sd)
            sr_cfg = esrgan.RRDBConfig()

            def superres(views):
                return np.stack([np.asarray(esrgan.upscale(
                    sr_params, jnp.asarray(v), sr_cfg)) for v in views])

            pipe.set_superres(superres)
            print("[Load_Hunyuan3D_21_TexGen_Pipeline] RealESRGAN "
                  "superres wired into the bake loop")
        return (maybe_shard(pipe),)
