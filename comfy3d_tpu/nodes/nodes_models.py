"""Model-family nodes (reference nodes.py:1939+). Round 1: TripoSR."""

from __future__ import annotations

import os

import numpy as np

from . import base
from .base import maybe_shard, register, error_none


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
        return (maybe_shard(pipe),)


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


@register
class Load_InstantMesh_Reconstruction_Model:
    """reference nodes.py:2476"""

    checkpoints_dir = "InstantMesh"
    default_ckpt_name = "instant_mesh_large.ckpt"

    @classmethod
    def INPUT_TYPES(cls):
        cls.checkpoints_dir_abs = os.path.join(base.CKPT_ROOT_PATH,
                                               cls.checkpoints_dir)
        names = base.get_list_filenames(
            cls.checkpoints_dir_abs, base.SUPPORTED_CHECKPOINTS_EXTENSIONS)
        if cls.default_ckpt_name not in names:
            names = names + [cls.default_ckpt_name]
        return {"required": {"model_name": (names,)}}

    RETURN_TYPES = ("LRM_MODEL",)
    RETURN_NAMES = ("lrm_model",)
    FUNCTION = "load_LRM"
    CATEGORY = "Comfy3D/Import|Export"

    def load_LRM(self, model_name="instant_mesh_large.ckpt"):
        from ..models.instantmesh import InstantMeshPipeline
        ckpt = os.path.join(
            getattr(self.__class__, "checkpoints_dir_abs",
                    os.path.join(base.CKPT_ROOT_PATH,
                                 self.checkpoints_dir)), model_name)
        if os.path.exists(ckpt):
            from ..models.instantmesh import convert as im_convert
            pipe = im_convert.from_pretrained(ckpt)
        else:
            print(f"[Load_InstantMesh] checkpoint {ckpt} not found — "
                  "initializing random weights")
            pipe = InstantMeshPipeline.init_random()
        return (maybe_shard(pipe),)


@register
class InstantMesh_Reconstruction_Model:
    """reference nodes.py:2532 — 6 views + orbit poses → textured mesh."""

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "lrm_model": ("LRM_MODEL",),
            "multiview_images": ("IMAGE",),
            "orbit_camera_poses": ("ORBIT_CAMPOSES",),
            "orbit_camera_fovy": ("FLOAT", {"default": 30.0}),
            "texture_resolution": ("INT", {"default": 1024}),
        }}

    RETURN_TYPES = ("MESH",)
    RETURN_NAMES = ("mesh",)
    FUNCTION = "run_LRM"
    CATEGORY = "Comfy3D/Algorithm"

    def run_LRM(self, lrm_model, multiview_images, orbit_camera_poses,
                orbit_camera_fovy=30.0, texture_resolution=1024):
        import jax.image as jimage
        import jax.numpy as jnp
        from ..models.instantmesh import orbit_poses_to_input_cameras
        imgs = np.asarray(multiview_images, np.float32)
        n = imgs.shape[0]
        if len(orbit_camera_poses) != n:
            return error_none(self.__class__.__name__,
                              f"{n} images != "
                              f"{len(orbit_camera_poses)} poses")
        imgs = np.asarray(jimage.resize(
            jnp.asarray(imgs), (n, 320, 320, 3), "bilinear"))
        poses = np.asarray(orbit_camera_poses, np.float32)
        cams = orbit_poses_to_input_cameras(
            poses[:, 2], poses[:, 1], radius=4.0,
            fov_deg=orbit_camera_fovy)
        planes = lrm_model.forward_planes(imgs[None], cams[None])
        mesh = lrm_model.extract_mesh(planes[0])
        return (mesh,)


@register
class Zero123Plus_Diffusion_Model:
    """reference nodes.py:2414 — single image → 3x2 grid of 6 views."""

    checkpoints_dir = "Zero123Plus"

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "zero123plus_pipe": ("DIFFUSERS_PIPE",),
                "reference_image": ("IMAGE",),
                "reference_mask": ("MASK",),
                "seed": ("INT", {"default": 1234, "min": 0,
                                 "max": 0xffffffffffffffff}),
                "guidance_scale": ("FLOAT", {"default": 4.0,
                                             "min": 0.0,
                                             "step": 0.01}),
                "num_inference_steps": ("INT", {"default": 28,
                                                "min": 1}),
            },
        }

    RETURN_TYPES = ("IMAGE", "ORBIT_CAMPOSES")
    RETURN_NAMES = ("multiviews", "orbit_camposes")
    FUNCTION = "run_model"
    CATEGORY = "Comfy3D/Algorithm"

    _cached = None

    def run_model(self, zero123plus_pipe=None, reference_image=None,
                  reference_mask=None, seed=1234, guidance_scale=4.0,
                  num_inference_steps=28, **_):
        from ..core import image as img_utils
        from ..core.camera import ORBITPOSE_PRESETS
        from ..models.zero123plus import Zero123PlusPipeline
        import jax.numpy as jnp

        pipe = zero123plus_pipe
        if pipe is None:
            cls = self.__class__
            if cls._cached is None:
                from .nodes_diffusers import (CKPT_DIFFUSERS_PATH,
                                              _has_weights)
                default = os.path.join(CKPT_DIFFUSERS_PATH, "sudo-ai",
                                       "zero123plus-v1.2")
                if _has_weights(default):
                    cls._cached = Zero123PlusPipeline.from_pretrained(
                        default)
                else:
                    print("[Zero123Plus] no pipe wired and no local "
                          f"checkpoint at {default} — random weights")
                    cls._cached = Zero123PlusPipeline.init_random()
            pipe = cls._cached

        img = np.asarray(img_utils.composite_background(
            jnp.asarray(reference_image), jnp.asarray(reference_mask),
            (1.0, 1.0, 1.0)))[0]
        grid = pipe(img, num_inference_steps=int(num_inference_steps),
                    guidance_scale=float(guidance_scale),
                    seed=int(seed) % (2 ** 31))
        # 3 rows x 2 cols of views → [6, S, S, 3]
        views = img_utils.split_image_grid(np.asarray(grid), 3, 2)
        camposes = [[1.2, e, a, 0.0, 0.0, 0.0]
                    for e, a in ORBITPOSE_PRESETS["Zero123Plus(6)"]]
        return (views, camposes)


@register
class MVDream_Model:
    """reference nodes.py:1716 — image/text → 4 orbit views."""

    @classmethod
    def INPUT_TYPES(cls):
        # widget ORDER must match the reference (nodes.py:1719-1734):
        # workflow JSONs carry positional widgets_values
        return {"required": {
            "mvdream_pipe": ("DIFFUSERS_PIPE",),
            "reference_image": ("IMAGE",),
            "reference_mask": ("MASK",),
            "prompt": ("STRING", {"default": "", "multiline": True}),
            "prompt_neg": ("STRING", {
                "default": "ugly, blurry, pixelated obscure, unnatural "
                "colors, poor lighting, dull, unclear, cropped, lowres, "
                "low quality, artifacts, duplicate", "multiline": True}),
            "seed": ("INT", {"default": 0, "min": 0,
                             "max": 0xffffffffffffffff}),
            "mv_guidance_scale": ("FLOAT", {"default": 5.0,
                                            "min": 0.0, "step": 0.01}),
            "num_inference_steps": ("INT", {"default": 30, "min": 1}),
            "elevation": ("FLOAT", {"default": 0.0}),
        }}

    RETURN_TYPES = ("IMAGE", "ORBIT_CAMPOSES")
    RETURN_NAMES = ("multiview_images", "orbit_camposes")
    FUNCTION = "run_model"
    CATEGORY = "Comfy3D/Algorithm"

    def run_model(self, mvdream_pipe, reference_image, reference_mask,
                  prompt="", prompt_neg="", seed=42,
                  mv_guidance_scale=7.0,
                  num_inference_steps=30, elevation=0.0):
        # ImageDream checkpoints condition on the reference image (IP
        # tokens + pinned extra view); text-only MVDream ignores it
        image = None
        if getattr(mvdream_pipe.cfg, "ip_dim", 0) > 0 \
                and reference_image is not None:
            from ..core import image as img_utils
            import jax.numpy as jnp
            img = jnp.asarray(reference_image)
            if reference_mask is not None:
                img = img_utils.composite_background(
                    img, jnp.asarray(reference_mask), (1.0, 1.0, 1.0))
            image = np.asarray(img)[0]
        out = mvdream_pipe(image=image,
                           num_inference_steps=num_inference_steps,
                           guidance_scale=mv_guidance_scale, seed=seed,
                           elevation=elevation)
        from ..core.camera import ORBITPOSE_PRESETS
        camposes = [[4.0, e, a, 0.0, 0.0, 0.0]
                    for e, a in ORBITPOSE_PRESETS["MVDream(4)"]]
        return (np.asarray(out), camposes[:np.asarray(out).shape[0]])


@register
class Load_Large_Multiview_Gaussian_Model:
    """reference nodes.py:1785"""

    checkpoints_dir = "LGM"
    default_ckpt_name = "model_fp16.safetensors"

    @classmethod
    def INPUT_TYPES(cls):
        cls.checkpoints_dir_abs = os.path.join(base.CKPT_ROOT_PATH,
                                               cls.checkpoints_dir)
        names = base.get_list_filenames(
            cls.checkpoints_dir_abs, base.SUPPORTED_CHECKPOINTS_EXTENSIONS)
        if cls.default_ckpt_name not in names:
            names = names + [cls.default_ckpt_name]
        return {"required": {"model_name": (names,)}}

    RETURN_TYPES = ("LGM_MODEL",)
    RETURN_NAMES = ("lgm_model",)
    FUNCTION = "load_LGM"
    CATEGORY = "Comfy3D/Import|Export"

    def load_LGM(self, model_name="model_fp16.safetensors"):
        from ..models.lgm import LGMPipeline
        ckpt = os.path.join(
            getattr(self.__class__, "checkpoints_dir_abs",
                    os.path.join(base.CKPT_ROOT_PATH,
                                 self.checkpoints_dir)), model_name)
        if os.path.exists(ckpt):
            print(f"[Load_LGM] loading {ckpt}")
            return (maybe_shard(LGMPipeline.from_pretrained(ckpt)),)
        print(f"[Load_LGM] checkpoint {ckpt} not found — random "
              "weights")
        return (maybe_shard(LGMPipeline.init_random()),)


@register
class Large_Multiview_Gaussian_Model:
    """reference nodes.py:1837 — 4 views → 3D gaussians."""

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "lgm_model": ("LGM_MODEL",),
            "multiview_images": ("IMAGE",),
        }}

    RETURN_TYPES = ("GS_PLY",)
    RETURN_NAMES = ("gs_ply",)
    FUNCTION = "run_LGM"
    CATEGORY = "Comfy3D/Algorithm"

    def run_LGM(self, lgm_model, multiview_images):
        imgs = np.asarray(multiview_images, np.float32)
        if imgs.shape[0] != lgm_model.cfg.num_views:
            return error_none(
                self.__class__.__name__,
                f"expected {lgm_model.cfg.num_views} views, got "
                f"{imgs.shape[0]}")
        return (lgm_model.forward_gaussians(imgs),)


@register
class Load_SF3D_Model:
    """reference nodes.py:2034."""

    checkpoints_dir = "StableFast3D"
    default_ckpt_name = "model.safetensors"

    @classmethod
    def INPUT_TYPES(cls):
        cls.checkpoints_dir_abs = os.path.join(base.CKPT_ROOT_PATH,
                                               cls.checkpoints_dir)
        names = base.get_list_filenames(
            cls.checkpoints_dir_abs, base.SUPPORTED_CHECKPOINTS_EXTENSIONS)
        if cls.default_ckpt_name not in names:
            names = names + [cls.default_ckpt_name]
        return {"required": {"model_name": (names,)}}

    RETURN_TYPES = ("SF3D_MODEL",)
    RETURN_NAMES = ("sf3d_model",)
    FUNCTION = "load_SF3D"
    CATEGORY = "Comfy3D/Import|Export"

    def load_SF3D(self, model_name="model.safetensors"):
        from ..models.sf3d import SF3DPipeline
        ckpt = os.path.join(
            getattr(self.__class__, "checkpoints_dir_abs",
                    os.path.join(base.CKPT_ROOT_PATH,
                                 self.checkpoints_dir)), model_name)
        if os.path.exists(ckpt):
            pipe = SF3DPipeline.from_pretrained(ckpt)
        else:
            print(f"[Load_SF3D_Model] checkpoint {ckpt} not found — "
                  "initializing random weights (set COMFY3D_CHECKPOINTS "
                  "to the stabilityai/stable-fast-3d model.safetensors)")
            pipe = SF3DPipeline.init_random()
        return (maybe_shard(pipe),)


@register
class StableFast3D:
    """reference nodes.py:2079 — image+mask → textured mesh."""

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "sf3d_model": ("SF3D_MODEL",),
            "reference_image": ("IMAGE",),
            "reference_mask": ("MASK",),
            "texture_resolution": ("INT", {"default": 1024, "min": 128,
                                           "max": 8192}),
            "remesh_option": (["None", "Triangle"],),
        }}

    RETURN_TYPES = ("MESH",)
    RETURN_NAMES = ("mesh",)
    FUNCTION = "run_SF3D"
    CATEGORY = "Comfy3D/Algorithm"

    def run_SF3D(self, sf3d_model, reference_image, reference_mask,
                 texture_resolution=1024, remesh_option="None"):
        import jax.numpy as jnp
        from ..core import image as img_utils

        img = np.asarray(img_utils.composite_background(
            jnp.asarray(reference_image), jnp.asarray(reference_mask),
            (0.5, 0.5, 0.5)))[0]
        mesh = sf3d_model.run_image(
            img, texture_size=int(texture_resolution),
            remesh=remesh_option.lower())
        return (mesh,)


@register
class Load_Triplane_Gaussian_Transformers:
    """reference nodes.py:1420."""

    checkpoints_dir = "TriplaneGaussian"
    default_ckpt_name = "model_lvis_rel.ckpt"

    @classmethod
    def INPUT_TYPES(cls):
        cls.checkpoints_dir_abs = os.path.join(base.CKPT_ROOT_PATH,
                                               cls.checkpoints_dir)
        names = base.get_list_filenames(
            cls.checkpoints_dir_abs, base.SUPPORTED_CHECKPOINTS_EXTENSIONS)
        if cls.default_ckpt_name not in names:
            names = names + [cls.default_ckpt_name]
        return {"required": {"model_name": (names,)}}

    RETURN_TYPES = ("TGS_MODEL",)
    RETURN_NAMES = ("tgs_model",)
    FUNCTION = "load_TGS"
    CATEGORY = "Comfy3D/Import|Export"

    def load_TGS(self, model_name="model_lvis_rel.ckpt"):
        from ..models.tgs import TGSPipeline
        path = os.path.join(self.checkpoints_dir_abs, model_name)
        if os.path.exists(path):
            from ..models.tgs.convert import load_tgs_checkpoint
            print(f"[Load_Triplane_Gaussian_Transformers] loading {path}")
            dino_dir = os.path.join(base.CKPT_ROOT_PATH, "dinov2-base")
            pipe = load_tgs_checkpoint(
                path, dinov2_dir=dino_dir
                if os.path.isdir(dino_dir) else None)
        else:
            print("[Load_Triplane_Gaussian_Transformers] initializing "
                  f"random weights ({path} not found)")
            pipe = TGSPipeline.init_random()
        return (maybe_shard(pipe),)


@register
class Triplane_Gaussian_Transformers:
    """reference nodes.py:1465 — image+mask → GS_PLY."""

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "reference_image": ("IMAGE",),
            "reference_mask": ("MASK",),
            "tgs_model": ("TGS_MODEL",),
            "cam_dist": ("FLOAT", {"default": 1.9, "min": 0.01,
                                   "step": 0.01}),
        }}

    RETURN_TYPES = ("GS_PLY",)
    RETURN_NAMES = ("gs_ply",)
    FUNCTION = "run_TGS"
    CATEGORY = "Comfy3D/Algorithm"

    def run_TGS(self, reference_image, reference_mask, tgs_model,
                cam_dist=1.9):
        import jax.numpy as jnp
        from ..core import image as img_utils

        img = np.asarray(img_utils.composite_background(
            jnp.asarray(reference_image), jnp.asarray(reference_mask),
            (1.0, 1.0, 1.0)))[0]
        mask = np.asarray(reference_mask, np.float32)
        mask = mask[0] if mask.ndim == 3 else mask
        splat = tgs_model(img, mask=mask, cam_dist=float(cam_dist))
        return (splat,)


@register
class TripoSG_I23D_Model:
    """reference nodes.py:4157 — image+mask → mesh via rectified-flow
    latent-set diffusion."""

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "tsg_pipe": ("DIFFUSERS_PIPE",),
                "reference_image": ("IMAGE",),
                "seed": ("INT", {"default": 42, "min": 0,
                                 "max": 0xffffffffffffffff}),
                "guidance_scale": ("FLOAT", {"default": 7.0, "min": 0.0,
                                             "step": 0.01}),
                "num_inference_steps": ("INT", {"default": 50,
                                                "min": 1}),
                "use_flash_decoder": ("BOOLEAN", {"default": True}),
                "flash_octree_depth": ("INT", {"default": 9, "min": 1}),
                "hierarchical_octree_depth": ("INT", {"default": 9,
                                                      "min": 1}),
                "dense_octree_depth": ("INT", {"default": 8, "min": 1}),
            },
            "optional": {"reference_mask": ("MASK",)},
        }

    RETURN_TYPES = ("MESH",)
    RETURN_NAMES = ("mesh",)
    FUNCTION = "run_model"
    CATEGORY = "Comfy3D/Algorithm"

    def run_model(self, tsg_pipe, reference_image, seed=42,
                  guidance_scale=7.0, num_inference_steps=50,
                  use_flash_decoder=True, flash_octree_depth=9,
                  hierarchical_octree_depth=9, dense_octree_depth=8,
                  reference_mask=None, **_):
        import jax.numpy as jnp
        from ..core import image as img_utils

        if reference_mask is not None:
            img = np.asarray(img_utils.composite_background(
                jnp.asarray(reference_image),
                jnp.asarray(reference_mask), (1.0, 1.0, 1.0)))[0]
        else:
            img = np.asarray(reference_image, np.float32)
            if img.ndim == 4:
                img = img[0]
            if img.shape[-1] == 4:
                a = img[..., 3:4]
                img = img[..., :3] * a + (1.0 - a)
        mesh = tsg_pipe(
            img, seed=int(seed), num_steps=int(num_inference_steps),
            guidance_scale=float(guidance_scale),
            octree_resolution=2 ** int(dense_octree_depth))[0]
        return (mesh.auto_normal(),)


@register
class Load_TripoSG_Pipeline:
    CATEGORY = "Comfy3D/Import|Export"
    RETURN_TYPES = ("DIFFUSERS_PIPE",)
    RETURN_NAMES = ("triposg_pipe",)
    FUNCTION = "load"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "repo_id": ("STRING", {"default": "VAST-AI/TripoSG",
                                   "multiline": False}),
        }}

    def load(self, repo_id="VAST-AI/TripoSG"):
        from ..models.triposg import TripoSGPipeline
        from .nodes_mvdiffusion import _local_ckpt
        ckpt = _local_ckpt(repo_id)
        from .base import maybe_shard
        if ckpt:
            print(f"[Load_TripoSG_Pipeline] loading {ckpt}")
            return (maybe_shard(TripoSGPipeline.from_pretrained(ckpt)),)
        print(f"[Load_TripoSG_Pipeline] initializing random weights "
              f"(no local checkpoints for {repo_id})")
        return (TripoSGPipeline.init_random(),)


@register
class Load_Craftsman_Shape_Diffusion_Model:
    """reference nodes.py:3332."""

    CATEGORY = "Comfy3D/Import|Export"
    RETURN_TYPES = ("CRAFTSMAN_MODEL",)
    RETURN_NAMES = ("craftsman_model",)
    FUNCTION = "load"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "model_name": (["image-to-shape-diffusion"],),
        }}

    def load(self, model_name="image-to-shape-diffusion"):
        import os
        from ..models.craftsman import CraftsmanPipeline
        from .base import CKPT_ROOT_PATH
        root = os.path.join(CKPT_ROOT_PATH, "Craftsman")
        cand = os.path.join(root, model_name)
        for path in (cand, root):
            if os.path.isdir(path):
                try:
                    pipe = CraftsmanPipeline.from_pretrained(path)
                    print(f"[Load_Craftsman_Shape_Diffusion_Model] "
                          f"loaded {path}")
                    from .base import maybe_shard
                    return (maybe_shard(pipe),)
                except FileNotFoundError:
                    continue
        print("[Load_Craftsman_Shape_Diffusion_Model] initializing "
              f"random weights (no ckpt under {root})")
        return (CraftsmanPipeline.init_random(),)


@register
class Craftsman_Shape_Diffusion_Model:
    """reference nodes.py:3377 — MV images → mesh."""

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "craftsman_model": ("CRAFTSMAN_MODEL",),
            "multiview_images": ("IMAGE",),
            "seed": ("INT", {"default": 0, "min": 0,
                             "max": 0xffffffffffffffff}),
            "guidance_scale": ("FLOAT", {"default": 7.5, "min": 0.0,
                                         "step": 0.01}),
            "num_inference_steps": ("INT", {"default": 50, "min": 1}),
            "octree_resolution": ("INT", {"default": 256, "min": 64}),
        }}

    RETURN_TYPES = ("MESH",)
    RETURN_NAMES = ("mesh",)
    FUNCTION = "run_model"
    CATEGORY = "Comfy3D/Algorithm"

    def run_model(self, craftsman_model, multiview_images, seed=0,
                  guidance_scale=7.5, num_inference_steps=50,
                  octree_resolution=256):
        imgs = np.asarray(multiview_images, np.float32)
        mesh = craftsman_model(
            imgs, seed=int(seed), num_steps=int(num_inference_steps),
            guidance_scale=float(guidance_scale),
            octree_resolution=int(octree_resolution))[0]
        return (mesh.auto_normal(),)


@register
class Fast_Normal_Maps_To_Mesh:
    """reference nodes.py:2959 — 4 orthographic normal maps → mesh
    (Unique3D reconstruct_stage1 role via algorithms.normal_recon)."""

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "normal_maps": ("IMAGE",),
            "normal_masks": ("MASK",),
            "optimization_steps": ("INT", {"default": 100, "min": 10}),
            "subdivisions": ("INT", {"default": 4, "min": 1, "max": 6}),
        }}

    RETURN_TYPES = ("MESH",)
    RETURN_NAMES = ("mesh",)
    FUNCTION = "run_recon"
    CATEGORY = "Comfy3D/Algorithm"

    def run_recon(self, normal_maps, normal_masks,
                  optimization_steps=100, subdivisions=4):
        from ..algorithms import normal_recon
        mesh = normal_recon.reconstruct_from_normals(
            np.asarray(normal_maps, np.float32),
            np.asarray(normal_masks, np.float32),
            steps=int(optimization_steps),
            subdivisions=int(subdivisions))
        return (mesh,)


@register
class ExplicitTarget_Mesh_Optimization:
    """reference nodes.py:2986 — refine an existing mesh against target
    normal maps (Unique3D run_mesh_refine role: fixed topology, vertex
    optimization)."""

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "mesh": ("MESH",),
            "reference_images": ("IMAGE",),
            "reference_masks": ("MASK",),
            "optimization_steps": ("INT", {"default": 100, "min": 10}),
        }}

    RETURN_TYPES = ("MESH",)
    RETURN_NAMES = ("mesh",)
    FUNCTION = "run_refine"
    CATEGORY = "Comfy3D/Algorithm"

    def run_refine(self, mesh, reference_images, reference_masks,
                   optimization_steps=100):
        import dataclasses as dc
        from ..algorithms import diff_mesh
        from ..core.camera import Camera
        imgs = np.asarray(reference_images, np.float32)
        masks = np.asarray(reference_masks, np.float32)
        n = imgs.shape[0]
        az = np.linspace(0.0, 360.0, n, endpoint=False)
        cams = Camera.from_orbit(np.zeros(n, np.float32),
                                 az.astype(np.float32), 2.0,
                                 width=imgs.shape[2],
                                 height=imgs.shape[1])
        cfg = dc.replace(diff_mesh.DiffMeshConfig(),
                         iterations=int(optimization_steps))
        out = diff_mesh.fit(mesh, cams, imgs, masks, cfg)
        return (out[0] if isinstance(out, tuple) else out,)


@register
class TripoSG_Scribble_Model:
    """reference nodes.py:4217 — scribble sketch (+ prompt) → mesh via
    the CFG-distilled TripoSG-scribble DiT (guidance fixed at 0; the
    text/scribble confidences scale the two cross-attention streams)."""

    CATEGORY = "Comfy3D/Algorithm"
    RETURN_TYPES = ("MESH",)
    RETURN_NAMES = ("mesh",)
    FUNCTION = "run_model"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "tsg_scribble_pipe": ("DIFFUSERS_PIPE",),
            "scribble_image": ("IMAGE",),
            "prompt": ("STRING", {"default": "3D assets",
                                  "multiline": True}),
            "seed": ("INT", {"default": 42, "min": 0,
                             "max": 0xffffffffffffffff}),
            "num_inference_steps": ("INT", {"default": 16, "min": 1}),
            "scribble_confidence": ("FLOAT", {"default": 0.4,
                                              "min": 0.0, "step": 0.01}),
            "prompt_confidence": ("FLOAT", {"default": 1.0, "min": 0.0,
                                            "step": 0.01}),
            "dense_octree_depth": ("INT", {"default": 8, "min": 1}),
        }}

    def run_model(self, tsg_scribble_pipe, scribble_image,
                  prompt="3D assets", seed=42, num_inference_steps=16,
                  scribble_confidence=0.4, prompt_confidence=1.0,
                  dense_octree_depth=8, **_):
        img = np.asarray(scribble_image, np.float32)
        if img.ndim == 4:
            img = img[0]
        if img.shape[-1] == 4:
            a = img[..., 3:4]
            img = img[..., :3] * a + (1.0 - a)
        mesh = tsg_scribble_pipe(
            img, seed=int(seed), num_steps=int(num_inference_steps),
            guidance_scale=0.0,     # CFG-distilled model
            octree_resolution=2 ** int(dense_octree_depth))[0]
        return (mesh.auto_normal(),)
