"""Renderer + optimization-algorithm nodes
(reference nodes.py:1011-1413, 2685-2835)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.camera import Camera
from ..core.gaussian import GaussianSplat
from ..ops import gs_render, mesh_render
from .base import register, error_none


def _cams_from_poses(orbit_camposes, fovy, width, height):
    return Camera.from_camposes(orbit_camposes, fovy_deg=fovy,
                                width=width, height=height)


@register
class Mesh_Orbit_Renderer:
    """reference nodes.py:1011"""

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "mesh": ("MESH",),
            "render_image_size": ("INT", {"default": 512, "min": 64,
                                          "max": 4096}),
            "render_orbit_camera_poses": ("ORBIT_CAMPOSES",),
            "render_orbit_camera_fovy": ("FLOAT", {"default": 49.1}),
            "render_background_color_r": ("FLOAT", {"default": 1.0}),
            "render_background_color_g": ("FLOAT", {"default": 1.0}),
            "render_background_color_b": ("FLOAT", {"default": 1.0}),
        }}

    # reference order (nodes.py:1033-1046): images, masks, depths,
    # normals, viewcos
    RETURN_TYPES = ("IMAGE", "MASK", "IMAGE", "IMAGE", "IMAGE")
    RETURN_NAMES = ("rendered_mesh_images", "rendered_mesh_masks",
                    "all_rendered_depths", "all_rendered_normals",
                    "all_rendered_viewcos")
    FUNCTION = "render_mesh"
    CATEGORY = "Comfy3D/Algorithm"

    def render_mesh(self, mesh, render_image_size,
                    render_orbit_camera_poses, render_orbit_camera_fovy,
                    render_background_color_r=1.0,
                    render_background_color_g=1.0,
                    render_background_color_b=1.0):
        cams = _cams_from_poses(render_orbit_camera_poses,
                                render_orbit_camera_fovy,
                                render_image_size, render_image_size)
        d = mesh.device_arrays()
        bg = jnp.asarray([render_background_color_r,
                          render_background_color_g,
                          render_background_color_b])
        kw = {}
        if mesh.vt is not None and mesh.ft is not None \
                and mesh.albedo is not None:
            nf = mesh.num_faces
            kw = dict(vt=jnp.asarray(mesh.vt), ft=jnp.asarray(mesh.ft),
                      albedo=jnp.asarray(mesh.albedo))
        elif mesh.vc is not None:
            kw = dict(vc=d["vc"])
        face_valid = jnp.arange(d["f"].shape[0]) < mesh.num_faces
        if "ft" in kw:
            # face-varying UVs need unpadded faces for index parity
            out = mesh_render.render_mesh(
                jnp.asarray(mesh.v), jnp.asarray(mesh.f), cams,
                vn=jnp.asarray(mesh.vn) if mesh.vn is not None else None,
                background=bg, **kw)
        else:
            out = mesh_render.render_mesh(
                d["v"], d["f"], cams, face_valid=face_valid,
                background=bg, **kw)
        normals = np.asarray(out["normal"]) * 0.5 + 0.5
        depth = np.asarray(out["depth"])
        depth_img = np.repeat(depth[..., None], 3, -1)
        depth_img = depth_img / max(depth_img.max(), 1e-6)
        viewcos = np.asarray(out["viewcos"])
        if viewcos.ndim == 3:
            viewcos = np.repeat(viewcos[..., None], 3, -1)
        return (np.asarray(out["image"]), np.asarray(out["alpha"]),
                depth_img, normals, viewcos)


@register
class Gaussian_Splatting_Orbit_Renderer:
    """reference nodes.py:1100"""

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "gs_ply": ("GS_PLY",),
            "render_image_size": ("INT", {"default": 512, "min": 64,
                                          "max": 4096}),
            "render_orbit_camera_poses": ("ORBIT_CAMPOSES",),
            "render_orbit_camera_fovy": ("FLOAT", {"default": 49.1}),
            "render_background_color_r": ("FLOAT", {"default": 1.0}),
            "render_background_color_g": ("FLOAT", {"default": 1.0}),
            "render_background_color_b": ("FLOAT", {"default": 1.0}),
        }}

    # reference (nodes.py:1116-1125) also returns per-view depths
    RETURN_TYPES = ("IMAGE", "MASK", "IMAGE")
    RETURN_NAMES = ("rendered_gs_images", "rendered_gs_masks",
                    "rendered_gs_depths")
    FUNCTION = "render_gs"
    CATEGORY = "Comfy3D/Algorithm"

    def render_gs(self, gs_ply, render_image_size,
                  render_orbit_camera_poses, render_orbit_camera_fovy,
                  render_background_color_r=1.0,
                  render_background_color_g=1.0,
                  render_background_color_b=1.0):
        cams = _cams_from_poses(render_orbit_camera_poses,
                                render_orbit_camera_fovy,
                                render_image_size, render_image_size)
        out = gs_render.render(
            gs_ply, cams,
            background=(render_background_color_r,
                        render_background_color_g,
                        render_background_color_b))
        depth = np.asarray(out["depth"])
        if depth.ndim == 3:
            depth = np.repeat(depth[..., None], 3, -1)
        depth = depth / max(float(depth.max()), 1e-6)
        return (np.asarray(out["image"]), np.asarray(out["alpha"]),
                depth)


@register
class Gaussian_Splatting_3D:
    """reference nodes.py:1165 — multi-view 3DGS optimization."""

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "reference_images": ("IMAGE",),
                "reference_masks": ("MASK",),
                "reference_orbit_camera_poses": ("ORBIT_CAMPOSES",),
                "reference_orbit_camera_fovy": ("FLOAT",
                                                {"default": 49.1}),
                "training_iterations": ("INT", {"default": 30000,
                                                "min": 1}),
                "batch_size": ("INT", {"default": 1, "min": 1}),
                "ms_ssim_loss_weight": ("FLOAT", {"default": 0.2}),
                "alpha_loss_weight": ("FLOAT", {"default": 3.0}),
                "offset_loss_weight": ("FLOAT", {"default": 0.0}),
                "offset_opacity_loss_weight": ("FLOAT", {"default": 0.0}),
                "invert_background_probability": ("FLOAT",
                                                  {"default": 0.5}),
            },
            "optional": {
                "points_cloud_to_initialize_gaussian": ("POINTCLOUD",),
                "ply_to_initialize_gaussian": ("GS_PLY",),
                "mesh_to_initialize_gaussian": ("MESH",),
            },
        }

    RETURN_TYPES = ("GS_PLY",)
    RETURN_NAMES = ("gs_ply",)
    FUNCTION = "run_gs"
    CATEGORY = "Comfy3D/Algorithm"

    def run_gs(self, reference_images, reference_masks,
               reference_orbit_camera_poses, reference_orbit_camera_fovy,
               training_iterations=30000, batch_size=1,
               ms_ssim_loss_weight=0.2, alpha_loss_weight=3.0,
               offset_loss_weight=0.0, offset_opacity_loss_weight=0.0,
               invert_background_probability=0.5,
               points_cloud_to_initialize_gaussian=None,
               ply_to_initialize_gaussian=None,
               mesh_to_initialize_gaussian=None):
        from ..algorithms import gs_trainer

        imgs = np.asarray(reference_images, np.float32)
        masks = np.asarray(reference_masks, np.float32)
        if len(imgs) != len(reference_orbit_camera_poses):
            return error_none(
                self.__class__.__name__,
                f"number of reference images {len(imgs)} != number of "
                f"camera poses {len(reference_orbit_camera_poses)}")
        h = imgs.shape[1]
        cams = _cams_from_poses(reference_orbit_camera_poses,
                                reference_orbit_camera_fovy,
                                imgs.shape[2], h)
        if ply_to_initialize_gaussian is not None:
            splat = ply_to_initialize_gaussian
        elif points_cloud_to_initialize_gaussian is not None:
            pc = points_cloud_to_initialize_gaussian
            splat = GaussianSplat.from_points(
                pc["points"], colors=pc.get("colors"), capacity=65536)
        elif mesh_to_initialize_gaussian is not None:
            pts, cols = mesh_to_initialize_gaussian.convert_to_pointcloud()
            splat = GaussianSplat.from_points(pts, colors=cols,
                                              capacity=65536)
        else:
            splat = GaussianSplat.random(jax.random.PRNGKey(0), 5000,
                                         radius=0.5)
            import dataclasses as _dc
            pad = 65536 - splat.num_capacity
            if pad > 0:
                splat = GaussianSplat.from_points(
                    np.asarray(splat.xyz), capacity=65536)
        cfg = gs_trainer.GSTrainConfig(
            iterations=training_iterations, batch_size=batch_size,
            lambda_ssim=ms_ssim_loss_weight,
            lambda_alpha=alpha_loss_weight,
            invert_bg_prob=invert_background_probability)
        # dp-shard the view batch over all visible devices (the batch is
        # grown to a multiple of the dp axis so nothing is wasted)
        mesh = None
        import os as _os
        if not _os.environ.get("COMFY3D_NO_SHARD"):
            from ..parallel import maybe_default_mesh
            mesh = maybe_default_mesh()
        if mesh is not None:
            dp = mesh.shape["dp"]
            if cfg.batch_size % dp:
                import dataclasses as _dc
                cfg = _dc.replace(
                    cfg, batch_size=-(-cfg.batch_size // dp) * dp)
                print(f"[Gaussian_Splatting_3D] batch_size → "
                      f"{cfg.batch_size} (dp={dp})")
        out = gs_trainer.train(splat, cams, imgs, masks, cfg, mesh=mesh)
        return (out,)


@register
class Instant_NGP:
    """reference nodes.py:2685 — NeRF fit + optional mesh extraction."""

    @classmethod
    def INPUT_TYPES(cls):
        # names/order mirror the reference (nodes.py:2688-2700) —
        # workflow links address inputs by name, widgets by position
        return {"required": {
            "reference_image": ("IMAGE",),
            "reference_mask": ("MASK",),
            "reference_orbit_camera_poses": ("ORBIT_CAMPOSES",),
            "reference_orbit_camera_fovy": ("FLOAT", {"default": 49.1}),
            "training_iterations": ("INT", {"default": 512, "min": 1}),
            "training_resolution": ("INT", {"default": 128,
                                            "min": 16}),
            "marching_cude_grids_resolution": ("INT", {"default": 256,
                                                       "min": 1}),
            "marching_cude_grids_batch_size": ("INT", {"default": 128,
                                                       "min": 1}),
            "marching_cude_threshold": ("FLOAT", {"default": 10.0,
                                                  "min": 0.0}),
            "texture_resolution": ("INT", {"default": 1024,
                                           "min": 128}),
            "background_color": ("FLOAT", {"default": 1.0, "min": 0.0,
                                           "max": 1.0}),
            "force_cuda_rast": ("BOOLEAN", {"default": False}),
        }}

    RETURN_TYPES = ("MESH",)
    RETURN_NAMES = ("mesh",)
    FUNCTION = "run_instant_ngp"
    CATEGORY = "Comfy3D/Algorithm"

    def run_instant_ngp(self, reference_image, reference_mask,
                        reference_orbit_camera_poses,
                        reference_orbit_camera_fovy,
                        training_iterations=512,
                        training_resolution=128,
                        marching_cude_grids_resolution=256,
                        marching_cude_grids_batch_size=128,
                        marching_cude_threshold=10.0,
                        texture_resolution=1024, background_color=1.0,
                        force_cuda_rast=False, batch_size=4096, **_):
        from ..algorithms import ngp as ngp_mod
        from ..ops import tetra

        marching_cube_grid_resolution = marching_cude_grids_resolution
        marching_cube_threshold = marching_cude_threshold
        imgs = np.asarray(reference_image, np.float32)
        masks = np.asarray(reference_mask, np.float32)
        cams = _cams_from_poses(reference_orbit_camera_poses,
                                reference_orbit_camera_fovy,
                                imgs.shape[2], imgs.shape[1])
        cfg = ngp_mod.NGPConfig(iterations=training_iterations,
                                ray_batch=batch_size)
        params, occ = ngp_mod.fit(cams, imgs, masks, cfg)
        grid = ngp_mod.density_grid(params, cfg,
                                    res=marching_cube_grid_resolution)
        mesh = tetra.extract_isosurface(
            np.asarray(grid), iso=marching_cube_threshold,
            bounds=(-cfg.bound, cfg.bound))
        if mesh.num_vertices == 0:
            # short fits / low-density scenes can sit entirely under
            # the production threshold — retry at the density field's
            # 98th percentile rather than returning nothing
            adaptive = float(np.quantile(np.asarray(grid), 0.98))
            print(f"[{self.__class__.__name__}] empty surface at "
                  f"threshold {marching_cube_threshold}; retrying at "
                  f"98th-percentile density {adaptive:.4f}")
            mesh = tetra.extract_isosurface(
                np.asarray(grid), iso=adaptive,
                bounds=(-cfg.bound, cfg.bound))
        if mesh.num_vertices == 0:
            return error_none(self.__class__.__name__,
                              "empty surface at threshold "
                              f"{marching_cube_threshold}")
        # vertex colors from the fitted field
        field, _ = ngp_mod.make_field(params, cfg)
        v = jnp.asarray(mesh.v)
        dirs = -v / jnp.maximum(jnp.linalg.norm(v, axis=-1,
                                                keepdims=True), 1e-8)
        _, rgb = field(v, dirs)
        mesh.vc = np.asarray(jnp.clip(rgb, 0, 1))
        return (mesh.auto_normal(),)


@register
class FlexiCubes_MVS:
    """reference nodes.py:2749 — multi-view depth+mask(+normal) → mesh."""

    @classmethod
    def INPUT_TYPES(cls):
        # names/order mirror the reference (nodes.py:2752-2774) so the
        # FlexiCubes example workflow's links + positional widgets bind
        return {
            "required": {
                "reference_depth_maps": ("IMAGE",),
                "reference_masks": ("MASK",),
                "reference_orbit_camera_poses": ("ORBIT_CAMPOSES",),
                "reference_orbit_camera_fovy": ("FLOAT",
                                                {"default": 49.1}),
                "training_iterations": ("INT", {"default": 512,
                                                "min": 1}),
                "batch_size": ("INT", {"default": 4, "min": 1}),
                "learning_rate": ("FLOAT", {"default": 0.01,
                                            "min": 0.001}),
                "voxel_grids_resolution": ("INT", {"default": 128,
                                                   "min": 1}),
                "depth_min_distance": ("FLOAT", {"default": 0.5}),
                "depth_max_distance": ("FLOAT", {"default": 5.5}),
                "mask_loss_weight": ("FLOAT", {"default": 1.0}),
                "depth_loss_weight": ("FLOAT", {"default": 100.0}),
                "normal_loss_weight": ("FLOAT", {"default": 1.0}),
                "sdf_regularizer_weight": ("FLOAT", {"default": 0.2}),
                "remove_floaters_weight": ("FLOAT", {"default": 0.5}),
                "cube_stabilizer_weight": ("FLOAT", {"default": 0.1}),
                "force_cuda_rast": ("BOOLEAN", {"default": False}),
            },
            "optional": {
                "reference_normal_maps": ("IMAGE",),
            },
        }

    RETURN_TYPES = ("MESH",)
    RETURN_NAMES = ("mesh",)
    FUNCTION = "run_flexicubes"
    CATEGORY = "Comfy3D/Algorithm"

    def run_flexicubes(self, reference_depth_maps, reference_masks,
                       reference_orbit_camera_poses,
                       reference_orbit_camera_fovy,
                       training_iterations=512, batch_size=4,
                       learning_rate=0.01,
                       voxel_grids_resolution=128,
                       depth_min_distance=0.5, depth_max_distance=5.5,
                       mask_loss_weight=1.0, depth_loss_weight=100.0,
                       normal_loss_weight=1.0,
                       sdf_regularizer_weight=0.2,
                       remove_floaters_weight=0.5,
                       cube_stabilizer_weight=0.1,
                       force_cuda_rast=False,
                       reference_normal_maps=None, **_):
        from ..algorithms import sdf_fit

        reference_normals = reference_normal_maps
        depths = np.asarray(reference_depth_maps, np.float32)
        if depths.ndim == 4:
            depths = depths[..., 0]
        # reference depth maps encode view distance in
        # [depth_min, depth_max] over [0,1] (flexicubes_trainer.py)
        depths = depth_min_distance + depths \
            * (depth_max_distance - depth_min_distance)
        masks = np.asarray(reference_masks, np.float32)
        depths = depths * (masks > 0.5)
        cams = _cams_from_poses(reference_orbit_camera_poses,
                                reference_orbit_camera_fovy,
                                masks.shape[2], masks.shape[1])
        cfg = sdf_fit.SDFFitConfig(
            resolution=voxel_grids_resolution,
            iterations=training_iterations, batch_size=batch_size,
            lr=learning_rate, engine="flexicubes",
            lambda_mask=mask_loss_weight,
            lambda_depth=depth_loss_weight,
            lambda_normal=normal_loss_weight,
            lambda_sign=sdf_regularizer_weight,
            lambda_dev=remove_floaters_weight,
            lambda_weights=cube_stabilizer_weight)
        mesh = sdf_fit.fit(
            cams, masks, ref_depths=depths,
            ref_normals=(np.asarray(reference_normals, np.float32)
                         if reference_normals is not None else None),
            cfg=cfg)
        return (mesh,)


@register
class Convert_3DGS_to_Mesh_with_NeRF_and_Marching_Cubes:
    """reference nodes.py:1873 (LGM GS→mesh converter role)."""

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "gs_ply": ("GS_PLY",),
            "gs_config": (["Big", "Default", "Small"],
                          {"default": "Default"}),
            "training_nerf_iterations": ("INT", {"default": 384,
                                                 "min": 32}),
            "marching_cube_grids_resolution": ("INT", {"default": 192}),
            "marching_cube_threshold": ("FLOAT", {"default": 10.0}),
            "texture_resolution": ("INT", {"default": 1024}),
        }}

    RETURN_TYPES = ("MESH",)
    RETURN_NAMES = ("mesh",)
    FUNCTION = "convert_gs_to_mesh"
    CATEGORY = "Comfy3D/Algorithm"

    def convert_gs_to_mesh(self, gs_ply, gs_config="Default",
                           training_nerf_iterations=384,
                           marching_cube_grids_resolution=192,
                           marching_cube_threshold=10.0,
                           texture_resolution=1024):
        from ..algorithms import gs_to_mesh
        render_size = {"Big": 512, "Default": 256, "Small": 128}.get(
            gs_config, 256)
        cfg = gs_to_mesh.GSToMeshConfig(
            render_size=render_size,
            ngp_iters=training_nerf_iterations,
            grid_resolution=marching_cube_grids_resolution,
            density_threshold=marching_cube_threshold,
            texture_size=texture_resolution)
        return (gs_to_mesh.convert(gs_ply, cfg),)


@register
class Convert_Vertex_Color_To_Texture:
    """reference nodes.py:3137 — unwrap + bake vertex colors."""

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "mesh": ("MESH",),
            "texture_resolution": ("INT", {"default": 1024}),
        }}

    RETURN_TYPES = ("MESH",)
    RETURN_NAMES = ("mesh",)
    FUNCTION = "bake"
    CATEGORY = "Comfy3D/Preprocessor"

    def bake(self, mesh, texture_resolution=1024):
        from ..ops import texture as texture_ops
        if mesh.vc is None:
            return error_none(self.__class__.__name__,
                              "mesh has no vertex colors")
        vt, ft = texture_ops.auto_unwrap(mesh.v, mesh.f)
        albedo = texture_ops.bake_vertex_colors(
            mesh.v, mesh.f, vt, ft, mesh.vc,
            texture_size=texture_resolution)
        import dataclasses as _dc
        out = _dc.replace(mesh, vt=vt, ft=ft,
                          albedo=np.asarray(jnp.clip(albedo, 0, 1)))
        return (out,)


@register
class Fitting_Mesh_With_Multiview_Images:
    """reference nodes.py:1315 — DiffRastMesh textured-mesh fitting."""

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "mesh": ("MESH",),
            "reference_images": ("IMAGE",),
            "reference_masks": ("MASK",),
            "reference_orbit_camera_poses": ("ORBIT_CAMPOSES",),
            "reference_orbit_camera_fovy": ("FLOAT", {"default": 49.1}),
            "training_iterations": ("INT", {"default": 1024, "min": 1}),
            "batch_size": ("INT", {"default": 3, "min": 1}),
            "texture_learning_rate": ("FLOAT", {"default": 0.1}),
            "train_mesh_geometry": ("BOOLEAN", {"default": True}),
            "remesh_after_n_iteration": ("INT", {"default": 512,
                                                 "min": 128,
                                                 "max": 100000}),
            "texture_resolution": ("INT", {"default": 512}),
        }}

    RETURN_TYPES = ("MESH",)
    RETURN_NAMES = ("trained_mesh",)
    FUNCTION = "fit_mesh"
    CATEGORY = "Comfy3D/Algorithm"

    def fit_mesh(self, mesh, reference_images, reference_masks,
                 reference_orbit_camera_poses,
                 reference_orbit_camera_fovy, training_iterations=1024,
                 batch_size=3, texture_learning_rate=0.1,
                 train_mesh_geometry=True, remesh_after_n_iteration=512,
                 texture_resolution=512):
        from ..algorithms import diff_mesh
        from ..ops import texture as texture_ops

        imgs = np.asarray(reference_images, np.float32)
        masks = np.asarray(reference_masks, np.float32)
        if len(imgs) != len(reference_orbit_camera_poses):
            return error_none(
                self.__class__.__name__,
                f"{len(imgs)} images != "
                f"{len(reference_orbit_camera_poses)} poses")
        cams = _cams_from_poses(reference_orbit_camera_poses,
                                reference_orbit_camera_fovy,
                                imgs.shape[2], imgs.shape[1])
        if mesh.vt is None or mesh.ft is None:
            # reference auto-unwraps with xatlas (nodes.py:1372-ish);
            # here: box-projection unwrap
            vt, ft = texture_ops.auto_unwrap(mesh.v, mesh.f)
            import dataclasses as _dc
            mesh = _dc.replace(mesh, vt=vt, ft=ft)
        cfg = diff_mesh.DiffMeshConfig(
            iterations=training_iterations, batch_size=batch_size,
            lr_texture=texture_learning_rate,
            lr_verts=1e-3 if train_mesh_geometry else 0.0,
            remesh_every=(remesh_after_n_iteration
                          if train_mesh_geometry else 0),
            texture_size=texture_resolution)
        return (diff_mesh.fit(mesh, cams, imgs, masks, cfg),)


@register
class OrbitPoses_JK:
    """reference nodes.py:3432 — fixed orbit pose preset rows."""

    @classmethod
    def INPUT_TYPES(cls):
        from ..core.camera import ORBITPOSE_PRESETS
        return {"required": {
            "preset": (list(ORBITPOSE_PRESETS.keys()),
                       {"default": "FOUR_VIEWS"}),
            "orbit_radius": ("FLOAT", {"default": 1.75}),
        }}

    RETURN_TYPES = ("ORBIT_CAMPOSES",)
    RETURN_NAMES = ("orbit_camposes",)
    FUNCTION = "get_camposes"
    CATEGORY = "Comfy3D/Preprocessor"

    def get_camposes(self, preset="FOUR_VIEWS", orbit_radius=1.75):
        from ..core.camera import ORBITPOSE_PRESETS
        rows = [[orbit_radius, e, a, 0.0, 0.0, 0.0]
                for e, a in ORBITPOSE_PRESETS[preset]]
        return (rows,)
