"""3DGS → textured mesh conversion via NeRF distillation + marching tets.

Counterpart of the reference LGM converter `GSConverterNeRFMarchingCubes`
(`Gen_3D_Modules/LGM/nerf_marching_cubes_converter.py:26`: `fit_nerf:156`
renders the splats from orbit views and fits a hash-grid NeRF,
`fit_mesh:241` extracts the surface, `fit_mesh_uv:323` unwraps + bakes the
texture). Same staging here, on this framework's own kernels: gs_render →
algorithms.ngp → ops.tetra → ops.texture.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.camera import Camera
from ..core.gaussian import GaussianSplat
from ..core.mesh import Mesh
from ..ops import gs_render, tetra, texture as texture_ops
from . import ngp as ngp_mod


@dataclasses.dataclass(frozen=True)
class GSToMeshConfig:
    n_views: int = 24
    render_size: int = 256
    radius: float = 2.0
    fovy_deg: float = 49.1
    ngp_iters: int = 384
    grid_resolution: int = 192
    density_threshold: float = 10.0
    decimate_target: int = 100_000
    texture_size: int = 1024
    clean_min_component: float = 0.05
    bake_texture: bool = True


def convert(splat: GaussianSplat, cfg: GSToMeshConfig = GSToMeshConfig(),
            seed: int = 0, progress=None) -> Mesh:
    # 1. render the splats from an orbit (supervision set)
    n = cfg.n_views
    elevs = jnp.asarray(
        np.tile([-30.0, 0.0, 30.0], -(-n // 3))[:n], jnp.float32)
    azims = jnp.arange(n) * (360.0 / n)
    cams = Camera.from_orbit(elevs, azims, cfg.radius,
                             fovy_deg=cfg.fovy_deg,
                             width=cfg.render_size, height=cfg.render_size)
    out = gs_render.render(splat, cams, background=(1.0, 1.0, 1.0))
    images = out["image"]
    masks = (out["alpha"] > 0.5).astype(jnp.float32)

    # 2. distill into a hash-grid NeRF (fit_nerf role)
    ncfg = ngp_mod.NGPConfig(iterations=cfg.ngp_iters)
    params, occ = ngp_mod.fit(cams, images, masks, ncfg, seed=seed,
                              progress=progress)

    # 3. density grid → marching tets → clean/decimate (fit_mesh role)
    grid = ngp_mod.density_grid(params, ncfg, res=cfg.grid_resolution)
    mesh = tetra.extract_isosurface(np.asarray(grid),
                                    iso=cfg.density_threshold,
                                    max_tris=4_000_000)
    if mesh.num_faces == 0:
        return mesh
    from .. import native
    v, f = native.clean_mesh(mesh.v, mesh.f,
                             min_component_frac=cfg.clean_min_component)
    if len(f) > cfg.decimate_target:
        v, f = native.decimate_mesh(v, f, cfg.decimate_target)
    mesh = Mesh(v=v, f=f).auto_normal()

    # 4. unwrap + bake the NeRF color field (fit_mesh_uv role)
    if cfg.bake_texture and mesh.num_faces:
        vt, ft = texture_ops.auto_unwrap(mesh.v, mesh.f)
        field, _ = ngp_mod.make_field(params, ncfg)

        def color_fn(pts):
            dirs = -pts / jnp.maximum(
                jnp.linalg.norm(pts, axis=-1, keepdims=True), 1e-8)
            return field(pts, dirs)[1]

        albedo = texture_ops.bake_color_fn(
            mesh.v, mesh.f, vt, ft, color_fn,
            texture_size=cfg.texture_size)
        mesh.vt = vt
        mesh.ft = ft
        mesh.albedo = np.asarray(jnp.clip(albedo, 0, 1))
    return mesh
