"""InstantMesh pipeline: posed views → triplanes → textured mesh.

Counterpart of the reference node path
(`nodes.py:2476-2585`: Load_InstantMesh_Reconstruction_Model +
InstantMesh_Reconstruction_Model → `lrm_mesh.py` forward_planes/
extract_mesh) and the camera-conditioning helper
(`utils/camera_util.py:93-116` oribt_camera_poses_to_input_cameras).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ...ops import tetra
from .model import InstantMesh, InstantMeshConfig


def orbit_poses_to_input_cameras(azimuths, elevations, radius=4.0,
                                 fov_deg=30.0):
    """Reference camera conditioning: z-up spherical c2w (first 3 rows
    flattened, 12) + normalized intrinsics (fx fy cx cy, 4) → [N, 16]."""
    az = np.deg2rad((np.asarray(azimuths, np.float64) + 360.0) % 360.0)
    el = np.deg2rad(-np.asarray(elevations, np.float64))
    r = np.broadcast_to(np.asarray(radius, np.float64), az.shape)
    xs = r * np.cos(el) * np.cos(az)
    ys = r * np.cos(el) * np.sin(az)
    zs = r * np.sin(el)
    campos = np.stack([xs, ys, zs], -1)

    up = np.array([0.0, 0.0, 1.0])
    z_axis = campos / np.linalg.norm(campos, axis=-1, keepdims=True)
    x_axis = np.cross(np.broadcast_to(up, z_axis.shape), z_axis)
    x_axis /= np.linalg.norm(x_axis, axis=-1, keepdims=True)
    y_axis = np.cross(z_axis, x_axis)
    c2w = np.concatenate([np.stack([x_axis, y_axis, z_axis], -1),
                          campos[..., None]], -1)        # [N, 3, 4]
    extr = c2w.reshape(len(az), 12)
    f = 0.5 / np.tan(np.deg2rad(fov_deg) * 0.5)
    intr = np.tile(np.array([f, f, 0.5, 0.5]), (len(az), 1))
    return np.concatenate([extr, intr], -1).astype(np.float32)


class InstantMeshPipeline:
    def __init__(self, params, cfg: InstantMeshConfig = InstantMeshConfig()):
        self.cfg = cfg
        self.model = InstantMesh(cfg)
        self.params = params
        self._planes = jax.jit(
            lambda p, imgs, cams: self.model.apply({"params": p}, imgs,
                                                   cams))

    @classmethod
    def init_random(cls, key=None,
                    cfg: InstantMeshConfig = InstantMeshConfig(),
                    image_size: int = 320) -> "InstantMeshPipeline":
        key = key if key is not None else jax.random.PRNGKey(0)
        model = InstantMesh(cfg)

        def init_all(mdl, images, cameras, pts):
            planes = mdl(images, cameras)
            sdf, deform = mdl.query_geometry(planes[0], pts)
            rgb = mdl.query_color(planes[0], pts)
            return sdf, deform, rgb

        params = model.init(
            key, jnp.zeros((1, 2, image_size, image_size, 3)),
            jnp.zeros((1, 2, 16)), jnp.zeros((4, 3)),
            method=init_all)["params"]
        return cls(params, cfg)

    def forward_planes(self, images, cameras):
        """images [B, N, H, W, 3] in [0,1]; cameras [B, N, 16]."""
        return self._planes(self.params, jnp.asarray(images, jnp.float32),
                            jnp.asarray(cameras, jnp.float32))

    def extract_mesh(self, planes, resolution: int | None = None,
                     max_tris: int = 2_000_000, with_color: bool = True,
                     chunk: int = 262144):
        """SDF+deformation grid → marching-tets mesh (+ vertex colors).
        Counterpart of lrm_mesh.py:340 extract_mesh."""
        c = self.cfg
        res = resolution or (c.grid_res + 1)
        verts, tets_arr = tetra.grid_tets(res)
        verts = verts * (c.grid_scale * 0.5)

        query = jax.jit(lambda pts: self.model.apply(
            {"params": self.params}, planes, pts,
            method=InstantMesh.query_geometry))
        sdfs, deforms = [], []
        for i in range(0, verts.shape[0], chunk):
            s, d = query(jnp.asarray(verts[i:i + chunk]))
            sdfs.append(s)
            deforms.append(d)
        sdf = jnp.concatenate(sdfs)
        deform = jnp.concatenate(deforms)
        v_def = jnp.asarray(verts) + deform

        # reference SDF convention: positive inside (lrm_mesh.py:133-134
        # forces the grid center positive / boundary negative), matching
        # marching_tets_diff's inside-positive contract directly.
        # Device-side chunked sweep (ops.tetra.sweep_tets): one-shot
        # [T,4,3] temporaries OOM v5e at 128³, and per-chunk host
        # transfers dominated wall-clock over the device tunnel
        tris, _ = tetra.sweep_tets(v_def, sdf, tets_arr,
                                   max_tris=max_tris)
        v, f = tetra.weld(tris, tris.shape[0])
        from ...core.mesh import Mesh
        mesh = Mesh(v=v, f=f)
        if with_color and mesh.num_vertices:
            qc = jax.jit(lambda pts: self.model.apply(
                {"params": self.params}, planes, pts,
                method=InstantMesh.query_color))
            cols = []
            mv = jnp.asarray(mesh.v)
            for i in range(0, mv.shape[0], chunk):
                cols.append(qc(mv[i:i + chunk]))
            mesh.vc = np.clip(np.asarray(jnp.concatenate(cols)), 0, 1)
        return mesh.auto_normal()
