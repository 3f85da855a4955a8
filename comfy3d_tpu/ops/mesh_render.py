"""High-level mesh rendering on top of ops.rasterize.

Counterpart of the reference mesh renderers
(`MVs_Algorithms/DiffRastMesh/diff_mesh_renderer.py:38-158` and the orbit
renderer node `nodes.py:1011`): produces RGB / alpha / depth / world-normal /
view-cos buffers for a batch of cameras. Batched over views with vmap — the
view axis is the natural shard axis under a device mesh (SURVEY.md §2.7).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.camera import Camera
from . import rasterize as R


def render_mesh(v: jnp.ndarray, faces: jnp.ndarray, camera: Camera,
                vn: Optional[jnp.ndarray] = None,
                vc: Optional[jnp.ndarray] = None,
                vt: Optional[jnp.ndarray] = None,
                ft: Optional[jnp.ndarray] = None,
                albedo: Optional[jnp.ndarray] = None,
                face_valid: Optional[jnp.ndarray] = None,
                background: float | jnp.ndarray = 1.0,
                method: str = "binned",
                ssaa: int = 1):
    """Render one or a batch of views.

    Returns dict(image [.., H, W, 3], alpha [.., H, W], depth, normal,
    viewcos). Color source precedence: albedo texture (needs vt/ft) →
    vertex colors → flat 0.5 gray. Differentiable wrt v, vc, albedo.
    """
    if camera.batch_shape:
        fn = partial(_render_single, v, faces, vn, vc, vt, ft, albedo,
                     face_valid, background, camera.width, camera.height,
                     camera.near, camera.far, method, ssaa)
        return jax.vmap(fn)(camera.view_proj, camera.campos)
    return _render_single(v, faces, vn, vc, vt, ft, albedo, face_valid,
                          background, camera.width, camera.height,
                          camera.near, camera.far, method, ssaa,
                          camera.view_proj, camera.campos)


def _render_single(v, faces, vn, vc, vt, ft, albedo, face_valid, background,
                   width, height, near, far, method, ssaa, mvp, campos):
    rh, rw = height * ssaa, width * ssaa
    rast = R.rasterize(v, faces, mvp, rh, rw, face_valid=face_valid,
                       method=method)
    bary = R.recompute_barycentrics(v, mvp, faces, rast)
    alpha = rast.mask

    # geometry buffers
    pos = R.interpolate(v, rast, faces, bary)
    if vn is None:
        vn_ = _vertex_normals(v, faces)
    else:
        vn_ = vn
    normal = R.interpolate(vn_, rast, faces, bary)
    normal = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-8)
    view_dir = campos[None, None, :] - pos
    view_dir = view_dir / jnp.maximum(
        jnp.linalg.norm(view_dir, axis=-1, keepdims=True), 1e-8)
    viewcos = jnp.abs((normal * view_dir).sum(-1)) * alpha

    # color
    if albedo is not None and vt is not None and ft is not None:
        # face-varying UVs: interpolate vt through the uv-face indices
        uv_rast = R.RasterOut(face_id=rast.face_id, bary=rast.bary,
                              depth=rast.depth, mask=rast.mask)
        uv = R.interpolate(vt, uv_rast, ft, bary)
        color = R.texture_sample(albedo, uv)
    elif vc is not None:
        color = R.interpolate(vc, rast, faces, bary)
    else:
        color = jnp.full(pos.shape, 0.5)

    bg = jnp.asarray(background, color.dtype)
    image = color * alpha[..., None] + bg * (1.0 - alpha[..., None])
    depth = rast.depth

    if ssaa > 1:
        down = lambda x: _avg_pool(x, ssaa)
        image, alpha, depth = down(image), down(alpha), down(depth)
        normal, viewcos = down(normal), down(viewcos)
    return {"image": image, "alpha": alpha, "depth": depth,
            "normal": normal, "viewcos": viewcos}


def _avg_pool(x, k):
    squeeze = x.ndim == 2
    if squeeze:
        x = x[..., None]
    h, w, c = x.shape
    x = x.reshape(h // k, k, w // k, k, c).mean((1, 3))
    return x[..., 0] if squeeze else x


def _vertex_normals(v, faces):
    """Area-weighted vertex normals, jnp (jit/grad-safe segment scatter)."""
    e1 = v[faces[:, 1]] - v[faces[:, 0]]
    e2 = v[faces[:, 2]] - v[faces[:, 0]]
    fn = jnp.cross(e1, e2)
    vn = jnp.zeros_like(v)
    for k in range(3):
        vn = vn.at[faces[:, k]].add(fn)
    return vn / jnp.maximum(jnp.linalg.norm(vn, axis=-1, keepdims=True),
                            1e-12)


vertex_normals = _vertex_normals
