"""Multi-view color projection onto a mesh.

One utility for three reference roles:
  * Unique3D `multiview_color_projection` (`scripts/project_mesh.py`,
    node `ExplicitTarget_Color_Projection` nodes.py:3045),
  * Hunyuan texgen `bake_from_multiview` (view-cos-weighted back-
    projection, `hy3dpaint/textureGenPipeline.py:174-181`),
  * MV_Adapter texture projection (`mvadapter/utils/mesh_utils/warp.py`).

Per view: rasterize a depth buffer, project every vertex, depth-test for
visibility, weight by view-cosine^power, bilinearly sample the image.
Accumulated per-vertex colors + confidence; unseen vertices are filled
by the native vertex-inpaint diffusion (mesh_inpaint_processor role).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.camera import Camera
from ..core.mesh import Mesh
from ..ops import rasterize as R


def _sample_bilinear(img, xy):
    """img [H, W, C]; xy [N, 2] pixel coords → [N, C]."""
    h, w = img.shape[0], img.shape[1]
    x = jnp.clip(xy[:, 0] - 0.5, 0.0, w - 1.0)
    y = jnp.clip(xy[:, 1] - 0.5, 0.0, h - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    return ((1 - fx) * (1 - fy) * img[y0, x0]
            + fx * (1 - fy) * img[y0, x1]
            + (1 - fx) * fy * img[y1, x0]
            + fx * fy * img[y1, x1])


def project_colors(mesh: Mesh, images, cameras: Camera,
                   cos_power: float = 4.0, depth_eps: float = 2e-3,
                   raster_size: int | None = None, view_weights=None):
    """images [V, H, W, 3]; cameras batched [V] → (vertex colors [N, 3],
    confidence [N]). view_weights: optional per-view scalars (Hunyuan
    paint's candidate_view_weights) multiplying each view's cos^p
    confidence."""
    images = jnp.asarray(images, jnp.float32)
    v = jnp.asarray(mesh.v, jnp.float32)
    f = jnp.asarray(mesh.f, jnp.int32)
    if mesh.vn is None:
        mesh = mesh.auto_normal()
    vn = jnp.asarray(mesh.vn, jnp.float32)
    n_views = images.shape[0]
    h, w = int(images.shape[1]), int(images.shape[2])
    rh = raster_size or h
    rw = raster_size or w

    acc = jnp.zeros((v.shape[0], 3))
    wacc = jnp.zeros((v.shape[0],))
    for i in range(n_views):
        cam = jax.tree.map(lambda a: a[i] if a.ndim else a,
                           cameras) if cameras.batch_shape else cameras
        mvp = cam.view_proj
        rast = R.rasterize(v, f, mvp, rh, rw)
        v_clip = R.project_vertices(v, mvp)
        xy, wv, valid = R.clip_to_screen(v_clip, rh, rw)
        # depth test: vertex view depth vs z-buffer at its pixel
        zbuf = _sample_nearest(rast.depth, xy, rh, rw)
        visible = valid & (wv <= zbuf * (1.0 + depth_eps) + 1e-4) \
            & (zbuf > 0)
        # view-cosine weight
        to_cam = cam.campos[None, :] - v
        to_cam = to_cam / jnp.maximum(
            jnp.linalg.norm(to_cam, axis=-1, keepdims=True), 1e-8)
        cosv = jnp.maximum((to_cam * vn).sum(-1), 0.0)
        weight = jnp.where(visible, cosv ** cos_power, 0.0)
        if view_weights is not None:
            weight = weight * float(view_weights[i])
        xy_img = xy * jnp.asarray([w / rw, h / rh])
        cols = _sample_bilinear(images[i], xy_img)
        acc = acc + cols * weight[:, None]
        wacc = wacc + weight
    colors = acc / jnp.maximum(wacc, 1e-8)[:, None]
    return colors, wacc


def _sample_nearest(depth, xy, h, w):
    x = jnp.clip(xy[:, 0].astype(jnp.int32), 0, w - 1)
    y = jnp.clip(xy[:, 1].astype(jnp.int32), 0, h - 1)
    return depth[y, x]


def project_and_inpaint(mesh: Mesh, images, cameras: Camera,
                        cos_power: float = 4.0,
                        confidence_min: float = 1e-3,
                        view_weights=None) -> Mesh:
    """Vertex colors from views; unseen vertices inpainted over the mesh
    graph (native mesh_inpaint_processor role)."""
    colors, conf = project_colors(mesh, images, cameras, cos_power,
                                  view_weights=view_weights)
    colors = np.asarray(colors, np.float32)
    seen = np.asarray(conf) > confidence_min
    try:
        from .. import native
        colors, _ = native.inpaint_vertex_colors(
            colors, seen.astype(np.uint8), np.asarray(mesh.f, np.int32))
    except Exception:
        if seen.any():
            colors[~seen] = colors[seen].mean(axis=0)
    mesh.vc = np.clip(colors, 0.0, 1.0)
    return mesh


def bake_projection(mesh: Mesh, images, cameras: Camera,
                    texture_size: int = 1024,
                    cos_power: float = 4.0, view_weights=None) -> Mesh:
    """Project views → vertex colors → UV texture bake (+ dilation).
    Produces an albedo texture on the mesh (auto-unwrapping if needed)."""
    from ..ops import texture as T

    mesh = project_and_inpaint(mesh, images, cameras, cos_power,
                               view_weights=view_weights)
    if mesh.vt is None or mesh.ft is None:
        vt, ft = T.auto_unwrap(np.asarray(mesh.v), np.asarray(mesh.f))
        mesh.vt, mesh.ft = vt, ft
    albedo = T.bake_vertex_colors(
        jnp.asarray(mesh.v), jnp.asarray(mesh.f), jnp.asarray(mesh.vt),
        jnp.asarray(mesh.ft), jnp.asarray(mesh.vc),
        texture_size=texture_size)
    mesh.albedo = np.asarray(albedo)
    return mesh
