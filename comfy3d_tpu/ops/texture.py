"""UV unwrapping + texture baking.

Covers three reference roles with one UV-space rasterization pipeline:
  * SF3D's Slang texture baker (`StableFast3D/sf3d/texture_baker.slang` +
    `texture_baker.py:10-38`): rasterize triangles in UV space, bake
    interpolated attributes per texel;
  * `mesh_utils.color_func_to_albedo` (`mesh_processer/mesh_utils.py:
    521-568`): UV rasterize → batched 3D color queries → uv_padding;
  * xatlas parametrization (`mesh_processer/mesh.py:496` auto_uv) —
    `auto_unwrap` delegates to the charted LSCM atlas
    (`ops.uv_atlas.atlas_unwrap`), falling back to the box-projection
    unwrap (SF3D `box_uv_unwrap.py` spirit) for very large meshes where
    the host-side chart segmentation would dominate.

The UV rasterization reuses `ops.rasterize` with an orthographic map of
the unit UV square to clip space — one rasterizer serves screen space and
texture space (SURVEY.md §7 k1 plan).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import image as image_ops
from . import rasterize as R


def auto_unwrap(v: np.ndarray, f: np.ndarray, padding: float = 0.01,
                max_atlas_faces: int = 300_000):
    """Charted LSCM atlas (xatlas role) with box-projection fallback."""
    f = np.asarray(f)
    if f.shape[0] <= max_atlas_faces:
        try:
            from .uv_atlas import atlas_unwrap
            return atlas_unwrap(np.asarray(v), f, padding=padding)
        except Exception as e:  # noqa: BLE001 — degenerate inputs
            print(f"[texture.auto_unwrap] atlas failed ({e}); "
                  "falling back to box unwrap")
    return box_unwrap(np.asarray(v), f, padding=padding)


# ------------------------------------------------------------------ #
# Box-projection UV unwrap (SF3D box_uv_unwrap role)
# ------------------------------------------------------------------ #
def box_unwrap(v: np.ndarray, f: np.ndarray, padding: float = 0.01):
    """Returns (vt [Nt, 2], ft [M, 3]): per-face UVs from the dominant
    normal axis, packed into a 3×2 chart grid. Face-varying (each face
    gets its own UV verts — welded per chart where positions coincide).
    """
    v = np.asarray(v, np.float32)
    f = np.asarray(f, np.int64)
    e1 = v[f[:, 1]] - v[f[:, 0]]
    e2 = v[f[:, 2]] - v[f[:, 0]]
    n = np.cross(e1, e2)
    axis = np.abs(n).argmax(axis=1)                       # 0=x,1=y,2=z
    sign = np.take_along_axis(n, axis[:, None], 1)[:, 0] >= 0
    chart = axis * 2 + sign.astype(np.int64)              # 0..5

    # project: drop the dominant axis
    proj_axes = {0: (1, 2), 1: (0, 2), 2: (0, 1)}
    lo, hi = v.min(0), v.max(0)
    extent = np.maximum(hi - lo, 1e-8)

    vt_rows = []
    ft = np.zeros_like(f, dtype=np.int32)
    cell_w, cell_h = 1.0 / 3.0, 1.0 / 2.0
    weld: dict = {}
    for fi in range(len(f)):
        c = int(chart[fi])
        a0, a1 = proj_axes[c // 2]
        cx, cy = c % 3, c // 3
        for k in range(3):
            vid = int(f[fi, k])
            key = (c, vid)
            if key not in weld:
                u = (v[vid, a0] - lo[a0]) / extent[a0]
                w = (v[vid, a1] - lo[a1]) / extent[a1]
                u = cx * cell_w + (padding + u * (1 - 2 * padding)) * cell_w
                w = cy * cell_h + (padding + w * (1 - 2 * padding)) * cell_h
                weld[key] = len(vt_rows)
                vt_rows.append((u, w))
            ft[fi, k] = weld[key]
    return np.asarray(vt_rows, np.float32), ft


# ------------------------------------------------------------------ #
# UV-space rasterization + baking
# ------------------------------------------------------------------ #
def _uv_clip(vt: jnp.ndarray) -> jnp.ndarray:
    """UV [0,1]² → clip coords covering the texture image. V flips so
    texture row 0 = v=0 after the rasterizer's y-down screen mapping is
    undone by the caller storing row 0 at the bottom (core.io v-up
    convention)."""
    x = vt[:, 0] * 2.0 - 1.0
    y = vt[:, 1] * 2.0 - 1.0
    z = jnp.zeros_like(x)
    w = jnp.ones_like(x)
    return jnp.stack([x, y, z, w], -1)


@partial(jax.jit, static_argnames=("texture_size", "method"))
def rasterize_uv(vt: jnp.ndarray, ft: jnp.ndarray, texture_size: int,
                 face_valid=None, method: str = "binned") -> R.RasterOut:
    """Rasterize the UV layout into texture space: per-texel
    (face_id, barycentrics). The SF3D texture_baker.slang `rast` pass."""
    clip = _uv_clip(vt)
    screen_xy, w_view, _ = R.clip_to_screen(clip, texture_size,
                                            texture_size)
    if face_valid is None:
        face_valid = jnp.ones((ft.shape[0],), bool)
    if method == "binned":
        return R.rasterize_binned(screen_xy, w_view, ft, face_valid,
                                  texture_size, texture_size)
    return R.rasterize_bruteforce(screen_xy, w_view, ft, face_valid,
                                  texture_size, texture_size)


def bake_attributes(rast: R.RasterOut, attr: jnp.ndarray,
                    faces: jnp.ndarray) -> jnp.ndarray:
    """Interpolate per-vertex attributes at every covered texel
    (texture_baker.slang `bake` pass). attr indexed by `faces` (use
    geometric faces with the UV rasterization's face ids)."""
    return R.interpolate(attr, rast, faces)


def bake_vertex_colors(v, f, vt, ft, colors, texture_size: int = 1024,
                       dilate_iters: int = 16, method: str = "binned"):
    """Bake per-vertex colors into an albedo texture + dilation.
    Returns [S, S, 3] float32, v-up row order (core.io convention)."""
    rast = rasterize_uv(jnp.asarray(vt), jnp.asarray(ft), texture_size,
                        method=method)
    tex = bake_attributes(rast, jnp.asarray(colors), jnp.asarray(f))
    tex = image_ops.dilate_texture(tex, rast.mask, iterations=dilate_iters)
    # rasterizer y-down → flip to v-up storage
    return tex[::-1]


def bake_color_fn(v, f, vt, ft, color_fn, texture_size: int = 1024,
                  dilate_iters: int = 16, chunk: int = 262144,
                  method: str = "binned"):
    """Bake a 3D color field: rasterize UV → interpolate 3D positions →
    query `color_fn(pts [M,3]) -> [M,3]` in chunks → dilate.
    Counterpart of `color_func_to_albedo` (mesh_utils.py:521-568)."""
    rast = rasterize_uv(jnp.asarray(vt), jnp.asarray(ft), texture_size,
                        method=method)
    pos = R.interpolate(jnp.asarray(v), rast, jnp.asarray(f))
    flat = pos.reshape(-1, 3)
    outs = []
    for i in range(0, flat.shape[0], chunk):
        outs.append(color_fn(flat[i:i + chunk]))
    tex = jnp.concatenate(outs).reshape(texture_size, texture_size, 3)
    tex = tex * rast.mask[..., None]
    tex = image_ops.dilate_texture(tex, rast.mask, iterations=dilate_iters)
    return tex[::-1]
