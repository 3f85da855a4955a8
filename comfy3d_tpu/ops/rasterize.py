"""Differentiable triangle rasterization (the nvdiffrast role, TPU-native).

Replaces every nvdiffrast call site in the reference
(`MVs_Algorithms/DiffRastMesh/diff_mesh_renderer.py:46-49`,
`MVs_Algorithms/FlexiCubes/flexicubes_renderer.py:10-74`,
`Gen_3D_Modules/InstantMesh/models/geometry/render/neural_render.py`,
Hunyuan custom_rasterizer, SF3D texture_baker.slang) with one XLA/Pallas
pipeline:

  rasterize  : discrete visibility — per-pixel (face_id, barycentrics,
               depth, mask). Two execution paths share the contract:
               a brute-force chunked scan (any face size; the correctness
               fallback and CPU test path) and a tile-binned path built on
               `ops.binning` (the production path; same data layout the
               Pallas per-tile kernel consumes).
  interpolate: perspective-correct attribute interpolation. Differentiable
               wrt vertices and attributes: barycentrics are *recomputed*
               differentiably from the selected face ids, so gradients match
               nvdiffrast's (visibility discontinuities excluded, as there).
  texture_sample: bilinear texture lookup, differentiable.
  build_mip_chain / uv_mip_level / texture_sample_mip: dr.texture's
               'linear-mipmap-linear' path (auto mips + uv-derivative LOD).
  soft_silhouette: SoftRas-style sigmoid-of-distance coverage for visibility
               gradients (the role of nvdiffrast's antialias in mask losses).
  antialias: silhouette-edge blend with vertex-position gradients
               (dr.antialias role; coverage from the soft silhouette).

Conventions: clip space from `core.camera` (OpenGL); screen x right, y DOWN
(image row 0 = top); face_id -1 = background; barycentrics are screen-space
(w0, w1, w2) wrt the face's vertex order, perspective-corrected inside
`interpolate`.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from . import binning
from .binning import TILE


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RasterOut:
    face_id: jnp.ndarray    # [H, W] int32, -1 = background
    bary: jnp.ndarray       # [H, W, 3] screen-space barycentrics
    depth: jnp.ndarray      # [H, W] view-space depth (0 at background)
    mask: jnp.ndarray       # [H, W] float32 coverage {0, 1}


# ------------------------------------------------------------------ #
# Vertex processing
# ------------------------------------------------------------------ #
def project_vertices(v: jnp.ndarray, mvp: jnp.ndarray) -> jnp.ndarray:
    """[V, 3] world/object positions → [V, 4] clip coords."""
    vh = jnp.concatenate([v, jnp.ones_like(v[:, :1])], axis=-1)
    return vh @ mvp.T


def clip_to_screen(v_clip: jnp.ndarray, height: int, width: int):
    """Clip → (screen_xy [V,2], w_view [V], valid [V]).

    w (clip w) equals view-space distance along the camera axis for a
    standard perspective projection; it is the z-test key.
    """
    w = v_clip[:, 3]
    safe_w = jnp.where(jnp.abs(w) < 1e-8, 1e-8, w)
    ndc = v_clip[:, :3] / safe_w[:, None]
    sx = (ndc[:, 0] * 0.5 + 0.5) * width
    sy = (0.5 - ndc[:, 1] * 0.5) * height
    valid = w > 1e-8  # behind-camera vertices poison their faces
    return jnp.stack([sx, sy], -1), w, valid


def _edge(p, a, b):
    """Edge function: cross((b-a), (p-a)). >0 left of a→b (y-down flips)."""
    return ((b[..., 0] - a[..., 0]) * (p[..., 1] - a[..., 1])
            - (b[..., 1] - a[..., 1]) * (p[..., 0] - a[..., 0]))


def _face_corners(screen_xy, w_view, faces):
    p0 = screen_xy[faces[:, 0]]
    p1 = screen_xy[faces[:, 1]]
    p2 = screen_xy[faces[:, 2]]
    w0 = w_view[faces[:, 0]]
    w1 = w_view[faces[:, 1]]
    w2 = w_view[faces[:, 2]]
    return p0, p1, p2, w0, w1, w2


def _coverage(px, p0, p1, p2, w0, w1, w2, eps=1e-9):
    """Inside test + screen bary + per-pixel view depth.

    px: [..., 2] pixel centers; p*: [...] broadcastable triangle corners.
    Returns (inside, bary0..2, depth).
    """
    e12 = _edge(px, p1, p2)     # weight of v0
    e20 = _edge(px, p2, p0)     # weight of v1
    e01 = _edge(px, p0, p1)     # weight of v2
    area = _edge(p2, p0, p1)
    inside = (jnp.abs(area) > eps) & (
        ((e12 >= 0) & (e20 >= 0) & (e01 >= 0))
        | ((e12 <= 0) & (e20 <= 0) & (e01 <= 0)))
    # guard the division *input*, not just the output: with area exactly 0
    # (degenerate/padding faces) the untaken 1/area branch is inf and its
    # zero cotangent becomes NaN under autodiff (0·inf)
    area_safe = jnp.where(jnp.abs(area) > eps, area, 1.0)
    inv_area = jnp.where(jnp.abs(area) > eps, 1.0 / area_safe, 0.0)
    b0 = e12 * inv_area
    b1 = e20 * inv_area
    b2 = e01 * inv_area
    # screen-linear interpolation of 1/w is perspective-correct
    inv_w = b0 / jnp.maximum(w0, 1e-8) + b1 / jnp.maximum(w1, 1e-8) \
        + b2 / jnp.maximum(w2, 1e-8)
    depth = 1.0 / jnp.maximum(inv_w, 1e-8)
    return inside, b0, b1, b2, depth


# ------------------------------------------------------------------ #
# Path A: brute-force chunked scan (any face size; CPU test path)
# ------------------------------------------------------------------ #
@partial(jax.jit, static_argnames=("height", "width", "chunk"))
def rasterize_bruteforce(screen_xy, w_view, faces, face_valid,
                         height: int, width: int, chunk: int = 32
                         ) -> RasterOut:
    nf = faces.shape[0]
    pad = (-nf) % chunk
    if pad:
        faces = jnp.concatenate(
            [faces, jnp.zeros((pad, 3), faces.dtype)], 0)
        face_valid = jnp.concatenate(
            [face_valid, jnp.zeros((pad,), bool)], 0)
    nchunks = faces.shape[0] // chunk

    ys = jnp.arange(height, dtype=jnp.float32) + 0.5
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    px = jnp.stack([gx, gy], -1)[:, :, None, :]      # [H, W, 1, 2]

    init = (jnp.full((height, width), jnp.inf, jnp.float32),
            jnp.full((height, width), -1, jnp.int32),
            jnp.zeros((height, width, 3), jnp.float32))

    f_chunks = faces.reshape(nchunks, chunk, 3)
    v_chunks = face_valid.reshape(nchunks, chunk)

    def step(carry, inp):
        best_z, best_f, best_b = carry
        fc, vc, cid = inp
        p0, p1, p2, w0, w1, w2 = _face_corners(screen_xy, w_view, fc)
        wv = vc & (w0 > 1e-8) & (w1 > 1e-8) & (w2 > 1e-8)
        inside, b0, b1, b2, depth = _coverage(
            px, p0[None, None], p1[None, None], p2[None, None],
            w0[None, None], w1[None, None], w2[None, None])
        depth = jnp.where(inside & wv[None, None], depth, jnp.inf)
        k = jnp.argmin(depth, axis=-1)                       # [H, W]
        zmin = jnp.take_along_axis(depth, k[..., None], -1)[..., 0]
        better = zmin < best_z
        take = lambda a: jnp.take_along_axis(a, k[..., None], -1)[..., 0]
        new_f = cid * chunk + k.astype(jnp.int32)
        best_f = jnp.where(better, new_f, best_f)
        best_b = jnp.where(better[..., None],
                           jnp.stack([take(b0), take(b1), take(b2)], -1),
                           best_b)
        best_z = jnp.minimum(best_z, zmin)
        return (best_z, best_f, best_b), None

    ids = jnp.arange(nchunks, dtype=jnp.int32)
    (best_z, best_f, best_b), _ = jax.lax.scan(
        step, init, (f_chunks, v_chunks, ids))
    mask = (best_f >= 0).astype(jnp.float32)
    depth = jnp.where(best_f >= 0, best_z, 0.0)
    return RasterOut(face_id=best_f, bary=best_b, depth=depth, mask=mask)


# ------------------------------------------------------------------ #
# Path B: tile-binned (production path)
# ------------------------------------------------------------------ #
@partial(jax.jit, static_argnames=("height", "width", "max_per_tile",
                                   "max_tiles_per_prim", "chunk"))
def rasterize_binned(screen_xy, w_view, faces, face_valid,
                     height: int, width: int,
                     max_per_tile: int = 256,
                     max_tiles_per_prim: int = 64,
                     chunk: int = 8) -> RasterOut:
    nf = faces.shape[0]
    grid_h, grid_w = binning.num_tiles(height, width)

    p0, p1, p2, w0, w1, w2 = _face_corners(screen_xy, w_view, faces)
    active = face_valid & (w0 > 1e-8) & (w1 > 1e-8) & (w2 > 1e-8)
    bb_min = jnp.minimum(jnp.minimum(p0, p1), p2)
    bb_max = jnp.maximum(jnp.maximum(p0, p1), p2)
    # z-test is order-independent: no depth pre-sort needed
    bins = binning.bin_primitives(
        bb_min, bb_max, active, grid_h, grid_w,
        max_per_tile=max_per_tile, max_tiles_per_prim=max_tiles_per_prim)

    centers = binning.tile_pixel_centers(grid_h, grid_w)  # [T, 256, 2]
    npix = TILE * TILE
    ntiles = grid_h * grid_w
    nsteps = max_per_tile // chunk

    fi = bins.prim_idx.reshape(ntiles, nsteps, chunk)
    fv = bins.valid.reshape(ntiles, nsteps, chunk)

    def tile_scan(carry, inp):
        best_z, best_f, best_b = carry        # [T, 256], ..., [T, 256, 3]
        fidx, fval = inp                      # [T, chunk]
        fc = faces[fidx]                      # [T, chunk, 3]
        tp0 = screen_xy[fc[..., 0]][:, None]  # [T, 1, chunk, 2]
        tp1 = screen_xy[fc[..., 1]][:, None]
        tp2 = screen_xy[fc[..., 2]][:, None]
        tw0 = w_view[fc[..., 0]][:, None]
        tw1 = w_view[fc[..., 1]][:, None]
        tw2 = w_view[fc[..., 2]][:, None]
        pxc = centers[:, :, None, :]          # [T, 256, 1, 2]
        inside, b0, b1, b2, depth = _coverage(pxc, tp0, tp1, tp2,
                                              tw0, tw1, tw2)
        depth = jnp.where(inside & fval[:, None, :], depth, jnp.inf)
        k = jnp.argmin(depth, axis=-1)                     # [T, 256]
        zc = jnp.take_along_axis(depth, k[..., None], -1)[..., 0]
        better = zc < best_z
        take = lambda a: jnp.take_along_axis(a, k[..., None], -1)[..., 0]
        fsel = jnp.take_along_axis(fidx[:, None, :].repeat(npix, 1),
                                   k[..., None], -1)[..., 0]
        best_f = jnp.where(better, fsel, best_f)
        best_b = jnp.where(better[..., None],
                           jnp.stack([take(b0), take(b1), take(b2)], -1),
                           best_b)
        best_z = jnp.minimum(best_z, zc)
        return (best_z, best_f, best_b), None

    init = (jnp.full((ntiles, npix), jnp.inf, jnp.float32),
            jnp.full((ntiles, npix), -1, jnp.int32),
            jnp.zeros((ntiles, npix, 3), jnp.float32))
    (bz, bf, bb), _ = jax.lax.scan(
        tile_scan, init,
        (fi.transpose(1, 0, 2), fv.transpose(1, 0, 2)))

    to_img = lambda a: binning.tiles_to_image(a, grid_h, grid_w,
                                              height, width)
    face_id = to_img(bf).astype(jnp.int32)
    bary = to_img(bb)
    depth = jnp.where(face_id >= 0, to_img(bz), 0.0)
    mask = (face_id >= 0).astype(jnp.float32)
    return RasterOut(face_id=face_id, bary=bary, depth=depth, mask=mask)


# ------------------------------------------------------------------ #
# Public entry
# ------------------------------------------------------------------ #
def rasterize(v: jnp.ndarray, faces: jnp.ndarray, mvp: jnp.ndarray,
              height: int, width: int, face_valid=None,
              method: str = "binned", **kw) -> RasterOut:
    """World-space verts + faces + mvp → RasterOut. Non-differentiable
    (visibility is discrete); pair with `interpolate` for gradients."""
    v = jax.lax.stop_gradient(v)
    v_clip = project_vertices(v, mvp)
    screen_xy, w_view, _ = clip_to_screen(v_clip, height, width)
    if face_valid is None:
        face_valid = jnp.ones((faces.shape[0],), bool)
    if method == "binned":
        return rasterize_binned(screen_xy, w_view, faces, face_valid,
                                height, width, **kw)
    return rasterize_bruteforce(screen_xy, w_view, faces, face_valid,
                                height, width, **kw)


# ------------------------------------------------------------------ #
# Differentiable interpolation
# ------------------------------------------------------------------ #
def recompute_barycentrics(v: jnp.ndarray, mvp: jnp.ndarray,
                           faces: jnp.ndarray, rast: RasterOut,
                           perspective: bool = True) -> jnp.ndarray:
    """Differentiably recompute barycentrics at the rasterized face ids.

    This is the gradient path wrt vertex positions: face selection stays
    fixed (stop-gradient), the barycentric weights re-derive from the live
    vertices. Matches nvdiffrast's rasterize+interpolate gradient contract.
    Returns [H, W, 3] perspective-corrected weights (0 at background).
    """
    h, w = rast.face_id.shape
    fid = jnp.maximum(rast.face_id, 0)
    v_clip = project_vertices(v, mvp)
    screen_xy, w_view, _ = clip_to_screen(v_clip, h, w)
    fv = faces[fid]                          # [H, W, 3]
    p0 = screen_xy[fv[..., 0]]
    p1 = screen_xy[fv[..., 1]]
    p2 = screen_xy[fv[..., 2]]
    ys = jnp.arange(h, dtype=jnp.float32) + 0.5
    xs = jnp.arange(w, dtype=jnp.float32) + 0.5
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    px = jnp.stack([gx, gy], -1)
    e12 = _edge(px, p1, p2)
    e20 = _edge(px, p2, p0)
    e01 = _edge(px, p0, p1)
    area = _edge(p2, p0, p1)
    # same 0·inf NaN guard as _coverage: divide by a safe area
    area_safe = jnp.where(jnp.abs(area) > 1e-9, area, 1.0)
    inv_area = jnp.where(jnp.abs(area) > 1e-9, 1.0 / area_safe, 0.0)
    b = jnp.stack([e12, e20, e01], -1) * inv_area[..., None]
    if perspective:
        wv = jnp.stack([w_view[fv[..., 0]], w_view[fv[..., 1]],
                        w_view[fv[..., 2]]], -1)
        bw = b / jnp.maximum(wv, 1e-8)
        b = bw / jnp.maximum(bw.sum(-1, keepdims=True), 1e-12)
    return b * rast.mask[..., None]


def interpolate(attr: jnp.ndarray, rast: RasterOut, faces: jnp.ndarray,
                bary: jnp.ndarray | None = None) -> jnp.ndarray:
    """Perspective-correct per-pixel attribute interpolation.

    attr: [V, C] vertex attributes (use uv-face indices + vt attrs for
    face-varying UVs). bary: optionally the differentiable weights from
    `recompute_barycentrics`; defaults to the rasterizer's stored weights
    (screen-space, differentiable wrt `attr` only).
    """
    fid = jnp.maximum(rast.face_id, 0)
    fv = faces[fid]                          # [H, W, 3]
    if bary is None:
        bary = rast.bary * rast.mask[..., None]
    a0 = attr[fv[..., 0]]
    a1 = attr[fv[..., 1]]
    a2 = attr[fv[..., 2]]
    return (bary[..., 0:1] * a0 + bary[..., 1:2] * a1
            + bary[..., 2:3] * a2)


# ------------------------------------------------------------------ #
# Texture sampling (the dr.texture role)
# ------------------------------------------------------------------ #
def texture_sample(tex: jnp.ndarray, uv: jnp.ndarray,
                   mode: str = "wrap") -> jnp.ndarray:
    """Bilinear texture lookup. tex [Ht, Wt, C]; uv [..., 2] in [0,1]
    (u right, v up — row 0 of tex is v=0, matching core.io conventions)."""
    ht, wt = tex.shape[0], tex.shape[1]
    u = uv[..., 0] * wt - 0.5
    vv = uv[..., 1] * ht - 0.5
    if mode == "wrap":
        u = jnp.mod(u, wt)
        vv = jnp.mod(vv, ht)
    u0 = jnp.floor(u)
    v0 = jnp.floor(vv)
    fu = u - u0
    fv_ = vv - v0

    def fetch(ui, vi):
        if mode == "wrap":
            ui = jnp.mod(ui.astype(jnp.int32), wt)
            vi = jnp.mod(vi.astype(jnp.int32), ht)
        else:
            ui = jnp.clip(ui.astype(jnp.int32), 0, wt - 1)
            vi = jnp.clip(vi.astype(jnp.int32), 0, ht - 1)
        return tex[vi, ui]

    t00 = fetch(u0, v0)
    t10 = fetch(u0 + 1, v0)
    t01 = fetch(u0, v0 + 1)
    t11 = fetch(u0 + 1, v0 + 1)
    fu = fu[..., None]
    fv_ = fv_[..., None]
    return ((1 - fu) * (1 - fv_) * t00 + fu * (1 - fv_) * t10
            + (1 - fu) * fv_ * t01 + fu * fv_ * t11)


def build_mip_chain(tex: jnp.ndarray, max_levels: int | None = None):
    """[Ht, Wt, C] → list of mip levels (2× average-pooled), level 0 =
    full resolution. The dr.texture mip stack (`diff_mesh_renderer.py`
    uses nvdiffrast's auto mips)."""
    levels = [tex]
    h, w = tex.shape[0], tex.shape[1]
    n = max_levels or 32
    while len(levels) < n and h >= 2 and w >= 2 and h % 2 == 0 \
            and w % 2 == 0:
        t = levels[-1]
        t = (t[0::2, 0::2] + t[1::2, 0::2] + t[0::2, 1::2]
             + t[1::2, 1::2]) * 0.25
        levels.append(t)
        h, w = h // 2, w // 2
    return levels


def uv_mip_level(uv_img: jnp.ndarray, tex_size: int) -> jnp.ndarray:
    """Per-pixel LOD from screen-space UV derivatives (finite
    differences of the rasterized uv image — the uv_da input of
    nvdiffrast's dr.texture). uv_img [H, W, 2] → lod [H, W]."""
    du_dx = jnp.abs(jnp.diff(uv_img, axis=1, append=uv_img[:, -1:]))
    du_dy = jnp.abs(jnp.diff(uv_img, axis=0, append=uv_img[-1:]))
    footprint = jnp.maximum(du_dx.max(-1), du_dy.max(-1)) * tex_size
    return jnp.log2(jnp.maximum(footprint, 1e-8))


def texture_sample_mip(mips, uv: jnp.ndarray, lod: jnp.ndarray,
                       mode: str = "wrap") -> jnp.ndarray:
    """Trilinear mipmapped lookup: bilinear in the two adjacent levels,
    linear across levels (dr.texture 'linear-mipmap-linear')."""
    n = len(mips)
    lod = jnp.clip(lod, 0.0, n - 1.0)
    lo = jnp.floor(lod).astype(jnp.int32)
    frac = (lod - lo)[..., None]
    out_lo = jnp.zeros(uv.shape[:-1] + (mips[0].shape[-1],))
    out_hi = jnp.zeros_like(out_lo)
    for li in range(n):
        s = texture_sample(mips[li], uv, mode=mode)
        out_lo = jnp.where((lo == li)[..., None], s, out_lo)
        out_hi = jnp.where((jnp.minimum(lo + 1, n - 1) == li)[..., None],
                           s, out_hi)
    return out_lo * (1 - frac) + out_hi * frac


def antialias(color: jnp.ndarray, background: jnp.ndarray,
              v: jnp.ndarray, faces: jnp.ndarray, mvp: jnp.ndarray,
              rast: "RasterOut", sigma: float = 1e-5,
              face_valid=None) -> jnp.ndarray:
    """Silhouette-edge antialiasing with vertex-position gradients
    (`dr.antialias` role, used by the reference mesh fitters at
    `diff_mesh_renderer.py:38-158` / FlexiCubes). nvdiffrast analytically
    blends across the exact crossing edge; here coverage comes from the
    differentiable soft silhouette, which yields the same class of
    visibility gradients with an O(pixels) TPU-friendly formulation.
    Interior pixels keep the hard rasterized color."""
    h, w = rast.mask.shape
    sil = soft_silhouette(v, faces, mvp, h, w, sigma=sigma,
                          face_valid=face_valid)
    # edge band: pixels whose 4-neighborhood crosses the coverage mask
    m = rast.mask
    shift = jnp.stack([jnp.roll(m, 1, 0), jnp.roll(m, -1, 0),
                       jnp.roll(m, 1, 1), jnp.roll(m, -1, 1)])
    edge = (shift.max(0) != shift.min(0)) | (m != jnp.roll(m, 1, 0))
    alpha = jnp.where(edge, sil, m)[..., None]
    return color * alpha + background * (1.0 - alpha)


# ------------------------------------------------------------------ #
# Soft silhouette (visibility gradients; the antialias role for masks)
# ------------------------------------------------------------------ #
@partial(jax.jit, static_argnames=("height", "width", "chunk"))
def soft_silhouette(v: jnp.ndarray, faces: jnp.ndarray, mvp: jnp.ndarray,
                    height: int, width: int, sigma: float = 1e-4,
                    face_valid=None, chunk: int = 32) -> jnp.ndarray:
    """Differentiable coverage à la SoftRasterizer: per-pixel
    1 - Π(1 - sigmoid(d²/σ)) over faces, where d is the signed screen
    distance to the triangle (positive inside). Gives the visibility
    gradients mask losses need (reference uses nvdiffrast antialias for
    this in FlexiCubes/DiffMesh fitting)."""
    nf = faces.shape[0]
    if face_valid is None:
        face_valid = jnp.ones((nf,), bool)
    v_clip = project_vertices(v, mvp)
    screen_xy, w_view, _ = clip_to_screen(v_clip, height, width)
    pad = (-nf) % chunk
    if pad:
        faces = jnp.concatenate([faces, jnp.zeros((pad, 3), faces.dtype)], 0)
        face_valid = jnp.concatenate([face_valid,
                                      jnp.zeros((pad,), bool)], 0)
    scale = 1.0 / max(height, width)

    ys = jnp.arange(height, dtype=jnp.float32) + 0.5
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    px = jnp.stack([gx, gy], -1)[:, :, None, :]

    def step(carry, inp):
        log_one_minus = carry
        fc, valid = inp
        p0, p1, p2, w0, w1, w2 = _face_corners(screen_xy, w_view, fc)
        ok = valid & (w0 > 1e-8) & (w1 > 1e-8) & (w2 > 1e-8)
        d = _signed_dist_to_tri(px, p0[None, None], p1[None, None],
                                p2[None, None]) * scale
        prob = jax.nn.sigmoid(jnp.sign(d) * d * d / sigma)
        prob = jnp.where(ok[None, None], prob, 0.0)
        log_one_minus = log_one_minus + jnp.sum(
            jnp.log1p(-jnp.clip(prob, 0.0, 1.0 - 1e-7)), axis=-1)
        return log_one_minus, None

    nchunks = faces.shape[0] // chunk
    init = jnp.zeros((height, width), jnp.float32)
    # remat: without it, autodiff saves [nchunks, H, W, chunk] residuals —
    # recomputing the chunk forward in the backward pass is far cheaper
    # than that memory (HBM bandwidth is the budget, SURVEY.md §hardware)
    out, _ = jax.lax.scan(jax.checkpoint(step), init,
                          (faces.reshape(nchunks, chunk, 3),
                           face_valid.reshape(nchunks, chunk)))
    return 1.0 - jnp.exp(out)


def _signed_dist_to_tri(p, a, b, c):
    """Signed 2D distance: positive inside the triangle, negative outside
    (distance to the nearest edge segment)."""
    d_ab = _seg_dist(p, a, b)
    d_bc = _seg_dist(p, b, c)
    d_ca = _seg_dist(p, c, a)
    dist = jnp.minimum(jnp.minimum(d_ab, d_bc), d_ca)
    e0 = _edge(p, a, b)
    e1 = _edge(p, b, c)
    e2 = _edge(p, c, a)
    inside = (((e0 >= 0) & (e1 >= 0) & (e2 >= 0))
              | ((e0 <= 0) & (e1 <= 0) & (e2 <= 0)))
    return jnp.where(inside, dist, -dist)


def _seg_dist(p, a, b):
    ab = b - a
    ap = p - a
    t = jnp.clip((ap * ab).sum(-1)
                 / jnp.maximum((ab * ab).sum(-1), 1e-12), 0.0, 1.0)
    closest = a + t[..., None] * ab
    d = p - closest
    return jnp.sqrt(jnp.maximum((d * d).sum(-1), 1e-20))
