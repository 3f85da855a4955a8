"""Unique3D-style mesh reconstruction from multi-view normal maps.

Counterpart of `Gen_3D_Modules/Unique3D/mesh_reconstruction/
{recon.py:14,refine.py:14}` (`reconstruct_stage1` inflation +
`run_mesh_refine`), backing the `Fast_Normal_Maps_To_Mesh` and
`ExplicitTarget_Mesh_Optimization` nodes (reference nodes.py:2959,2986):
optimize vertices of a genus-0 start mesh so 4 orthographic renders of
its vertex normals match the predicted normal maps, with alpha/mask and
expansion/laplacian regularizers.

TPU design: fixed topology (an icosphere at chosen resolution) — the
reference's per-step continuous remeshing reallocates tensors every
iteration, which would retrace under jit; a sufficiently dense fixed
sphere + laplacian smoothing reaches the same fit for the star-camera
setup. One jitted Adam step; the loop is host-driven like the trainers.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.mesh import Mesh
from ..ops import rasterize as R


def make_icosphere(subdivisions: int = 4, radius: float = 0.6):
    """Icosahedron subdivided `subdivisions` times (host, numpy)."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    v = np.array([[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
                  [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
                  [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]],
                 np.float64)
    f = np.array([[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10],
                  [0, 10, 11], [1, 5, 9], [5, 11, 4], [11, 10, 2],
                  [10, 7, 6], [7, 1, 8], [3, 9, 4], [3, 4, 2],
                  [3, 2, 6], [3, 6, 8], [3, 8, 9], [4, 9, 5],
                  [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]],
                 np.int64)
    for _ in range(subdivisions):
        cache = {}
        nv = list(v)

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in cache:
                cache[key] = len(nv)
                nv.append((v[a] + v[b]) * 0.5)
            return cache[key]

        nf = []
        for a, b, c in f:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            nf += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
        v = np.asarray(nv)
        f = np.asarray(nf, np.int64)
    v = v / np.linalg.norm(v, axis=1, keepdims=True) * radius
    return v.astype(np.float32), f.astype(np.int32)


def star_ortho_mvps(n_views: int = 4, scale: float = 1.0):
    """Orthographic MVPs for azimuths 0/90/180/270 (recon.py
    make_star_cameras_orthographic role). Camera looks down −z after an
    azimuthal rotation; ortho box [-scale, scale]."""
    mvps = []
    for i in range(n_views):
        az = np.deg2rad(90.0 * i)
        ca, sa = np.cos(az), np.sin(az)
        rot = np.array([[ca, 0, -sa, 0], [0, 1, 0, 0],
                        [sa, 0, ca, 0], [0, 0, 0, 1]], np.float32)
        proj = np.diag([1.0 / scale, 1.0 / scale, -1.0 / scale, 1.0]
                       ).astype(np.float32)
        mvps.append(proj @ rot)
    return np.stack(mvps)


def _vertex_normals(v, f):
    p0, p1, p2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    fn = jnp.cross(p1 - p0, p2 - p0)
    vn = jnp.zeros_like(v)
    vn = vn.at[f[:, 0]].add(fn).at[f[:, 1]].add(fn).at[f[:, 2]].add(fn)
    return vn / jnp.maximum(jnp.linalg.norm(vn, axis=1, keepdims=True),
                            1e-8)


def _laplacian(v, f):
    nbr = jnp.zeros_like(v)
    cnt = jnp.zeros((v.shape[0], 1))
    for a, b in ((0, 1), (1, 2), (2, 0)):
        nbr = nbr.at[f[:, a]].add(v[f[:, b]])
        nbr = nbr.at[f[:, b]].add(v[f[:, a]])
        cnt = cnt.at[f[:, a]].add(1.0).at[f[:, b]].add(1.0)
    return nbr / jnp.maximum(cnt, 1.0) - v


def reconstruct_from_normals(normal_maps, masks, steps: int = 100,
                             subdivisions: int = 4, lr: float = 0.01,
                             lap_weight: float = 0.5,
                             expand_weight: float = 0.1,
                             sil_weight: float = 1.0,
                             progress=None) -> Mesh:
    """normal_maps [4, S, S, 3] in [0,1] (world normals ·0.5+0.5 per the
    Unique3D convention); masks [4, S, S] → fitted Mesh."""
    normal_maps = jnp.asarray(normal_maps, jnp.float32)
    masks = jnp.asarray(masks, jnp.float32)
    n_views, size = normal_maps.shape[0], normal_maps.shape[1]
    mvps = jnp.asarray(star_ortho_mvps(n_views))
    v0, f = make_icosphere(subdivisions)
    f_j = jnp.asarray(f)

    def loss_fn(verts):
        vn = _vertex_normals(verts, f_j)
        total = 0.0
        for i in range(n_views):
            rast = R.rasterize(verts, f_j, mvps[i], size, size)
            bary = R.recompute_barycentrics(verts, mvps[i], f_j, rast)
            nimg = R.interpolate(vn, rast, f_j, bary=bary)
            nimg = nimg * 0.5 + 0.5
            m = rast.mask * masks[i]
            total = total + (((nimg - normal_maps[i]) ** 2)
                             * m[..., None]).mean()
            sil = R.soft_silhouette(verts, f_j, mvps[i], size, size,
                                    sigma=1e-4)
            total = total + sil_weight * ((sil - masks[i]) ** 2).mean()
        lap = _laplacian(verts, f_j)
        total = total + lap_weight * (lap ** 2).mean()
        total = total + expand_weight * 0.5 * (
            (jax.lax.stop_gradient(verts + vn) - verts) ** 2).mean()
        return total

    @jax.jit
    def step(verts, m, vv, i):
        g = jax.grad(loss_fn)(verts)
        m = 0.9 * m + 0.1 * g
        vv = 0.999 * vv + 0.001 * g * g
        mh = m / (1 - 0.9 ** (i + 1))
        vh = vv / (1 - 0.999 ** (i + 1))
        verts = verts - lr * mh / (jnp.sqrt(vh) + 1e-8)
        return verts, m, vv

    verts = jnp.asarray(v0)
    m = jnp.zeros_like(verts)
    vv = jnp.zeros_like(verts)
    for i in range(steps):
        verts, m, vv = step(verts, m, vv, i)
        if progress is not None:
            progress(i, {})
    out = Mesh(v=np.asarray(verts), f=np.asarray(f, np.int32))
    return out.auto_normal()
