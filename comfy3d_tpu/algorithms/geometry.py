"""Geometry long tail: surface sampling, Poisson reconstruction, hole
filling.

Counterparts of the reference's CPU-mesh-library calls (SURVEY.md §2.2,
VERDICT round-1 missing #8):
  * `sample_points_on_mesh` — area-weighted surface sampling
    (`mesh_processer/mesh_utils.py:90`, trimesh.sample role);
  * `poisson_reconstruct` — oriented points → watertight mesh
    (`mesh_utils.py:174`, open3d `create_from_point_cloud_poisson`
    role). TPU-first formulation: normals are splatted into a dense
    vector field, the indicator is solved spectrally
    (∇²χ = ∇·V via jnp.fft — one device program, no sparse solver),
    and the surface comes out of the marching-tets extractor;
  * `fill_holes` — boundary-loop detection + centroid-fan filling
    (`TRELLIS/trellis/utils/postprocessing_utils.py:19` igraph role).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.mesh import Mesh


def sample_points_on_mesh(mesh: Mesh, n: int, seed: int = 0,
                          with_normals: bool = True):
    """Area-weighted uniform surface samples → (points [n, 3],
    normals [n, 3])."""
    v = np.asarray(mesh.v, np.float64)
    f = np.asarray(mesh.f, np.int64)
    p0, p1, p2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    cross = np.cross(p1 - p0, p2 - p0)
    area = 0.5 * np.linalg.norm(cross, axis=1)
    total = area.sum()
    if total <= 0:
        raise ValueError("degenerate mesh: zero surface area")
    rng = np.random.RandomState(seed)
    fi = rng.choice(len(f), size=n, p=area / total)
    r1 = np.sqrt(rng.rand(n))
    r2 = rng.rand(n)
    w0 = 1.0 - r1
    w1 = r1 * (1.0 - r2)
    w2 = r1 * r2
    pts = (w0[:, None] * p0[fi] + w1[:, None] * p1[fi]
           + w2[:, None] * p2[fi])
    if not with_normals:
        return pts.astype(np.float32), None
    nrm = cross[fi] / np.maximum(
        np.linalg.norm(cross[fi], axis=1, keepdims=True), 1e-12)
    return pts.astype(np.float32), nrm.astype(np.float32)


def _splat_grid(points, values, res, bounds):
    """Trilinear scatter of per-point vectors onto a [res³, C] grid."""
    lo, hi = bounds
    u = (points - lo) / (hi - lo) * (res - 1)
    u = jnp.clip(u, 0.0, res - 1 - 1e-4)
    u0 = jnp.floor(u).astype(jnp.int32)
    frac = u - u0
    c = values.shape[-1]
    grid = jnp.zeros((res, res, res, c))
    wsum = jnp.zeros((res, res, res, 1))
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (jnp.abs(1 - dx - frac[:, 0])
                     * jnp.abs(1 - dy - frac[:, 1])
                     * jnp.abs(1 - dz - frac[:, 2]))[:, None]
                idx = (u0[:, 0] + dx, u0[:, 1] + dy, u0[:, 2] + dz)
                grid = grid.at[idx].add(values * w)
                wsum = wsum.at[idx].add(w)
    return grid, wsum


@jax.jit
def _poisson_solve(vec_field):
    """∇²χ = ∇·V spectral solve on a periodic grid (+ smoothing)."""
    res = vec_field.shape[0]
    # central-difference divergence
    div = jnp.zeros(vec_field.shape[:3])
    for ax in range(3):
        comp = vec_field[..., ax]
        div = div + (jnp.roll(comp, -1, axis=ax)
                     - jnp.roll(comp, 1, axis=ax)) * 0.5
    k = jnp.fft.fftfreq(res) * 2.0 * np.pi
    kx, ky, kz = jnp.meshgrid(k, k, k, indexing="ij")
    # eigenvalues of the periodic central-difference Laplacian
    denom = (2.0 * (jnp.cos(kx) - 1.0) + 2.0 * (jnp.cos(ky) - 1.0)
             + 2.0 * (jnp.cos(kz) - 1.0))
    denom = jnp.where(jnp.abs(denom) < 1e-9, 1.0, denom)
    chi_hat = jnp.fft.fftn(div) / denom
    chi_hat = chi_hat.at[0, 0, 0].set(0.0)
    return jnp.real(jnp.fft.ifftn(chi_hat))


def poisson_reconstruct(points, normals, resolution: int = 128,
                        bounds=None, smooth_sigma: float = 1.0,
                        max_tris: int = 1_000_000) -> Mesh:
    """Oriented point cloud → watertight mesh (screened-Poisson role).

    Splat inward-flux normals into a grid, solve the indicator χ
    spectrally, threshold at the mean χ over the samples, extract with
    marching tets."""
    points = np.asarray(points, np.float32)
    normals = np.asarray(normals, np.float32)
    if bounds is None:
        lo = points.min() - 0.1 * np.abs(points).max() - 1e-3
        hi = points.max() + 0.1 * np.abs(points).max() + 1e-3
        pad = 0.15 * (hi - lo)
        lo, hi = lo - pad, hi + pad
    else:
        lo, hi = bounds
    vec, w = _splat_grid(jnp.asarray(points), jnp.asarray(normals),
                         resolution, (lo, hi))
    vec = vec / jnp.maximum(w, 1e-6)
    if smooth_sigma > 0:
        r = int(np.ceil(2 * smooth_sigma))
        x = jnp.arange(-r, r + 1)
        g = jnp.exp(-0.5 * (x / smooth_sigma) ** 2)
        g = g / g.sum()
        for ax in range(3):
            shape = [1, 1, 1, 1]
            shape[ax] = len(g)
            vec = jax.scipy.signal.convolve(
                vec, g.reshape(shape), mode="same")
    chi = _poisson_solve(vec)

    # iso level: mean indicator at the sample points
    u = (jnp.asarray(points) - lo) / (hi - lo) * (resolution - 1)
    ui = jnp.clip(u.astype(jnp.int32), 0, resolution - 1)
    iso = float(chi[ui[:, 0], ui[:, 1], ui[:, 2]].mean())

    from ..ops import tetra
    mesh = tetra.extract_isosurface(np.asarray(chi, np.float32),
                                    iso=iso, bounds=(lo, hi),
                                    max_tris=max_tris)
    # keep the dominant component (periodic-domain wrap can shed small
    # shells), then close residual boundary loops → watertight output
    try:
        from .. import native
        v2, f2 = native.clean_mesh(np.asarray(mesh.v),
                                   np.asarray(mesh.f),
                                   weld_eps=0.0, min_component_frac=0.3)
        if len(f2):
            mesh = Mesh(v=v2, f=f2)
    except Exception:
        pass
    return fill_holes(mesh, max_hole_edges=1024)


def boundary_loops(faces: np.ndarray):
    """Ordered open boundary loops (lists of vertex indices)."""
    f = np.asarray(faces, np.int64)
    edges = np.concatenate([f[:, (0, 1)], f[:, (1, 2)], f[:, (2, 0)]])
    key = edges.min(1) * (f.max() + 1) + edges.max(1)
    uniq, counts = np.unique(key, return_counts=True)
    boundary_keys = set(uniq[counts == 1].tolist())
    nxt = {}
    for a, b in edges:
        k = min(a, b) * (f.max() + 1) + max(a, b)
        if k in boundary_keys:
            nxt[a] = b          # boundary half-edges keep face winding
    loops = []
    visited = set()
    for start in list(nxt):
        if start in visited:
            continue
        loop = [start]
        visited.add(start)
        cur = nxt.get(start)
        while cur is not None and cur != start and cur not in visited:
            loop.append(cur)
            visited.add(cur)
            cur = nxt.get(cur)
        if cur == start and len(loop) >= 3:
            loops.append(loop)
    return loops


def fill_holes(mesh: Mesh, max_hole_edges: int = 10_000) -> Mesh:
    """Close open boundary loops with centroid fans
    (postprocessing_utils._fill_holes role, igraph-free)."""
    v = np.asarray(mesh.v, np.float32)
    f = np.asarray(mesh.f, np.int32)
    loops = [l for l in boundary_loops(f) if len(l) <= max_hole_edges]
    if not loops:
        return mesh
    new_v = [v]
    new_f = [f]
    nv = len(v)
    for loop in loops:
        centroid = v[loop].mean(axis=0, keepdims=True)
        new_v.append(centroid)
        ring = np.asarray(loop, np.int32)
        nxt = np.roll(ring, -1)
        # reverse winding: the fan must face opposite the boundary edges
        tris = np.stack([nxt, ring, np.full_like(ring, nv)], axis=1)
        new_f.append(tris)
        nv += 1
    out = Mesh(v=np.concatenate(new_v), f=np.concatenate(new_f))
    if mesh.vc is not None:
        vc = np.asarray(mesh.vc)
        extra = [vc] + [vc[np.asarray(l)].mean(0, keepdims=True)
                        for l in loops]
        out.vc = np.concatenate(extra)
    return out
