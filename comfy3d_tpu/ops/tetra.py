"""Iso-surface extraction via marching tetrahedra (+ differentiable variant).

Replaces the reference's CPU PyMCubes marching cubes
(`mesh_processer/mesh_utils.py:488-519` `marching_cubes_density_to_mesh`,
TripoSR `models/isosurface.py:5-19`) and — through the differentiable
variant — the role of diso/DMC (`Hunyuan3D_V2/.../surface_extractors.py:79`)
and the topology half of FlexiCubes.

Design notes (why tets, not cubes): the classic MC lookup tables are large
irregular constants; marching tetrahedra needs only a 16-case table that this
module *derives at import time* from first principles (inside-set enumeration,
orientation fixed at runtime by a data-driven normal flip against the field
gradient direction). Each cube splits into 6 tets around the 0-6 diagonal.
Output is a fixed-capacity triangle soup (XLA static shapes) compacted by a
global cumsum; host-side `weld` merges duplicate vertices. The differentiable
variant freezes topology (stop-gradient on the sign pattern) and keeps the
edge-interpolation weights live — gradients flow into the SDF values and
vertex positions exactly as in DMTet-style fitting.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# cube corners by bit pattern (x, y, z)
_CORNERS = np.array([
    [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
    [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
], np.int32)

# six tets around the 0→6 diagonal: each path 0→a→b→6 over cube edges
_TETS = np.array([
    [0, 1, 2, 6], [0, 2, 3, 6], [0, 3, 7, 6],
    [0, 7, 4, 6], [0, 4, 5, 6], [0, 5, 1, 6],
], np.int32)

# tet edges by local vertex pair
_TET_EDGES = np.array(
    [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], np.int32)


def _build_case_table():
    """[16, 2, 3] triangle edge ids (-1 pad) + [16] counts, derived by
    enumerating the inside set of each sign case. Winding is arbitrary here;
    runtime flips for outward orientation."""
    edge_of = {}
    for e, (a, b) in enumerate(_TET_EDGES):
        edge_of[(a, b)] = e
        edge_of[(b, a)] = e
    table = -np.ones((16, 2, 3), np.int32)
    counts = np.zeros((16,), np.int32)
    for case in range(16):
        inside = [i for i in range(4) if case & (1 << i)]
        outside = [i for i in range(4) if not case & (1 << i)]
        if len(inside) in (0, 4):
            continue
        if len(inside) == 1 or len(inside) == 3:
            a = inside[0] if len(inside) == 1 else outside[0]
            others = [i for i in range(4) if i != a]
            tri = [edge_of[(a, o)] for o in others]
            table[case, 0] = tri
            counts[case] = 1
        else:  # 2 inside / 2 outside → quad across 4 crossing edges
            a, b = inside
            c, d = outside
            pac, pad = edge_of[(a, c)], edge_of[(a, d)]
            pbc, pbd = edge_of[(b, c)], edge_of[(b, d)]
            table[case, 0] = [pac, pad, pbd]
            table[case, 1] = [pac, pbd, pbc]
            counts[case] = 2
    return table, counts


_CASE_TABLE, _CASE_COUNTS = _build_case_table()


def _tet_triangles(pos, val, inside):
    """Vectorized per-tet triangle extraction.

    pos: [N, 4, 3] tet corner positions; val: [N, 4] field values
    (signed: >0 inside); inside: [N, 4] bool. Returns
    (tris [N, 2, 3, 3], tri_valid [N, 2]). Orientation: normals point
    toward the *outside* (val<0) region.
    """
    case = (inside[:, 0].astype(jnp.int32)
            + 2 * inside[:, 1] + 4 * inside[:, 2] + 8 * inside[:, 3])
    table = jnp.asarray(_CASE_TABLE)          # [16, 2, 3]
    counts = jnp.asarray(_CASE_COUNTS)        # [16]
    edges = jnp.asarray(_TET_EDGES)           # [6, 2]

    # crossing point on every tet edge (mask invalid later)
    va = val[:, edges[:, 0]]                  # [N, 6]
    vb = val[:, edges[:, 1]]
    denom = va - vb
    t = va / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    t = jnp.clip(t, 0.0, 1.0)
    pa = pos[:, edges[:, 0]]                  # [N, 6, 3]
    pb = pos[:, edges[:, 1]]
    cross_pts = pa + t[..., None] * (pb - pa)

    tri_edges = table[case]                   # [N, 2, 3]
    safe = jnp.maximum(tri_edges, 0)
    # mask-accumulate selection over the 6 tet edges: a dynamic gather
    # here forces a row-major layout whose (8,128) tile padding blows
    # [N,2,6,3] up 57x on TPU (OOM at 384^3); the masked sum stays
    # elementwise so XLA keeps N-minor layouts with ~1.0x padding
    tris = jnp.zeros(case.shape + (2, 3, 3), pos.dtype)
    for e in range(6):
        m = (safe == e).astype(pos.dtype)[..., None]     # [N, 2, 3, 1]
        tris = tris + m * cross_pts[:, e][:, None, None, :]
    ntri = counts[case]
    tri_valid = jnp.stack([ntri >= 1, ntri >= 2], -1)

    # outward orientation: flip if normal points toward the inside centroid
    w_in = inside.astype(jnp.float32)
    c_in = (pos * w_in[..., None]).sum(1) / jnp.maximum(
        w_in.sum(1, keepdims=True), 1.0)      # [N, 3]
    n = jnp.cross(tris[:, :, 1] - tris[:, :, 0],
                  tris[:, :, 2] - tris[:, :, 0])   # [N, 2, 3]
    to_in = c_in[:, None, :] - tris[:, :, 0]
    flip = (n * to_in).sum(-1) > 0            # normal toward inside → flip
    tris = jnp.where(flip[..., None, None],
                     tris[:, :, ::-1, :], tris)
    return tris, tri_valid


@partial(jax.jit, static_argnames=("max_tris", "slab", "slab_cap"))
def marching_tets_grid(grid: jnp.ndarray, iso: float = 0.0,
                       origin=(-1.0, -1.0, -1.0), spacing=None,
                       max_tris: int = 200_000, slab: int = 8,
                       slab_cap: int = 131_072):
    """Extract the iso-surface of a dense [R, R, R] field.

    `grid` is signed relative to `iso`: surface where grid == iso, inside
    where grid > iso (density convention; negate an SDF before calling).
    Returns (verts [max_tris*3, 3] triangle soup, tri_count, overflow).

    Compaction is a per-slab stable argsort (valid-first) + contiguous
    dynamic_update_slice in a [9, T] triangle-minor layout — a scatter
    here serializes on TPU and dominated the whole sweep (~30 s at
    192³); the sort-compact version is bandwidth-bound. `slab_cap`
    bounds triangles per z-slab (overflow-flagged).
    """
    r = grid.shape[0]
    if spacing is None:
        spacing = 2.0 / (r - 1)
    origin = jnp.asarray(origin, jnp.float32)
    field = grid - iso
    ncells = r - 1
    ncells_y = grid.shape[1] - 1        # y/z may be partition blocks
    ncells_z = grid.shape[2] - 1
    nslabs = -(-ncells_z // slab)
    pad_z = nslabs * slab + 1 - grid.shape[2]
    field_pad = (jnp.pad(field, ((0, 0), (0, 0), (0, pad_z)))
                 if pad_z > 0 else field)

    # global triangle count prefix per slab for compact output offsets
    def slab_tris(s0):
        """Triangles for cells with z-index in [s0, s0+slab)."""
        zs = s0 + jnp.arange(slab)
        sl = jax.lax.dynamic_slice_in_dim(field_pad, s0, slab + 1,
                                          axis=2)
        # corner values per cell [ncells, ncells, slab, 8]
        cx, cy, cz = _CORNERS[:, 0], _CORNERS[:, 1], _CORNERS[:, 2]
        vals = jnp.stack([
            sl[cx[k]: cx[k] + ncells, cy[k]: cy[k] + ncells_y,
               cz[k]: cz[k] + slab] for k in range(8)], -1)
        # positions
        ix = jnp.arange(ncells)
        iy = jnp.arange(ncells_y)
        gx, gy, gz = jnp.meshgrid(ix, iy, zs, indexing="ij")
        base = jnp.stack([gx, gy, gz], -1).astype(jnp.float32)
        corner_off = jnp.asarray(_CORNERS, jnp.float32)
        pos = (base[..., None, :] + corner_off) * spacing + origin

        pos = pos.reshape(-1, 8, 3)
        vals = vals.reshape(-1, 8)
        zvalid = (gz < ncells_z).reshape(-1)

        tets = jnp.asarray(_TETS)
        tp = pos[:, tets].reshape(-1, 4, 3)         # [C*6, 4, 3]
        tv = vals[:, tets].reshape(-1, 4)
        inside = tv > 0
        tris, valid = _tet_triangles(tp, tv, inside)
        valid = valid & zvalid.repeat(6)[:, None]
        return tris.reshape(-1, 3, 3), valid.reshape(-1)

    cap = min(slab_cap, max_tris)
    nv_out = jnp.zeros((9, max_tris + cap), jnp.float32)

    def body(i, state):
        out, count, ovf = state
        tris, valid = slab_tris(i * slab)
        t9 = tris.reshape(-1, 9).T                        # [9, M]
        order = jnp.argsort(
            jnp.where(valid, jnp.uint32(0), jnp.uint32(1)),
            stable=True)
        block = t9[:, order[:cap]]                        # [9, cap]
        nval = valid.sum(dtype=jnp.int32)
        out = jax.lax.dynamic_update_slice(out, block, (0, count))
        ovf = ovf | (nval > cap)
        return out, jnp.minimum(count + jnp.minimum(nval, cap),
                                max_tris), ovf

    out, count, overflow = jax.lax.fori_loop(
        0, nslabs, body, (nv_out, jnp.int32(0), jnp.bool_(False)))
    overflow = overflow | (count >= max_tris)
    soup = out.T[:max_tris].reshape(max_tris, 3, 3)
    return soup, jnp.minimum(count, max_tris), overflow


def weld(tri_soup: np.ndarray, tri_count: int, decimals: int = 6):
    """Host-side vertex weld: triangle soup → (v [Nv,3], f [Nf,3]).
    Counterpart of the index dedup trimesh does inside the reference's
    mesh-from-marching-cubes path."""
    tris = np.asarray(tri_soup[:tri_count]).reshape(-1, 3)
    keys = np.round(tris, decimals)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    # representative positions (first occurrence, unrounded)
    order = np.arange(len(inv))
    first = np.full(len(uniq), len(inv), np.int64)
    np.minimum.at(first, inv, order)
    v = tris[first].astype(np.float32)
    f = inv.reshape(-1, 3).astype(np.int32)
    # drop degenerate faces produced by welding
    keep = ((f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2])
            & (f[:, 0] != f[:, 2]))
    return v, f[keep]


def extract_isosurface(grid, iso: float = 0.0, bounds=(-1.0, 1.0),
                       max_tris: int = 400_000, max_block: int = 256):
    """Grid → welded Mesh (host hop at the stage boundary).

    Counterpart of reference `marching_cubes_density_to_mesh`
    (`mesh_utils.py:488-519`) minus the pymeshlab clean (see native/).
    Grids larger than `max_block` per axis are swept in overlapping
    y/z-partitions (the remote AOT compiler rejects ≥320³ one-shot
    programs), then welded into one mesh. Single-shot 256³ runs ~4 s
    warm on v5e; the partitioned sweep costs ~2x for the overlap."""
    from ..core.mesh import Mesh
    r = grid.shape[0]
    spacing = (bounds[1] - bounds[0]) / (r - 1)
    if r <= max_block:
        soup, count, overflow = marching_tets_grid(
            jnp.asarray(grid), iso=iso,
            origin=(bounds[0],) * 3, spacing=spacing,
            max_tris=max_tris)
        v, f = weld(np.asarray(soup), int(count))
        if bool(overflow):
            import warnings
            warnings.warn(
                f"marching tets overflow: capacity {max_tris} hit")
        return Mesh(v=v, f=f)

    grid = np.asarray(grid)
    nblocks = -(-(r - 1) // (max_block - 1))
    # full budget per block: the surface is rarely uniform across
    # partitions, and a block soup is only max_tris*36B host-side
    per_cap = max_tris
    soups = []
    for bj in range(nblocks):
        y0 = bj * (max_block - 1)
        y1 = min(y0 + max_block, r)
        for bi in range(nblocks):
            z0 = bi * (max_block - 1)
            z1 = min(z0 + max_block, r)
            sub = jnp.asarray(grid[:, y0:y1, z0:z1])
            # thin slabs: the x-extent stays full, so per-slab tet
            # counts (and their tile-padded intermediates) must shrink
            soup, count, overflow = marching_tets_grid(
                sub, iso=iso,
                origin=(bounds[0], bounds[0] + y0 * spacing,
                        bounds[0] + z0 * spacing),
                spacing=spacing, max_tris=per_cap, slab=4)
            soups.append(np.asarray(soup)[:int(count)])
            if bool(overflow):
                import warnings
                warnings.warn(
                    f"marching tets overflow in block {bj},{bi}")
    allsoup = (np.concatenate(soups) if soups
               else np.zeros((0, 3, 3), np.float32))
    v, f = weld(allsoup, len(allsoup))
    return Mesh(v=v, f=f)


# ------------------------------------------------------------------ #
# Differentiable variant (DMTet-style) — topology frozen, geometry live
# ------------------------------------------------------------------ #
def marching_tets_diff(verts: jnp.ndarray, sdf: jnp.ndarray,
                       tets: jnp.ndarray):
    """Differentiable surface from an explicit tet mesh.

    verts: [V, 3] (live — deformable grid); sdf: [V] (live, >0 inside);
    tets: [T, 4] int. Returns (tris [T*2, 3, 3], valid [T*2]) with
    gradients to verts & sdf through the edge interpolation; the sign
    pattern (topology) is stop-gradient. This is the geometry engine the
    FlexiCubes-role fitter (`algorithms.flexicubes_fit`) optimizes through.
    """
    tv = sdf[tets]                       # [T, 4]
    tp = verts[tets]                     # [T, 4, 3]
    inside = jax.lax.stop_gradient(tv) > 0
    tris, valid = _tet_triangles(tp, tv, inside)
    return tris.reshape(-1, 3, 3), valid.reshape(-1)


def grid_tets(res: int):
    """Regular tet decomposition of a res³ vertex grid in [-1,1]³ →
    (verts [res³, 3] np, tets [(res-1)³*6, 4] np)."""
    lin = np.linspace(-1.0, 1.0, res, dtype=np.float32)
    gx, gy, gz = np.meshgrid(lin, lin, lin, indexing="ij")
    verts = np.stack([gx, gy, gz], -1).reshape(-1, 3)

    def vid(x, y, z):
        return (x * res + y) * res + z

    ix = np.arange(res - 1)
    cx, cy, cz = np.meshgrid(ix, ix, ix, indexing="ij")
    corner_ids = np.stack([
        vid(cx + _CORNERS[k, 0], cy + _CORNERS[k, 1], cz + _CORNERS[k, 2])
        for k in range(8)], -1).reshape(-1, 8)
    tets = corner_ids[:, _TETS].reshape(-1, 4).astype(np.int32)
    return verts, tets


@partial(jax.jit, static_argnames=("cap",))
def _compact_step(out, count, verts, sdf, tets, cap: int):
    """One chunk of an explicit-tet sweep, compacted on device.

    Runs `marching_tets_diff` on a tet chunk, moves valid triangles to
    the front with a stable argsort, and appends them to `out`
    ([9, T] triangle-minor accumulator) at `count`. Keeps the whole
    sweep on device — the naive per-chunk host transfer + boolean
    filter dominated InstantMesh mesh extraction wall-clock (the
    device→host tunnel moves ~150 MB per dense chunk)."""
    tris, valid = marching_tets_diff(verts, sdf, tets)
    t9 = tris.reshape(-1, 9).T
    order = jnp.argsort(jnp.where(valid, jnp.uint32(0), jnp.uint32(1)),
                        stable=True)
    block = t9[:, order[:cap]]
    nval = jnp.minimum(valid.sum(dtype=jnp.int32), cap)
    out = jax.lax.dynamic_update_slice(out, block, (0, count))
    return out, count + nval, valid.sum(dtype=jnp.int32) > cap


def sweep_tets(verts, sdf, tets, max_tris: int = 2_000_000,
               tet_chunk: int = 1 << 21, cap: int = 1 << 19):
    """Explicit-tet marching sweep → (tri_soup [n,3,3] np, overflow).

    Chunks the tet list (one-shot [T,4,3] temporaries OOM v5e at 128³
    grids), accumulating compacted triangles on device; ONE host
    transfer at the end."""
    verts = jnp.asarray(verts)
    sdf = jnp.asarray(sdf)
    out = jnp.zeros((9, max_tris + cap), jnp.float32)
    count = jnp.int32(0)
    overflow = False
    for i in range(0, tets.shape[0], tet_chunk):
        chunk_arr = jnp.asarray(tets[i:i + tet_chunk])
        out, count, ovf = _compact_step(out, count, verts, sdf,
                                        chunk_arr, cap)
        overflow = overflow or bool(ovf)
    n = min(int(count), max_tris)
    soup = np.asarray(out[:, :n]).T.reshape(-1, 3, 3)
    return soup, overflow or int(count) > max_tris
