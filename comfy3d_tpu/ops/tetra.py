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


def _tet_triangles_t(posT, valT, insideT):
    """Vectorized per-tet triangle extraction, N-minor layout.

    posT: [4, 3, N] tet corner positions; valT: [4, N] field values
    (signed: >0 inside); insideT: [4, N] bool. Returns
    (trisT [2, 3, 3, N], tri_valid [2, N]). Orientation: normals point
    toward the *outside* (val<0) region.

    Every array keeps N as the trailing (lane) dimension: TPU tiles the
    two minormost dims to (8, 128), so an [N, 2, 3, 3] materialization
    pads the 3×3 minor block 57-64× (27.6 GB copy observed at N=6M when
    XLA's layout assignment picked it at 256³); with N minor the padding
    is ~1.0×.
    """
    case = (insideT[0].astype(jnp.int32)
            + 2 * insideT[1] + 4 * insideT[2] + 8 * insideT[3])   # [N]
    # table transposed so the gather lands N-minor: [2, 3, 16] → [2,3,N]
    tableT = jnp.asarray(np.ascontiguousarray(
        _CASE_TABLE.transpose(1, 2, 0)))
    counts = jnp.asarray(_CASE_COUNTS)        # [16]
    edges = _TET_EDGES                        # host constant [6, 2]

    # crossing point on every tet edge (mask invalid later)
    va = valT[edges[:, 0]]                    # [6, N]
    vb = valT[edges[:, 1]]
    denom = va - vb
    t = va / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    t = jnp.clip(t, 0.0, 1.0)
    pa = posT[edges[:, 0]]                    # [6, 3, N]
    pb = posT[edges[:, 1]]
    cross_pts = pa + t[:, None, :] * (pb - pa)

    tri_edges = tableT[:, :, case]            # [2, 3, N]
    safe = jnp.maximum(tri_edges, 0)
    # mask-accumulate selection over the 6 tet edges (elementwise; a
    # dynamic gather here would force layout copies)
    tris = jnp.zeros((2, 3, 3) + case.shape, posT.dtype)
    for e in range(6):
        m = (safe == e).astype(posT.dtype)[:, :, None, :]  # [2, 3, 1, N]
        tris = tris + m * cross_pts[e][None, None]         # ·[1,1,3,N]
    ntri = counts[case]                       # [N]
    tri_valid = jnp.stack([ntri >= 1, ntri >= 2], 0)       # [2, N]

    # outward orientation: flip if normal points toward the inside centroid
    w_in = insideT.astype(jnp.float32)                     # [4, N]
    c_in = (posT * w_in[:, None, :]).sum(0) / jnp.maximum(
        w_in.sum(0, keepdims=True), 1.0)                   # [3, N]
    e1 = tris[:, 1] - tris[:, 0]                           # [2, 3, N]
    e2 = tris[:, 2] - tris[:, 0]
    n = jnp.cross(e1, e2, axisa=1, axisb=1, axisc=1)       # [2, 3, N]
    to_in = c_in[None] - tris[:, 0]
    flip = (n * to_in).sum(1) > 0             # [2, N]; toward inside → flip
    tris = jnp.where(flip[:, None, None, :], tris[:, ::-1], tris)
    return tris, tri_valid


def _cells_to_tris(posT, valT, max_tris: int):
    """Active cells → compacted triangle soup.

    posT: [8, 3, K] cell corner positions; valT: [8, K] signed field
    (>0 inside). Returns (soup [max_tris, 3, 3], count, overflow) where
    count is the TRUE number of valid triangles (may exceed max_tris →
    overflow). One top_k over K*12 entries does the whole compaction —
    triangle order is irrelevant for a soup, so a full stable argsort
    (and the append-loop layout churn it forced) is unnecessary.
    """
    k_cells = valT.shape[1]
    # gather tet corners on the leading (8-wide) axis: stays N-minor
    tet_ids = _TETS.reshape(-1)                      # host constant [24]
    tp = posT[tet_ids].reshape(6, 4, 3, k_cells)     # [6, 4, 3, K]
    tv = valT[tet_ids].reshape(6, 4, k_cells)        # [6, 4, K]
    tpT = jnp.moveaxis(tp, 0, -2).reshape(4, 3, 6 * k_cells)
    tvT = jnp.moveaxis(tv, 0, -2).reshape(4, 6 * k_cells)
    tris, valid = _tet_triangles_t(tpT, tvT, tvT > 0)
    flatv = valid.reshape(-1)                        # [2·6K], slot-major
    count = flatv.sum(dtype=jnp.int32)
    k = min(max_tris, flatv.shape[0])
    _, order = jax.lax.top_k(flatv.astype(jnp.int32), k)
    # [2,3,3,N] → [9, 2N] column order matching flatv's (slot, tet)
    t9 = jnp.moveaxis(tris.reshape(2, 9, -1), 0, 1).reshape(9, -1)
    soup9 = jnp.take(t9, order, axis=1) \
        * flatv[order].astype(t9.dtype)[None, :]     # zero invalid
    soup = soup9.T.reshape(k, 3, 3)
    if k < max_tris:
        soup = jnp.pad(soup, ((0, max_tris - k), (0, 0), (0, 0)))
    return soup, jnp.minimum(count, max_tris), count > max_tris


@partial(jax.jit, static_argnames=("max_tris", "cell_cap"))
def marching_tets_grid(grid: jnp.ndarray, iso: float = 0.0,
                       origin=(-1.0, -1.0, -1.0), spacing=None,
                       max_tris: int = 200_000,
                       cell_cap: int | None = None):
    """Extract the iso-surface of a dense [X, Y, Z] field.

    `grid` is signed relative to `iso`: surface where grid == iso, inside
    where grid > iso (density convention; negate an SDF before calling).
    Returns (verts [max_tris, 3, 3] triangle soup, tri_count, overflow).

    Two-pass sparse design: (1) an elementwise crossing mask over all
    cells + one top_k compaction picks ≤cell_cap active cells; (2) the
    tet case machinery runs on active cells only, with a second top_k
    gathering valid triangles straight into the output. The previous
    per-z-slab append loop spent its time in layout copies/reshapes and
    32 stable argsorts (jax.profiler: 4.0 s warm @256³, of which the
    actual case logic was <0.5 s); this version is one fused pass.
    """
    if spacing is None:
        spacing = 2.0 / (grid.shape[0] - 1)
    origin = jnp.asarray(origin, jnp.float32)
    field = grid - iso
    ncx, ncy, ncz = (grid.shape[0] - 1, grid.shape[1] - 1,
                     grid.shape[2] - 1)
    ncells = ncx * ncy * ncz
    if cell_cap is None:
        # a crossing cell yields 1-12 triangles, typically ~2; /4 keeps
        # the [K*6, 4, 3] tet temporaries bounded (~300 MB at 2M tris)
        cell_cap = max(4096, max_tris // 4)
    cell_cap = min(cell_cap, ncells)

    # pass 1: crossing mask over all cells (elementwise) → top_k compact
    s = field > 0
    corner = [s[dx:dx + ncx, dy:dy + ncy, dz:dz + ncz]
              for dx, dy, dz in _CORNERS]
    any_in = corner[0]
    all_in = corner[0]
    for c in corner[1:]:
        any_in = any_in | c
        all_in = all_in & c
    crossing = (any_in & ~all_in).reshape(-1)
    n_active = crossing.sum(dtype=jnp.int32)
    _, cell_idx = jax.lax.top_k(crossing.astype(jnp.int32), cell_cap)

    # pass 2: gather corners of active cells, run the tet cases
    # (built K-minor from the start — see _tet_triangles_t layout note)
    ci = cell_idx // (ncy * ncz)
    cj = (cell_idx // ncz) % ncy
    ck = cell_idx % ncz
    valT = jnp.stack([field[ci + dx, cj + dy, ck + dz]
                      for dx, dy, dz in _CORNERS], 0)       # [8, K]
    baseT = jnp.stack([ci, cj, ck], 0).astype(jnp.float32)  # [3, K]
    posT = jnp.stack(
        [(baseT + jnp.asarray(c, jnp.float32)[:, None]) * spacing
         + origin[:, None] for c in _CORNERS], 0)           # [8, 3, K]

    soup, count, tri_ovf = _cells_to_tris(posT, valT, max_tris)
    return soup, count, tri_ovf | (n_active > cell_cap)


def weld(tri_soup: np.ndarray, tri_count: int, decimals: int = 6):
    """Host-side vertex weld: triangle soup → (v [Nv,3], f [Nf,3]).
    Counterpart of the index dedup trimesh does inside the reference's
    mesh-from-marching-cubes path.

    Fast path packs the quantized coordinates into one int64 key so the
    dedup is a 1-D np.unique (a single sort) — `np.unique(axis=0)` on
    the same 6M-row soup took 11.4 s host-side, the packed key ~0.5 s.
    Falls back to the row-wise unique only if the quantized range
    can't fit 63 bits (>2.9e5 distinct positions per axis at the
    default decimals=6 tolerance never does for unit-scale assets).
    """
    tris = np.asarray(tri_soup[:tri_count]).reshape(-1, 3)
    if len(tris) == 0:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32))
    q = np.round(tris * (10.0 ** decimals)).astype(np.int64)
    q -= q.min(0)
    spans = q.max(0) + 1
    bits = [int(s).bit_length() for s in spans]
    if sum(bits) <= 63:
        key = ((q[:, 0] << (bits[1] + bits[2]))
               | (q[:, 1] << bits[2]) | q[:, 2])
        uniq, first, inv = np.unique(key, return_index=True,
                                     return_inverse=True)
    else:   # huge coordinate range: row-wise unique (slow, exact)
        keys = np.round(tris, decimals)
        uniq_rows, inv = np.unique(keys, axis=0, return_inverse=True)
        order = np.arange(len(inv))
        first = np.full(len(uniq_rows), len(inv), np.int64)
        np.minimum.at(first, inv, order)
    v = tris[first].astype(np.float32)
    f = inv.reshape(-1, 3).astype(np.int32)
    # drop degenerate faces produced by welding
    keep = ((f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2])
            & (f[:, 0] != f[:, 2]))
    return v, f[keep]


@partial(jax.jit, static_argnames=("max_verts", "decimals"))
def weld_device(soup, count, max_verts: int, decimals: int = 6):
    """On-device vertex weld: soup [T,3,3] + count → compact mesh.

    Returns (v [max_verts, 3], f [T, 3] int32, nv, nf, overflow).
    Quantizes to 10^-decimals, lexsorts the quantized triples, marks
    run starts, and builds faces through the inverse permutation — all
    sorts/gathers stay in transposed point-minor layouts (row gathers
    of [N, 3] arrays pad the 3-wide minor dim to 128 on TPU).

    Motivation: the host round-trip weld moved the full triangle soup
    over the device tunnel (~7 MB/s measured — 4.5 s for a 32 MB soup)
    and spent 3.7 s in host np.unique; welding on device ships only
    the ~3× smaller final mesh.
    """
    T = soup.shape[0]
    pts = soup.reshape(-1, 3)                      # [3T, 3]
    valid = jnp.repeat(jnp.arange(T) < count, 3)
    scale = 10.0 ** decimals
    q = jnp.round(pts * scale).astype(jnp.int32)
    big = jnp.int32(2 ** 31 - 1)
    q = jnp.where(valid[:, None], q, big)          # invalid sorts last
    order = jnp.lexsort((q[:, 2], q[:, 1], q[:, 0]))
    q3 = q.T                                       # [3, 3T]
    qs = jnp.take(q3, order, axis=1)               # sorted, [3, 3T]
    first = jnp.concatenate([
        jnp.ones((1,), bool),
        jnp.any(qs[:, 1:] != qs[:, :-1], axis=0)])
    first = first & (qs[0] != big)
    vid_sorted = jnp.cumsum(first.astype(jnp.int32)) - 1
    nv = first.sum(dtype=jnp.int32)

    # representative original point index per unique vertex: the run
    # START only — lexsort is stable, so the run's first entry carries
    # the MINIMAL original soup index, matching host `weld`'s
    # first-occurrence pick bitwise (duplicates from different tets can
    # differ in the last ulp). Non-start entries are routed
    # out-of-bounds so mode="drop" discards them.
    widx = jnp.where(first,
                     jnp.minimum(vid_sorted, max_verts - 1), max_verts)
    vtab = jnp.zeros((max_verts,), jnp.int32)
    vtab = vtab.at[widx].set(order, mode="drop")
    v_out = jnp.take(pts.T, vtab, axis=1).T        # [max_verts, 3]
    v_out = v_out * (jnp.arange(max_verts) < nv)[:, None]

    # faces via the inverse permutation of the sort
    inv = jnp.zeros((3 * T,), jnp.int32).at[order].set(vid_sorted)
    f = inv.reshape(T, 3)
    valid_f = ((jnp.arange(T) < count)
               & (f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2])
               & (f[:, 0] != f[:, 2]))
    _, forder = jax.lax.top_k(valid_f.astype(jnp.int32), T)
    f = (jnp.take(f.T, forder, axis=1)
         * valid_f[forder].astype(jnp.int32)[None, :]).T
    nf = valid_f.sum(dtype=jnp.int32)
    return v_out, f, nv, nf, nv > max_verts


def _soup_to_host(soup, count):
    """Device soup [cap,3,3] + device count → host [n,3,3].

    Slices to the true count ON DEVICE before transferring: the tunnel
    to the remote chip moves ~11 MB/s, so shipping the 72 MB fixed-cap
    buffer cost 6.4 s where the real 200k-triangle payload is 7 MB."""
    n = int(count)
    return np.asarray(soup[:n]) if n else np.zeros((0, 3, 3), np.float32)


def extract_isosurface_device(grid, iso: float = 0.0,
                              bounds=(-1.0, 1.0),
                              max_tris: int = 400_000,
                              on_overflow: str = "retry"):
    """Sweep + weld entirely on device (single-block grids).

    Returns (v [cap, 3], f [cap2, 3], nv, nf) as DEVICE arrays — the
    caller slices/transfers (or queries vertex colors first, saving a
    host round-trip). Retries with doubled capacity on overflow like
    `extract_isosurface`.
    """
    r = grid.shape[0]
    spacing = (bounds[1] - bounds[0]) / (r - 1)
    cap = max_tris
    for attempt in range(4):
        last = attempt == 3
        soup, count, overflow = marching_tets_grid(
            jnp.asarray(grid), iso=iso, origin=(bounds[0],) * 3,
            spacing=spacing, max_tris=cap)
        # check the sweep BEFORE welding: welding an overflowed soup is
        # wasted peak memory, and the previous attempt's buffers must
        # be dead before the doubled-capacity retry allocates (the
        # escalation to 8M tris otherwise OOMs a 16 GB chip — the two
        # generations of soup+weld buffers overlap)
        if bool(overflow):
            if on_overflow == "raise":
                raise RuntimeError(
                    f"marching tets overflow: capacity {cap} hit")
            if on_overflow == "retry" and not last:
                del soup, count, overflow
                cap *= 2
                continue
            import warnings
            warnings.warn(
                f"marching tets overflow: capacity {cap} hit (clipped)")
        v, f, nv, nf, v_ovf = weld_device(soup, count, max_verts=cap)
        del soup
        if not bool(v_ovf):
            return v, f, nv, nf
        if on_overflow == "raise":
            raise RuntimeError(
                f"weld overflow: vertex capacity {cap} hit")
        if on_overflow != "retry" or last:
            import warnings
            warnings.warn(f"weld overflow: vertex capacity {cap} hit")
            return v, f, jnp.minimum(nv, cap), nf
        del v, f, nv, nf, v_ovf
        cap *= 2
    raise AssertionError  # unreachable


def extract_isosurface(grid, iso: float = 0.0, bounds=(-1.0, 1.0),
                       max_tris: int = 400_000, max_block: int = 288,
                       on_overflow: str = "retry"):
    """Grid → welded Mesh (host hop at the stage boundary).

    Counterpart of reference `marching_cubes_density_to_mesh`
    (`mesh_utils.py:488-519`) minus the pymeshlab clean (see native/).
    Grids larger than `max_block` per axis are swept in overlapping
    y/z-partitions (the remote AOT compiler rejects ≥320³ one-shot
    programs), then welded into one mesh.

    on_overflow: "retry" re-runs with doubled capacity (up to 8×,
    paying one fresh compile per doubling), "raise" errors, "warn"
    keeps the clipped soup (old behavior).
    """
    from ..core.mesh import Mesh
    r = grid.shape[0]
    spacing = (bounds[1] - bounds[0]) / (r - 1)

    def sweep(sub, org, cap):
        return marching_tets_grid(jnp.asarray(sub), iso=iso, origin=org,
                                  spacing=spacing, max_tris=cap)

    def sweep_retry(sub, org, what):
        cap = max_tris
        for attempt in range(4):
            soup, count, overflow = sweep(sub, org, cap)
            if not bool(overflow):
                return _soup_to_host(soup, count)
            if on_overflow == "raise":
                raise RuntimeError(
                    f"marching tets overflow: capacity {cap} hit ({what})")
            if on_overflow != "retry" or attempt == 3:
                import warnings
                warnings.warn(
                    f"marching tets overflow: capacity {cap} hit ({what})")
                return _soup_to_host(soup, count)
            cap *= 2
        raise AssertionError  # unreachable

    if r <= max_block:
        allsoup = sweep_retry(grid, (bounds[0],) * 3, "single block")
    else:
        grid = np.asarray(grid)
        nblocks = -(-(r - 1) // (max_block - 1))
        soups = []
        for bj in range(nblocks):
            y0 = bj * (max_block - 1)
            y1 = min(y0 + max_block, r)
            for bi in range(nblocks):
                z0 = bi * (max_block - 1)
                z1 = min(z0 + max_block, r)
                soups.append(sweep_retry(
                    grid[:, y0:y1, z0:z1],
                    (bounds[0], bounds[0] + y0 * spacing,
                     bounds[0] + z0 * spacing), f"block {bj},{bi}"))
        allsoup = (np.concatenate(soups) if soups
                   else np.zeros((0, 3, 3), np.float32))
    v, f = weld(allsoup, len(allsoup))
    return Mesh(v=v, f=f)


@partial(jax.jit, static_argnames=("res", "max_tris", "cell_cap"))
def marching_tets_deformed(v_def: jnp.ndarray, sdf: jnp.ndarray,
                           res: int, max_tris: int = 200_000,
                           cell_cap: int | None = None):
    """Sparse marching tets over a DEFORMED regular grid.

    v_def: [res³, 3] deformed vertex positions (grid topology intact);
    sdf: [res³] signed field (>0 inside). The InstantMesh/FlexiCubes
    extract path (ref `lrm_mesh.py:340`) deforms grid vertices before
    extraction — connectivity stays regular, so the same crossing-mask
    + top_k cell compaction applies, with corner positions gathered
    from `v_def` instead of computed from indices. Returns
    (soup [max_tris, 3, 3], count, overflow). Gradients flow into
    v_def/sdf through the gathered edge interpolation (topology is
    stop-gradient, as in `marching_tets_diff`).
    """
    nc = res - 1
    field = sdf.reshape(res, res, res)
    if cell_cap is None:
        cell_cap = max(4096, max_tris // 4)
    cell_cap = min(cell_cap, nc ** 3)

    s = field > 0
    corner = [s[dx:dx + nc, dy:dy + nc, dz:dz + nc]
              for dx, dy, dz in _CORNERS]
    any_in = corner[0]
    all_in = corner[0]
    for c in corner[1:]:
        any_in = any_in | c
        all_in = all_in & c
    crossing = (any_in & ~all_in).reshape(-1)
    n_active = crossing.sum(dtype=jnp.int32)
    _, cell_idx = jax.lax.top_k(crossing.astype(jnp.int32), cell_cap)

    ci = cell_idx // (nc * nc)
    cj = (cell_idx // nc) % nc
    ck = cell_idx % nc
    vids = jnp.stack([((ci + dx) * res + (cj + dy)) * res + (ck + dz)
                      for dx, dy, dz in _CORNERS], 0)      # [8, K]
    posT = v_def.T[:, vids].transpose(1, 0, 2)             # [8, 3, K]
    valT = sdf[vids]                                       # [8, K]
    soup, count, tri_ovf = _cells_to_tris(posT, valT, max_tris)
    return soup, count, tri_ovf | (n_active > cell_cap)


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
    tris, valid = _marching_tets_diff_t(verts, sdf, tets)
    # transpose back to the row-major public contract; order (t, slot)
    return jnp.moveaxis(tris, -1, 0).reshape(-1, 3, 3), \
        valid.T.reshape(-1)


def _marching_tets_diff_t(verts, sdf, tets):
    """Transposed core of `marching_tets_diff`: returns
    (trisT [2, 3, 3, T], valid [2, T]) keeping T lane-minor."""
    tvT = sdf[tets.T]                    # [4, T]
    tpT = verts.T[:, tets.T].transpose(1, 0, 2)   # [4, 3, T]
    inside = jax.lax.stop_gradient(tvT) > 0
    return _tet_triangles_t(tpT, tvT, inside)


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
    tris, valid2 = _marching_tets_diff_t(verts, sdf, tets)
    t9 = jnp.moveaxis(tris.reshape(2, 9, -1), 0, 1).reshape(9, -1)
    valid = valid2.reshape(-1)
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
