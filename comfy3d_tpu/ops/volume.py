"""Single-dispatch volume decode + point query for field pipelines.

The TripoSR / InstantMesh / Hunyuan-V1 extract paths all decode a dense
[R, R, R] field by looping query chunks from Python — through the remote
device tunnel each dispatch costs ~35 ms round-trip, so a 256³ decode in
64 chunks spends >2 s on dispatch alone (measured; the device compute is
~0.6 s). These helpers fold the chunk loop inside ONE jit (`lax.map`),
and offer the coarse-to-fine band refinement the reference uses for its
volume decoders (Hunyuan3D_V2 `volume_decoders.py:185-280`
hierarchical/FlashVDM; applied here to the triplane-NeRF grids per the
same surface-area argument — only O(R²) of the O(R³) cells are near the
iso surface).

`query_fn(ctx, pts [N, 3]) -> vals [N]` must be jit-traceable and
*stable in identity* across calls (a module-level function, not a fresh
lambda — it is a static jit argument, so a new identity retraces).
`ctx` is an arbitrary pytree of arrays (params, triplanes, ...)
threaded through as a DYNAMIC argument — closing over device arrays
instead would bake them into the executable as constants and recompile
on every new scene.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def grid_points(resolution: int, bounds, dtype=jnp.float32):
    """[R³, 3] lattice over the cube, ij-ordered (x major).

    `bounds` may be a scalar b (→ [-b, b]) or an (lo, hi) tuple, and is
    deliberately a RUNTIME value: with a purely static lattice XLA
    constant-folds the full R³×3 meshgrid at compile time (145 s compile
    and a 200 MB executable constant at 257³, measured on CPU)."""
    lo, hi = (bounds if isinstance(bounds, (tuple, list))
              else (-bounds, bounds))
    lin = jnp.linspace(jnp.float32(lo), jnp.float32(hi), resolution,
                       dtype=dtype)
    gx, gy, gz = jnp.meshgrid(lin, lin, lin, indexing="ij")
    return jnp.stack([gx, gy, gz], -1).reshape(-1, 3)


def query_chunked(query_fn, ctx, pts, chunk: int = 1 << 20):
    """Apply `query_fn(ctx, ·)` over [N, ...] points in one dispatch.

    Pads N up to a chunk multiple (constant shape → one compile per
    (chunk, n_chunks) pair) and runs the chunk loop inside jit via
    lax.map. Output keeps query_fn's trailing shape.
    """
    pts = jnp.asarray(pts)
    n = pts.shape[0]
    if n == 0:
        out = jax.eval_shape(query_fn, ctx, pts)
        return jnp.zeros(out.shape, out.dtype)
    chunk = min(chunk, max(n, 1))
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    if pad:
        pts = jnp.concatenate([pts, jnp.zeros((pad,) + pts.shape[1:],
                                              pts.dtype)])
    rows = pts.reshape((n_chunks, chunk) + pts.shape[1:])
    if n_chunks == 1:
        out = query_fn(ctx, rows[0])[None]
    else:
        # a fresh `lambda r: query_fn(ctx, r)` per call defeats jax's
        # trace cache — lax.map would retrace + recompile EVERY call
        # (measured 4.8 s/call vs 0.25 s steady-state at 4×262144).
        # Cache one jitted mapper per query_fn; jit then caches per
        # (chunk, n_chunks) shape.
        out = _mapped(query_fn)(ctx, rows)
    return out.reshape((n_chunks * chunk,) + out.shape[2:])[:n]


_MAP_CACHE = {}


def _mapped(query_fn):
    fn = _MAP_CACHE.get(query_fn)
    if fn is None:
        fn = jax.jit(lambda ctx, rows: jax.lax.map(
            lambda r: query_fn(ctx, r), rows))
        _MAP_CACHE[query_fn] = fn
    return fn


def _upsample2_corner(g):
    """[R]³ → [2R-1]³ corner-aligned linear upsample: even indices copy
    the coarse lattice exactly (fine vert 2i == coarse vert i), odd are
    midpoints. `jax.image.resize` is half-pixel-centered and would shift
    the lattice, breaking the '2*ci + offset' band indexing."""
    def up1(x, axis):
        a = jnp.moveaxis(x, axis, 0)
        mid = 0.5 * (a[:-1] + a[1:])
        out = jnp.zeros((2 * a.shape[0] - 1,) + a.shape[1:], a.dtype)
        out = out.at[::2].set(a).at[1::2].set(mid)
        return jnp.moveaxis(out, 0, axis)
    return up1(up1(up1(g, 0), 1), 2)


@partial(jax.jit, static_argnames=("query_fn", "resolution", "chunk"))
def _decode_dense(query_fn, ctx, resolution: int, bounds: float,
                  chunk: int = 1 << 20):
    pts = grid_points(resolution, bounds)
    vals = query_chunked(query_fn, ctx, pts, min(chunk, pts.shape[0]))
    return vals.reshape(resolution, resolution, resolution)


@partial(jax.jit, static_argnames=("query_fn", "resolution",
                                   "coarse_resolution", "chunk",
                                   "band_cells"))
def _decode_hier(query_fn, ctx, resolution: int,
                 coarse_resolution: int, bounds: float, iso: float,
                 chunk: int, band_cells: tuple):
    """Coarse dense grid + per-level top-K band refinement, all in one
    dispatch. Non-band verts keep upsampled values — exact enough away
    from the surface, where the extractor never looks. Vertex-count
    convention: an R-vert grid has R-1 cells; each level doubles cells
    (fine verts = 2R-1)."""
    pts = grid_points(coarse_resolution, bounds)
    vals = query_chunked(query_fn, ctx, pts, min(chunk, pts.shape[0]))
    grid = vals.reshape((coarse_resolution,) * 3)

    levels = len(band_cells)
    for lvl in range(levels):
        rv = grid.shape[0]               # current verts per axis
        nc = rv - 1                      # current cells per axis
        k = band_cells[lvl]
        g = jnp.abs(grid - iso)
        cm = jnp.minimum
        corner_min = cm(cm(cm(g[:-1, :-1, :-1], g[1:, :-1, :-1]),
                           cm(g[:-1, 1:, :-1], g[:-1, :-1, 1:])),
                        cm(cm(g[1:, 1:, :-1], g[1:, :-1, 1:]),
                           cm(g[:-1, 1:, 1:], g[1:, 1:, 1:])))
        _, cell_idx = jax.lax.top_k(-corner_min.reshape(-1), k)
        ci = cell_idx // (nc * nc)
        cj = (cell_idx // nc) % nc
        ck = cell_idx % nc

        fine = _upsample2_corner(grid)   # [2rv-1]³
        rf = 2 * rv - 1
        off = jnp.arange(3)
        oi, oj, ok = jnp.meshgrid(off, off, off, indexing="ij")
        fi = (2 * ci[:, None] + oi.reshape(-1)).reshape(-1)   # [k*27]
        fj = (2 * cj[:, None] + oj.reshape(-1)).reshape(-1)
        fk = (2 * ck[:, None] + ok.reshape(-1)).reshape(-1)
        step = 2.0 * bounds / (rf - 1)
        pts = (jnp.stack([fi, fj, fk], -1).astype(jnp.float32) * step
               - bounds)
        vals = query_chunked(query_fn, ctx, pts,
                             min(chunk, pts.shape[0]))
        grid = fine.at[fi, fj, fk].set(vals)
    return grid


_COARSE_CANDIDATES = (65, 49, 33, 25, 17)


def hier_plan(resolution: int, coarse_resolution: int = 65):
    """Pick (coarse_res, levels) so that resolution-1 = (coarse-1)·2^L.
    Returns None if no candidate chain reaches `resolution` exactly."""
    for rc in (coarse_resolution,) + _COARSE_CANDIDATES:
        nc, n = rc - 1, resolution - 1
        if n > nc and n % nc == 0:
            ratio = n // nc
            if ratio & (ratio - 1) == 0:
                return rc, int(np.log2(ratio))
    return None


def decode_grid(query_fn, ctx, resolution: int, bounds: float,
                iso: float = 0.0, chunk: int = 1 << 20,
                coarse_resolution: int = 65, band_mult: float = 3.0):
    """[R, R, R] field decode; hierarchical when a coarse chain exists
    (R-1 = (rc-1)·2^L for some candidate rc), dense otherwise.

    band_mult scales the per-level refinement band: K = band_mult·n²
    cells at an n³-cell level (surface-area scaling). Padded/duplicate
    selections merely re-decode correct values; an undersized band
    leaves upsampled (not wrong-sign, just smoother) values behind.
    """
    r = int(resolution)
    plan = hier_plan(r, coarse_resolution)
    if plan is not None:
        rc, levels = plan
        band = []
        for lvl in range(levels):
            n = (rc - 1) << lvl          # cells at this level
            band.append(int(min(n ** 3, max(4096,
                                            band_mult * (2 * n) ** 2))))
        return _decode_hier(query_fn, ctx, r, rc,
                            jnp.float32(bounds), jnp.float32(iso),
                            chunk, tuple(band))
    return _decode_dense(query_fn, ctx, r, jnp.float32(bounds), chunk)
