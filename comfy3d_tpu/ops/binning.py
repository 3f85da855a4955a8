"""Tile binning: the shared front half of every rasterizer in this framework.

The reference delegates rasterization to two CUDA codebases — the 3DGS tile
rasterizer (diff-gaussian-rasterization, used at
`MVs_Algorithms/GaussianSplatting/main_3DGS_renderer.py:840-948`) and
nvdiffrast (`MVs_Algorithms/DiffRastMesh/diff_mesh_renderer.py:46-49`) — both
of which are built on the same idea: bin primitives into screen tiles, then
shade each tile against its (short) primitive list. On TPU we reproduce that
structure with XLA-friendly static shapes:

  1. per-primitive screen bbox → covered-tile count (capped at a static
     `max_tiles_per_prim`);
  2. exclusive cumsum → scatter (tile_key, depth_key, prim_id) pairs into a
     fixed-capacity pair buffer;
  3. one lexicographic `jax.lax.sort` over (tile, depth) — this replaces the
     CUDA radix sort and is the single O(P log P) step;
  4. `searchsorted` per tile → padded per-tile primitive lists.

Everything downstream (mesh z-test, GS alpha compositing) consumes the
[num_tiles, max_per_tile] list. The same layout feeds the Pallas per-tile
shading kernels. PAPERS.md tile-grouping literature (GS-TG) motivates the
sort-once/share-across-tiles design.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

TILE = 16  # pixels per tile side; 16x16=256 lanes matches VPU-friendly tiling


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TileBins:
    """Per-tile padded primitive lists."""
    prim_idx: jnp.ndarray     # [num_tiles, max_per_tile] int32 (clamped)
    valid: jnp.ndarray        # [num_tiles, max_per_tile] bool
    count: jnp.ndarray        # [num_tiles] int32 (pre-truncation count)
    overflow: jnp.ndarray     # [] bool — any tile or pair-buffer truncation


def num_tiles(height: int, width: int) -> tuple[int, int]:
    return -(-height // TILE), -(-width // TILE)


@partial(jax.jit, static_argnames=("grid_h", "grid_w", "pair_capacity",
                                   "max_per_tile", "max_tiles_per_prim"))
def bin_primitives(bbox_min: jnp.ndarray, bbox_max: jnp.ndarray,
                   depth: jnp.ndarray, active: jnp.ndarray,
                   grid_h: int, grid_w: int,
                   pair_capacity: int, max_per_tile: int,
                   max_tiles_per_prim: int = 64) -> TileBins:
    """Bin primitives into screen tiles, depth-sorted within each tile.

    Args:
      bbox_min / bbox_max: [N, 2] pixel-space (x, y) bounds per primitive.
      depth: [N] sort key within a tile (front first).
      active: [N] bool; culled primitives produce no pairs.
      grid_h, grid_w: tile-grid dims (see `num_tiles`).
      pair_capacity: static size of the expanded (tile, prim) pair buffer.
      max_per_tile: static cap on the shading list per tile.
      max_tiles_per_prim: static cap on the tile footprint per primitive;
        primitives covering more tiles are truncated and flagged.
    """
    n = bbox_min.shape[0]
    t = jnp.int32(TILE)

    tx0 = jnp.clip(jnp.floor(bbox_min[:, 0] / t), 0, grid_w - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor(bbox_min[:, 1] / t), 0, grid_h - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor(bbox_max[:, 0] / t), 0, grid_w - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor(bbox_max[:, 1] / t), 0, grid_h - 1).astype(jnp.int32)
    # fully offscreen primitives
    offscreen = ((bbox_max[:, 0] < 0) | (bbox_max[:, 1] < 0)
                 | (bbox_min[:, 0] >= grid_w * TILE)
                 | (bbox_min[:, 1] >= grid_h * TILE))
    active = active & ~offscreen

    w = tx1 - tx0 + 1
    h = ty1 - ty0 + 1
    footprint = w * h
    prim_overflow = active & (footprint > max_tiles_per_prim)
    k = jnp.where(active, jnp.minimum(footprint, max_tiles_per_prim), 0)

    offsets = jnp.cumsum(k) - k                       # exclusive prefix sum
    total = offsets[-1] + k[-1] if n else jnp.int32(0)
    buf_overflow = total > pair_capacity

    # scatter pairs: one masked scatter per footprint slot (static loop)
    pair_tile = jnp.full((pair_capacity,), grid_h * grid_w, jnp.int32)  # sentinel
    pair_depth = jnp.full((pair_capacity,), jnp.inf, jnp.float32)
    pair_prim = jnp.zeros((pair_capacity,), jnp.int32)
    prim_ids = jnp.arange(n, dtype=jnp.int32)

    def body(j, state):
        p_tile, p_depth, p_prim = state
        valid = j < k
        dy = jnp.where(w > 0, j // w, 0)
        dx = jnp.where(w > 0, j % w, 0)
        tile = (ty0 + dy) * grid_w + (tx0 + dx)
        dst = jnp.where(valid, offsets + j, pair_capacity)  # OOB drops
        p_tile = p_tile.at[dst].set(jnp.where(valid, tile, 0),
                                    mode="drop")
        p_depth = p_depth.at[dst].set(
            jnp.where(valid, depth.astype(jnp.float32), jnp.inf),
            mode="drop")
        p_prim = p_prim.at[dst].set(prim_ids, mode="drop")
        return p_tile, p_depth, p_prim

    pair_tile, pair_depth, pair_prim = jax.lax.fori_loop(
        0, max_tiles_per_prim, body, (pair_tile, pair_depth, pair_prim))

    # lexicographic sort by (tile, depth) — the radix-sort replacement
    pair_tile, pair_depth, pair_prim = jax.lax.sort(
        (pair_tile, pair_depth, pair_prim), num_keys=2)

    # per-tile ranges
    ntiles = grid_h * grid_w
    tile_ids = jnp.arange(ntiles, dtype=jnp.int32)
    starts = jnp.searchsorted(pair_tile, tile_ids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(pair_tile, tile_ids, side="right").astype(jnp.int32)
    counts = ends - starts

    slot = jnp.arange(max_per_tile, dtype=jnp.int32)
    gather_idx = starts[:, None] + slot[None, :]
    valid = slot[None, :] < jnp.minimum(counts, max_per_tile)[:, None]
    gather_idx = jnp.clip(gather_idx, 0, pair_capacity - 1)
    prim_idx = pair_prim[gather_idx]

    tile_overflow = jnp.any(counts > max_per_tile)
    overflow = (jnp.any(prim_overflow) | buf_overflow | tile_overflow)
    return TileBins(prim_idx=prim_idx, valid=valid, count=counts,
                    overflow=overflow)


def tile_pixel_centers(grid_h: int, grid_w: int) -> jnp.ndarray:
    """[num_tiles, TILE*TILE, 2] pixel-center coordinates per tile."""
    ty, tx = jnp.meshgrid(jnp.arange(grid_h), jnp.arange(grid_w),
                          indexing="ij")
    py, px = jnp.meshgrid(jnp.arange(TILE, dtype=jnp.float32),
                          jnp.arange(TILE, dtype=jnp.float32), indexing="ij")
    cx = (tx.reshape(-1, 1) * TILE + px.reshape(-1)[None, :]) + 0.5
    cy = (ty.reshape(-1, 1) * TILE + py.reshape(-1)[None, :]) + 0.5
    return jnp.stack([cx, cy], axis=-1).astype(jnp.float32)


def tiles_to_image(tile_vals: jnp.ndarray, grid_h: int, grid_w: int,
                   height: int, width: int) -> jnp.ndarray:
    """[num_tiles, TILE*TILE, C] (or [num_tiles, TILE*TILE]) → [H, W, C]."""
    squeeze = tile_vals.ndim == 2
    if squeeze:
        tile_vals = tile_vals[..., None]
    c = tile_vals.shape[-1]
    img = tile_vals.reshape(grid_h, grid_w, TILE, TILE, c)
    img = img.transpose(0, 2, 1, 3, 4).reshape(grid_h * TILE, grid_w * TILE, c)
    img = img[:height, :width]
    return img[..., 0] if squeeze else img
