"""Sparse voxel tensor ops (TRELLIS backend, TPU-native).

Role of the reference's spconv/torchsparse backend
(`Gen_3D_Modules/TRELLIS/trellis/modules/sparse/`): submanifold sparse
3D convolution, pooling down/upsample, subdivision, and masked attention
over voxel token sets.

TPU design (SURVEY.md §2.6 E3 "gather-GEMM on padded neighbor lists"):

  * `SparseVoxels` is a fixed-capacity padded pytree — feats [N, C],
    coords [N, 4] int32 (batch, x, y, z), mask [N]. All shapes static;
    row count never changes inside jit, only the mask does.
  * Submanifold conv: a dense [res³+1] index grid is scattered once per
    resolution (≤ 64³ ints = 1 MB), neighbor rows are gathered for all
    27 taps, and the conv is ONE einsum [N,27,Ci]×[27,Ci,Co] — all
    FLOPs land on the MXU instead of spconv's scatter kernels.
  * Down/upsample mirror the reference's exact-inverse contract
    (`sparse/spatial.py:22-82`): downsample caches (child coords, child→
    parent index) so upsample restores the original voxel set.
  * Attention: the padded token set runs through
    `jax.nn.dot_product_attention` with a mask bias — "full" mode; swin
    (shifted-window) mode buckets voxels into static window slots.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SparseVoxels:
    feats: jnp.ndarray        # [N, C] float
    coords: jnp.ndarray       # [N, 4] int32 (batch, x, y, z)
    mask: jnp.ndarray         # [N] bool

    @property
    def capacity(self) -> int:
        return self.feats.shape[0]

    def replace_feats(self, feats) -> "SparseVoxels":
        return SparseVoxels(feats, self.coords, self.mask)

    @staticmethod
    def from_dense_occupancy(occ: np.ndarray, capacity: int,
                             feats: Optional[np.ndarray] = None
                             ) -> "SparseVoxels":
        """occ [R, R, R] bool → padded voxel set (host-side helper)."""
        xyz = np.argwhere(occ).astype(np.int32)
        n = min(len(xyz), capacity)
        coords = np.zeros((capacity, 4), np.int32)
        coords[:n, 1:] = xyz[:n]
        mask = np.zeros((capacity,), bool)
        mask[:n] = True
        c = feats.shape[-1] if feats is not None else 1
        f = np.zeros((capacity, c), np.float32)
        if feats is not None:
            f[:n] = feats[tuple(xyz[:n].T)]
        else:
            f[:n] = 1.0
        return SparseVoxels(jnp.asarray(f), jnp.asarray(coords),
                            jnp.asarray(mask))


def _linearize(coords, mask, res: int):
    """[N, 4] → linear cell id in [0, res³); masked rows → res³ (dump)."""
    x, y, z = coords[:, 1], coords[:, 2], coords[:, 3]
    lin = (x * res + y) * res + z
    return jnp.where(mask, lin, res ** 3)


def index_grid(st: SparseVoxels, res: int) -> jnp.ndarray:
    """[res³ + 1] int32: cell id → row index (or -1). Batch size 1."""
    lin = _linearize(st.coords, st.mask, res)
    grid = jnp.full((res ** 3 + 1,), -1, jnp.int32)
    rows = jnp.arange(st.capacity, dtype=jnp.int32)
    return grid.at[lin].set(jnp.where(st.mask, rows, -1))


_OFFSETS3 = np.stack(np.meshgrid(*( [np.arange(-1, 2)] * 3 ),
                                 indexing="ij"), -1).reshape(-1, 3)


def neighbor_rows(st: SparseVoxels, res: int,
                  grid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """[N, 27] row index of each 3³ neighbor (-1 if absent)."""
    if grid is None:
        grid = index_grid(st, res)
    off = jnp.asarray(_OFFSETS3, jnp.int32)                 # [27, 3]
    xyz = st.coords[:, 1:][:, None, :] + off[None]          # [N, 27, 3]
    inb = jnp.all((xyz >= 0) & (xyz < res), axis=-1) & st.mask[:, None]
    lin = (xyz[..., 0] * res + xyz[..., 1]) * res + xyz[..., 2]
    lin = jnp.where(inb, lin, res ** 3)
    return grid[lin]


def subm_conv3d(st: SparseVoxels, kernel: jnp.ndarray,
                bias: Optional[jnp.ndarray], res: int,
                grid: Optional[jnp.ndarray] = None) -> SparseVoxels:
    """Submanifold 3×3×3 conv: outputs only at input sites.

    kernel [3, 3, 3, Cin, Cout] (spatial layout: kernel[di+1, dj+1,
    dk+1] weights the neighbor at offset (di, dj, dk))."""
    nbr = neighbor_rows(st, res, grid)                      # [N, 27]
    valid = (nbr >= 0)[..., None]
    gathered = st.feats[jnp.clip(nbr, 0)] * valid           # [N, 27, Ci]
    w = kernel.reshape(27, kernel.shape[-2], kernel.shape[-1])
    out = jnp.einsum("nki,kio->no", gathered, w)
    if bias is not None:
        out = out + bias
    out = out * st.mask[:, None]
    return st.replace_feats(out)


def downsample2(st: SparseVoxels, res: int
                ) -> Tuple[SparseVoxels, dict]:
    """Factor-2 average pooling (sparse/spatial.py:22-57). Returns the
    pooled set + the cache that makes `upsample2` its exact inverse."""
    n = st.capacity
    pres = res // 2
    pcoords = jnp.concatenate([st.coords[:, :1], st.coords[:, 1:] // 2],
                              axis=1)
    code = _linearize(pcoords, st.mask, pres)               # [N]
    dump = pres ** 3
    uniq = jnp.unique(code, size=n, fill_value=dump)        # sorted [N]
    idx = jnp.searchsorted(uniq, code).astype(jnp.int32)    # child→parent
    pmask = uniq < dump
    counts = jnp.zeros((n,)).at[idx].add(st.mask.astype(jnp.float32))
    sums = jnp.zeros((n, st.feats.shape[1])).at[idx].add(
        st.feats * st.mask[:, None])
    pfeats = sums / jnp.maximum(counts, 1.0)[:, None]
    pfeats = pfeats * pmask[:, None]
    ux = uniq // (pres * pres)
    uy = (uniq // pres) % pres
    uz = uniq % pres
    new_coords = jnp.stack([jnp.zeros_like(ux), ux, uy, uz], axis=1)
    new_coords = (new_coords * pmask[:, None]).astype(jnp.int32)
    parent = SparseVoxels(pfeats, new_coords, pmask)
    cache = {"idx": idx, "coords": st.coords, "mask": st.mask}
    return parent, cache


def upsample2(st: SparseVoxels, cache: dict) -> SparseVoxels:
    """Nearest-neighbor unpooling back to the cached child voxel set."""
    feats = st.feats[cache["idx"]] * cache["mask"][:, None]
    return SparseVoxels(feats, cache["coords"], cache["mask"])


def subdivide(st: SparseVoxels) -> SparseVoxels:
    """Each voxel → its 8 children at 2× resolution
    (sparse/spatial.py:85-112). Capacity grows 8×."""
    off = jnp.asarray(np.stack(np.meshgrid(*([np.arange(2)] * 3),
                                           indexing="ij"),
                               -1).reshape(-1, 3), jnp.int32)
    xyz = st.coords[:, 1:] * 2
    new_xyz = (xyz[:, None, :] + off[None]).reshape(-1, 3)
    b = jnp.repeat(st.coords[:, :1], 8, axis=0)
    new_coords = jnp.concatenate([b, new_xyz], axis=1)
    new_feats = jnp.repeat(st.feats, 8, axis=0)
    new_mask = jnp.repeat(st.mask, 8, axis=0)
    return SparseVoxels(new_feats, new_coords, new_mask)


def masked_attention(q, k, v, mask_q, mask_kv):
    """[N, H, D] padded token attention; invalid keys get -1e9 bias."""
    bias = jnp.where(mask_kv[None, None, None, :], 0.0, -1e9)
    out = jax.nn.dot_product_attention(q[None], k[None], v[None],
                                       bias=bias)[0]
    return out * mask_q[:, None, None]


def swin_partition(st: SparseVoxels, res: int, window: int,
                   shift: Tuple[int, int, int] = (0, 0, 0)):
    """Bucket voxels into static [n_windows, window³] slots for shifted-
    window attention (role of sparse/attention/windowed_attn.py).

    Returns (slot_of_row [N], row_of_slot [W, S]) where W = number of
    windows and S = window³ slot capacity. Overfull windows drop excess
    voxels from attention (they still ride residual paths)."""
    nw1 = -(-res // window) + (1 if any(shift) else 0)
    s = jnp.asarray(shift, jnp.int32)
    xyz = st.coords[:, 1:] + s
    wid3 = xyz // window
    win = (wid3[:, 0] * nw1 + wid3[:, 1]) * nw1 + wid3[:, 2]
    nwin = nw1 ** 3
    win = jnp.where(st.mask, win, nwin)
    cap = window ** 3
    # rank within window via sorted order
    order = jnp.argsort(win)
    win_sorted = win[order]
    pos_in_win = jnp.arange(st.capacity) - jnp.searchsorted(
        win_sorted, win_sorted, side="left")
    slot_sorted = win_sorted * cap + pos_in_win
    slot = jnp.zeros((st.capacity,), jnp.int32).at[order].set(
        slot_sorted.astype(jnp.int32))
    row_of_slot = jnp.full((nwin * cap + cap,), -1, jnp.int32)
    keep = win_sorted < nwin
    row_of_slot = row_of_slot.at[
        jnp.where(keep, slot_sorted, nwin * cap)].set(
        jnp.where(keep, order, -1))
    return slot, row_of_slot[:nwin * cap].reshape(nwin, cap)


def windowed_attention(feats_qkv, st: SparseVoxels, res: int,
                       window: int, heads: int,
                       shift: Tuple[int, int, int] = (0, 0, 0)):
    """feats_qkv [N, 3, H, D] → [N, H*D] swin attention output."""
    n, _, h, d = feats_qkv.shape
    _, row_of_slot = swin_partition(st, res, window, shift)
    w, cap = row_of_slot.shape
    valid = row_of_slot >= 0
    rows = jnp.clip(row_of_slot, 0)
    qkv = feats_qkv[rows]                                   # [W, S, 3, H, D]
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    bias = jnp.where(valid[:, None, None, :], 0.0, -1e9)
    out = jax.nn.dot_product_attention(q, k, v, bias=bias)  # [W, S, H, D]
    out = out.reshape(w * cap, h * d)
    flat_rows = row_of_slot.reshape(-1)
    # invalid slots scatter into a dump row n, then get sliced away
    gathered = jnp.zeros((n + 1, h * d), out.dtype).at[
        jnp.where(flat_rows >= 0, flat_rows, n)].set(out)[:n]
    return gathered * st.mask[:, None]
