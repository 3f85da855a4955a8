"""ShapeVAE: latent set → occupancy field → mesh (flax).

Counterpart of the reference `ShapeVAE`
(`Gen_3D_Modules/Hunyuan3D_V2/hy3dgen/shapegen/models/autoencoders/
model.py:132-189`) and its `VanillaVolumeDecoder` + `MCSurfaceExtractor`
(`volume_decoders.py:141-183`, `surface_extractors.py:67-78`).

TPU design: the reference decodes the dense SDF grid with a Python
`num_chunks` loop over query points; here the grid is reshaped into a
static [n_chunks, chunk, 3] axis and swept with `lax.map`, so one jit
traces the whole volume decode and the chunk axis is free to shard over
a device mesh (SURVEY.md §5.7's "chunk loops become sharded axes").
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .blocks import (CrossAttentionDecoder, FourierConfig, VecTransformer)


@dataclasses.dataclass(frozen=True)
class ShapeVAEConfig:
    num_latents: int = 3072
    embed_dim: int = 64
    width: int = 1024
    heads: int = 16
    num_decoder_layers: int = 16
    geo_decoder_downsample_ratio: int = 1
    geo_decoder_mlp_expand_ratio: int = 4
    geo_decoder_ln_post: bool = True
    num_freqs: int = 8
    include_pi: bool = True
    qkv_bias: bool = True
    qk_norm: bool = False
    scale_factor: float = 1.0188137142395404     # hunyuan3d-vae-v2-0


class ShapeVAE(nn.Module):
    cfg: ShapeVAEConfig = ShapeVAEConfig()

    def setup(self):
        c = self.cfg
        self.post_kl = nn.Dense(c.width, name="post_kl")
        self.transformer = VecTransformer(
            c.width, c.num_decoder_layers, c.heads, c.qkv_bias,
            c.qk_norm, name="transformer")
        ds = c.geo_decoder_downsample_ratio
        self.geo_decoder = CrossAttentionDecoder(
            width=c.width // ds, heads=c.heads // ds, out_channels=1,
            mlp_expand_ratio=c.geo_decoder_mlp_expand_ratio,
            downsample_ratio=ds, enable_ln_post=c.geo_decoder_ln_post,
            qkv_bias=c.qkv_bias, qk_norm=c.qk_norm,
            fourier=FourierConfig(c.num_freqs, c.include_pi),
            name="geo_decoder")

    def __call__(self, latents):
        """[B, N, embed_dim] sampled latents → [B, N, width] decoded set
        (model.py:186-189)."""
        return self.transformer(self.post_kl(latents))

    def query(self, decoded, points):
        """decoded [B, N, W]; points [B, M, 3] → logits [B, M]."""
        return self.geo_decoder(points, decoded)[..., 0]

    def init_all(self, latents, points):
        decoded = self(latents)
        return self.query(decoded, points)


def _shard_points(pts_b, mesh):
    """dp-shard the query-point axis of one chunk: the reference's
    `num_chunks` loop axis becomes a sharded dimension (SURVEY.md §5.7
    'chunk loops become sharded axes'). Queries are embarrassingly
    parallel over points; GSPMD all-gathers only the [B, M] logits."""
    if mesh is None:
        return pts_b
    from jax.sharding import NamedSharding, PartitionSpec as P
    axis = "dp" if "dp" in mesh.axis_names else mesh.axis_names[0]
    if pts_b.shape[1] % mesh.shape[axis]:
        return pts_b
    return jax.lax.with_sharding_constraint(
        pts_b, NamedSharding(mesh, P(None, axis, None)))


def decode_volume(apply_fn, params, decoded, octree_resolution: int = 256,
                  bounds: float = 1.01, num_chunks: int = 65536,
                  mesh=None):
    """Dense occupancy grid via a lax.map sweep of the geo decoder.

    apply_fn(params, decoded, points[B, M, 3]) → [B, M] logits.
    Returns grid [B, R+1, R+1, R+1] float32 (volume_decoders.py:141-183;
    grid spans [-bounds, bounds] with R+1 samples per axis, indexing ij).
    With a `mesh`, each chunk's point axis is dp-sharded.
    """
    r = int(octree_resolution) + 1
    lin = np.linspace(-bounds, bounds, r, dtype=np.float32)
    gx, gy, gz = np.meshgrid(lin, lin, lin, indexing="ij")
    pts = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    total = pts.shape[0]
    n_chunks = -(-total // num_chunks)
    pad = n_chunks * num_chunks - total
    if pad:
        pts = np.concatenate([pts, np.zeros((pad, 3), np.float32)])
    pts = jnp.asarray(pts).reshape(n_chunks, num_chunks, 3)

    b = decoded.shape[0]

    def one_chunk(chunk):
        pts_b = jnp.broadcast_to(chunk[None], (b,) + chunk.shape)
        return apply_fn(params, decoded, _shard_points(pts_b, mesh))

    logits = jax.lax.map(one_chunk, pts)          # [n_chunks, B, M]
    logits = logits.transpose(1, 0, 2).reshape(b, -1)[:, :total]
    return logits.reshape(b, r, r, r)


def decode_volume_hierarchical(apply_fn, params, decoded,
                               octree_resolution: int = 256,
                               coarse_resolution: int = 64,
                               bounds: float = 1.01,
                               num_chunks: int = 65536,
                               band_cells_per_level=None,
                               mesh=None):
    """Coarse-to-fine volume decode (the reference's hierarchical /
    FlashVDM role: Hunyuan3D_V2 volume_decoders.py:185-280, TripoSG
    inference_utils.py:129-189): decode a dense coarse grid, then per
    2× level re-query only the cells whose corner logits lie near the
    iso surface, trilinearly upsampling everything else.

    TPU design: the reference gathers a dynamic band (|logit| < 1) with
    boolean indexing; here each level selects a FIXED top-K of cells by
    nearest-corner |logit| (K ∝ R², the surface-area scaling), so one
    jit per level with static shapes. Padded/duplicate selections are
    harmless — they just re-decode correct values. Returns
    [B, R+1, R+1, R+1] like `decode_volume`.
    """
    r0 = int(coarse_resolution)
    levels = 0
    while r0 << levels < int(octree_resolution):
        levels += 1
    assert r0 << levels == int(octree_resolution), \
        (coarse_resolution, octree_resolution)
    grid = decode_volume(apply_fn, params, decoded,
                         octree_resolution=r0, bounds=bounds,
                         num_chunks=min(num_chunks, (r0 + 1) ** 3),
                         mesh=mesh)
    b = grid.shape[0]

    for lvl in range(levels):
        rc = r0 << lvl                       # coarse cells per axis
        rf = rc * 2                          # fine resolution
        if band_cells_per_level is not None:
            k = int(band_cells_per_level[lvl])
        else:
            k = min(rc ** 3, max(4096, 14 * rc * rc))
        fine = jax.image.resize(grid, (b, rf + 1, rf + 1, rf + 1),
                                "trilinear")

        # nearest-corner |logit| per coarse cell → top-K band
        g = jnp.abs(grid)
        corner_min = jnp.minimum(
            jnp.minimum(jnp.minimum(g[:, :-1, :-1, :-1],
                                    g[:, 1:, :-1, :-1]),
                        jnp.minimum(g[:, :-1, 1:, :-1],
                                    g[:, :-1, :-1, 1:])),
            jnp.minimum(jnp.minimum(g[:, 1:, 1:, :-1],
                                    g[:, 1:, :-1, 1:]),
                        jnp.minimum(g[:, :-1, 1:, 1:],
                                    g[:, 1:, 1:, 1:])))
        _neg, cell_idx = jax.lax.top_k(-corner_min.reshape(b, -1), k)
        ci = cell_idx // (rc * rc)
        cj = (cell_idx // rc) % rc
        ck = cell_idx % rc

        # each coarse cell covers 3³ fine-grid samples
        off = jnp.arange(3)
        oi, oj, ok = jnp.meshgrid(off, off, off, indexing="ij")
        fi = 2 * ci[..., None] + oi.reshape(-1)       # [B, K, 27]
        fj = 2 * cj[..., None] + oj.reshape(-1)
        fk = 2 * ck[..., None] + ok.reshape(-1)
        step = 2.0 * bounds / rf
        pts = jnp.stack([fi, fj, fk], -1).astype(jnp.float32) \
            * step - bounds                            # [B, K, 27, 3]
        total = k * 27
        chunk = min(num_chunks, total)
        n_chunks = -(-total // chunk)
        pad = n_chunks * chunk - total
        flat = pts.reshape(b, total, 3)
        if pad:
            flat = jnp.concatenate(
                [flat, jnp.zeros((b, pad, 3), jnp.float32)], axis=1)
        flat = flat.reshape(b, n_chunks, chunk, 3).transpose(1, 0, 2, 3)

        def one_chunk(chunk_pts):
            return apply_fn(params, decoded,
                            _shard_points(chunk_pts, mesh))

        vals = jax.lax.map(one_chunk, flat)            # [n, B, chunk]
        vals = vals.transpose(1, 0, 2).reshape(b, -1)[:, :total]
        bidx = jnp.broadcast_to(jnp.arange(b)[:, None],
                                (b, total))
        grid = fine.at[bidx.reshape(-1),
                       fi.reshape(b, -1).reshape(-1),
                       fj.reshape(b, -1).reshape(-1),
                       fk.reshape(b, -1).reshape(-1)].set(
            vals.reshape(-1))
    return grid


def decode_volume_auto(apply_fn, params, decoded,
                       octree_resolution: int = 256,
                       bounds: float = 1.01, num_chunks: int = 65536,
                       coarse_resolution: int = 64, mesh=None):
    """Hierarchical decode when the resolution allows it (power-of-2
    multiple of the coarse grid — the reference's default path,
    nodes.py:5412-5414 oct 256 via hierarchical decoding), else dense."""
    r = int(octree_resolution)
    rc = min(int(coarse_resolution), r)
    ratio = r // rc if rc else 1
    if r > rc and r % rc == 0 and (ratio & (ratio - 1)) == 0:
        return decode_volume_hierarchical(
            apply_fn, params, decoded, octree_resolution=r,
            coarse_resolution=rc, bounds=bounds, num_chunks=num_chunks,
            mesh=mesh)
    return decode_volume(apply_fn, params, decoded,
                         octree_resolution=r, bounds=bounds,
                         num_chunks=num_chunks, mesh=mesh)


def grid_to_mesh(grid, bounds: float = 1.01, mc_level: float = 0.0,
                 max_tris: int = 2_000_000):
    """[R, R, R] logits → Mesh via the marching-tets extractor, with the
    reference's vertex transform (surface_extractors.py:67-78:
    v/grid_size·bbox_size + bbox_min)."""
    from ...ops import tetra
    return tetra.extract_isosurface(
        np.asarray(grid, np.float32), iso=float(mc_level),
        bounds=(-bounds, bounds), max_tris=max_tris)
