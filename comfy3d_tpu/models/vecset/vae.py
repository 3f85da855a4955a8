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


def decode_volume(apply_fn, params, decoded, octree_resolution: int = 256,
                  bounds: float = 1.01, num_chunks: int = 65536):
    """Dense occupancy grid via a lax.map sweep of the geo decoder.

    apply_fn(params, decoded, points[B, M, 3]) → [B, M] logits.
    Returns grid [B, R+1, R+1, R+1] float32 (volume_decoders.py:141-183;
    grid spans [-bounds, bounds] with R+1 samples per axis, indexing ij).
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
        return apply_fn(params, decoded,
                        jnp.broadcast_to(chunk[None], (b,) + chunk.shape))

    logits = jax.lax.map(one_chunk, pts)          # [n_chunks, B, M]
    logits = logits.transpose(1, 0, 2).reshape(b, -1)[:, :total]
    return logits.reshape(b, r, r, r)


def grid_to_mesh(grid, bounds: float = 1.01, mc_level: float = 0.0,
                 max_tris: int = 2_000_000):
    """[R, R, R] logits → Mesh via the marching-tets extractor, with the
    reference's vertex transform (surface_extractors.py:67-78:
    v/grid_size·bbox_size + bbox_min)."""
    from ...ops import tetra
    return tetra.extract_isosurface(
        np.asarray(grid, np.float32), iso=float(mc_level),
        bounds=(-bounds, bounds), max_tris=max_tris)
