"""TRELLIS sparse-structure stage (flax): flow DiT over the dense 16³
occupancy latent + the conv decoder that lifts it to the 64³ occupancy
grid.

Counterparts: `trellis/models/sparse_structure_flow.py:55-200`
(SparseStructureFlowModel — patchify-3D DiT with cross attention) and
`trellis/models/sparse_structure_vae.py:180-306` (SparseStructureDecoder
— ResBlock3d net with pixel-shuffle upsampling). Data layout is NDHWC
(torch NCDHW transposed at the converter).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .blocks import (ModulatedTransformerCrossBlock, TimestepEmbedder,
                     abs_pos_embed)


@dataclasses.dataclass(frozen=True)
class SSFlowConfig:
    resolution: int = 16
    in_channels: int = 8
    model_channels: int = 1024
    cond_channels: int = 1024
    out_channels: int = 8
    num_blocks: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    patch_size: int = 1
    share_mod: bool = False
    qk_rms_norm: bool = False
    qk_rms_norm_cross: bool = False


class SparseStructureFlowModel(nn.Module):
    cfg: SSFlowConfig = SSFlowConfig()

    @nn.compact
    def __call__(self, x, t, cond, ctx_mask=None):
        """x [B, R, R, R, C]; t [B]; cond [B, M, ctx] → [B, R, R, R, C]."""
        c = self.cfg
        b = x.shape[0]
        p = c.patch_size
        r = c.resolution
        rp = r // p
        # patchify: [B, rp, p, rp, p, rp, p, C] → [B, rp³, p³·C]
        h = x.reshape(b, rp, p, rp, p, rp, p, c.in_channels)
        h = h.transpose(0, 1, 3, 5, 7, 2, 4, 6)
        h = h.reshape(b, rp ** 3, c.in_channels * p ** 3)

        h = nn.Dense(c.model_channels, name="input_layer")(h)
        coords = jnp.stack(jnp.meshgrid(*([jnp.arange(rp)] * 3),
                                        indexing="ij"), -1).reshape(-1, 3)
        h = h + abs_pos_embed(coords, c.model_channels)[None]

        t_emb = TimestepEmbedder(c.model_channels, name="t_embedder")(t)
        if c.share_mod:
            t_emb = nn.Dense(6 * c.model_channels,
                             name="adaLN_modulation_1")(nn.silu(t_emb))
        for i in range(c.num_blocks):
            h = ModulatedTransformerCrossBlock(
                c.model_channels, c.cond_channels, c.num_heads,
                c.mlp_ratio, c.qk_rms_norm, c.qk_rms_norm_cross,
                c.share_mod, name=f"blocks_{i}")(h, t_emb, cond,
                                                 ctx_mask=ctx_mask)
        # final non-affine LN (sparse_structure_flow.py:194)
        mu = h.mean(-1, keepdims=True)
        var = ((h - mu) ** 2).mean(-1, keepdims=True)
        h = (h - mu) * jax.lax.rsqrt(var + 1e-5)
        h = nn.Dense(c.out_channels * p ** 3, name="out_layer")(h)

        # unpatchify ([C, pd, ph, pw] channel packing, C-major)
        h = h.reshape(b, rp, rp, rp, c.out_channels, p, p, p)
        h = h.transpose(0, 1, 5, 2, 6, 3, 7, 4)
        return h.reshape(b, r, r, r, c.out_channels)


# ------------------------------------------------------------------ #
# Conv decoder: latent [B, 16³, 8] → occupancy logits [B, 64³, 1]
# ------------------------------------------------------------------ #
def _channel_ln(x, scale, bias, eps=1e-5):
    """ChannelLayerNorm32 over the channel (last in NDHWC) dim."""
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


class ResBlock3d(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        s1 = self.param("norm1_scale", nn.initializers.ones, (cin,))
        b1 = self.param("norm1_bias", nn.initializers.zeros, (cin,))
        h = nn.silu(_channel_ln(x, s1, b1))
        h = nn.Conv(self.out_channels, (3, 3, 3), padding=1,
                    name="conv1")(h)
        s2 = self.param("norm2_scale", nn.initializers.ones,
                        (self.out_channels,))
        b2 = self.param("norm2_bias", nn.initializers.zeros,
                        (self.out_channels,))
        h = nn.silu(_channel_ln(h, s2, b2))
        h = nn.Conv(self.out_channels, (3, 3, 3), padding=1,
                    kernel_init=nn.initializers.zeros, name="conv2")(h)
        if cin != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1, 1),
                        name="skip_connection")(x)
        return h + x


def pixel_shuffle_3d(x, factor: int):
    """[B, D, H, W, C·f³] → [B, D·f, H·f, W·f, C] (modules/spatial.py)."""
    b, d, h, w, c = x.shape
    f = factor
    co = c // f ** 3
    # torch layout: channels split as [co, f, f, f] (C-major)
    x = x.reshape(b, d, h, w, co, f, f, f)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    return x.reshape(b, d * f, h * f, w * f, co)


@dataclasses.dataclass(frozen=True)
class SSDecoderConfig:
    out_channels: int = 1
    latent_channels: int = 8
    num_res_blocks: int = 2
    channels: Tuple[int, ...] = (512, 128, 32)
    num_res_blocks_middle: int = 2


class SparseStructureDecoder(nn.Module):
    """sparse_structure_vae.py:180-306: middle blocks → per-stage res
    blocks with upsample between stages → out."""
    cfg: SSDecoderConfig = SSDecoderConfig()

    @nn.compact
    def __call__(self, z):
        """z [B, R, R, R, latent] → logits [B, 4R, 4R, 4R, out]."""
        c = self.cfg
        h = nn.Conv(c.channels[0], (3, 3, 3), padding=1,
                    name="input_layer")(z)
        for i in range(c.num_res_blocks_middle):
            h = ResBlock3d(c.channels[0], name=f"middle_block_{i}")(h)
        bi = 0
        for si, ch in enumerate(c.channels):
            for _ in range(c.num_res_blocks):
                h = ResBlock3d(ch, name=f"blocks_{bi}")(h)
                bi += 1
            if si < len(c.channels) - 1:
                h = nn.Conv(c.channels[si + 1] * 8, (3, 3, 3), padding=1,
                            name=f"blocks_{bi}")(h)
                h = pixel_shuffle_3d(h, 2)
                bi += 1
        cin = h.shape[-1]
        s = self.param("out_norm_scale", nn.initializers.ones, (cin,))
        b = self.param("out_norm_bias", nn.initializers.zeros, (cin,))
        h = nn.silu(_channel_ln(h, s, b))
        return nn.Conv(c.out_channels, (3, 3, 3), padding=1,
                       name="out_layer")(h)
