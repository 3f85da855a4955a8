"""TripoSR: single image → triplane NeRF, flax-native.

Architecture re-derived from the reference system
(`Gen_3D_Modules/TripoSR/system.py:26-160`, config
`Configs/TripoSR_config.yaml`):

  DINO ViT-B/16 tokenizer (512² cond image, interpolated pos-emb)
  → learned triplane tokens [3·32², 1024]
  → 16-layer Transformer1D (16 heads × 64, cross-attn dim 768)
  → ConvTranspose 2× upsample to [3, 64, 64, 40] triplanes
  → NeRFMLP (120 → 64 × 10 silu layers → density+rgb)
  with density_act = exp(density − 1), color = sigmoid(features)
  (`models/nerf_renderer.py:41-104`, `models/network_utils.py:35-135`).

The triplane query (`query_triplane`) becomes a batched bilinear gather
(align_corners=False grid-sample semantics) that fuses with the MLP in one
jit — the reference chunks queries in Python (`chunk_size` loops) where we
let XLA pipeline the whole field evaluation.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..common import Transformer1D, ViT, imagenet_normalize


@dataclasses.dataclass(frozen=True)
class TripoSRConfig:
    cond_image_size: int = 512
    # triplane tokenizer
    plane_size: int = 32
    token_channels: int = 1024
    # backbone
    num_layers: int = 16
    heads: int = 16
    dim_head: int = 64
    cross_attention_dim: int = 768
    # post-processor / decoder
    triplane_channels: int = 40
    mlp_neurons: int = 64
    mlp_hidden_layers: int = 9
    # renderer
    radius: float = 0.87
    density_bias: float = -1.0
    num_samples_per_ray: int = 128
    # ViT
    vit_hidden: int = 768
    vit_layers: int = 12
    vit_heads: int = 12
    vit_mlp_dim: int = 3072
    vit_patch: int = 16
    vit_pretrain_grid: int = 14


class TriplaneUpsample(nn.Module):
    """ConvTranspose2d(k2, s2) per plane (network_utils.py:11-33)."""
    out_channels: int

    @nn.compact
    def __call__(self, planes):                 # [B, 3, H, W, C]
        b, np_, h, w, c = planes.shape
        x = planes.reshape(b * np_, h, w, c)
        x = nn.ConvTranspose(self.out_channels, (2, 2), strides=(2, 2),
                             name="upsample")(x)
        return x.reshape(b, np_, h * 2, w * 2, self.out_channels)


class NeRFMLP(nn.Module):
    """(n_hidden+1)-layer silu MLP → (density 1, rgb-features 3)."""
    neurons: int
    hidden_layers: int

    @nn.compact
    def __call__(self, x):
        h = nn.silu(nn.Dense(self.neurons, name="layer_0")(x))
        for i in range(self.hidden_layers - 1):
            h = nn.silu(nn.Dense(self.neurons, name=f"layer_{i + 1}")(h))
        out = nn.Dense(4, name="layer_out")(h)
        return out[..., 0], out[..., 1:]        # density, features


def grid_sample_2d(plane, uv):
    """Bilinear sample with torch grid_sample(align_corners=False)
    semantics (zero-padded border). plane [H, W, C]; uv [..., 2] in
    [-1, 1] where uv[...,0]=x indexes W. Differentiable."""
    h, w = plane.shape[0], plane.shape[1]
    x = (uv[..., 0] + 1.0) * (w / 2.0) - 0.5
    y = (uv[..., 1] + 1.0) * (h / 2.0) - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    def fetch(xi, yi):
        xi_c = jnp.clip(xi.astype(jnp.int32), 0, w - 1)
        yi_c = jnp.clip(yi.astype(jnp.int32), 0, h - 1)
        inb = ((xi >= 0) & (xi <= w - 1) & (yi >= 0)
               & (yi <= h - 1)).astype(plane.dtype)
        return plane[yi_c, xi_c] * inb[..., None]

    t00 = fetch(x0, y0)
    t10 = fetch(x0 + 1, y0)
    t01 = fetch(x0, y0 + 1)
    t11 = fetch(x0 + 1, y0 + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    return ((1 - fx) * (1 - fy) * t00 + fx * (1 - fy) * t10
            + (1 - fx) * fy * t01 + fx * fy * t11)


class TripoSR(nn.Module):
    """Full system. `__call__` = image → triplanes (the `scene_codes`);
    `query` = triplane field sample (density_act, rgb)."""
    cfg: TripoSRConfig = TripoSRConfig()

    def setup(self):
        c = self.cfg
        self.image_tokenizer = ViT(hidden=c.vit_hidden, layers=c.vit_layers,
                                   heads=c.vit_heads, mlp_dim=c.vit_mlp_dim,
                                   patch=c.vit_patch,
                                   pretrain_grid=c.vit_pretrain_grid,
                                   name="vit")
        self.triplane_tokens = self.param(
            "triplane_tokens",
            nn.initializers.normal(1.0 / jnp.sqrt(c.token_channels)),
            (3, c.plane_size, c.plane_size, c.token_channels))
        self.backbone = Transformer1D(
            in_channels=c.token_channels, num_layers=c.num_layers,
            heads=c.heads, dim_head=c.dim_head,
            cross_attention_dim=c.cross_attention_dim, name="backbone")
        self.post_processor = TriplaneUpsample(c.triplane_channels,
                                               name="post")
        self.decoder = NeRFMLP(c.mlp_neurons, c.mlp_hidden_layers,
                               name="decoder")

    def __call__(self, images):
        """images [B, H, W, 3] in [0,1] → triplanes [B, 3, 64, 64, C]."""
        c = self.cfg
        b = images.shape[0]
        tok = self.image_tokenizer(imagenet_normalize(images))  # [B,T,768]

        planes = jnp.broadcast_to(
            self.triplane_tokens[None],
            (b, 3, c.plane_size, c.plane_size, c.token_channels))
        # channel-major token sequence [B, C, 3·P²] (tokenizer contract,
        # tokenizers/triplane.py:29-33)
        seq = planes.reshape(b, 3 * c.plane_size ** 2, c.token_channels)
        seq = seq.transpose(0, 2, 1)
        seq = self.backbone(seq, context=tok)
        planes = seq.transpose(0, 2, 1).reshape(
            b, 3, c.plane_size, c.plane_size, c.token_channels)
        return self.post_processor(planes)

    def init_all(self, images, positions):
        """Traces both the encoder and the field decoder so `init`
        materializes every parameter (flax creates params lazily)."""
        planes = self(images)
        return self.query(planes[0], positions)

    def query(self, triplanes, positions):
        """triplanes [3, H, W, C] (single scene); positions [N, 3] world →
        (sigma [N], rgb [N, 3]). Plane index pairs mirror
        nerf_renderer.py:57-60: (x,y), (x,z), (y,z)."""
        c = self.cfg
        # no clip: grid_sample zero-pads outside [-1,1], matching torch
        p = positions / c.radius
        f_xy = grid_sample_2d(triplanes[0], p[:, (0, 1)])
        f_xz = grid_sample_2d(triplanes[1], p[:, (0, 2)])
        f_yz = grid_sample_2d(triplanes[2], p[:, (1, 2)])
        feat = jnp.concatenate([f_xy, f_xz, f_yz], -1)
        density, features = self.decoder(feat)
        sigma = jnp.exp(density + c.density_bias)
        rgb = jax.nn.sigmoid(features)
        return sigma, rgb
