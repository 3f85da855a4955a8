"""StableFast3D (SF3D) model components (flax).

Re-derivation of `Gen_3D_Modules/StableFast3D/sf3d/models/` — the
two-stream interleave transformer (backbone.py:335-515: latent stream ↔
triplane stream with fuse blocks, cross-attending into DINOv2 image
tokens), the pixel-shuffle triplane upsampler (network.py:16-61), and
the multi-head MaterialMLP decoder (network.py:123-195: density
trunc_exp −1, sigmoid features, perturb normals, vertex offsets).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class SFCrossAttention(nn.Module):
    """backbone.py:36-81 (wq/wk/wv/proj)."""
    dim: int
    heads: int
    qkv_bias: bool = False

    @nn.compact
    def __call__(self, x_q, x_kv):
        hd = self.dim // self.heads
        b, nq, _ = x_q.shape
        nk = x_kv.shape[1]
        q = nn.Dense(self.dim, use_bias=self.qkv_bias, name="wq")(x_q)
        k = nn.Dense(self.dim, use_bias=self.qkv_bias, name="wk")(x_kv)
        v = nn.Dense(self.dim, use_bias=self.qkv_bias, name="wv")(x_kv)
        q = q.reshape(b, nq, self.heads, hd)
        k = k.reshape(b, nk, self.heads, hd)
        v = v.reshape(b, nk, self.heads, hd)
        out = jax.nn.dot_product_attention(q, k, v)
        return nn.Dense(self.dim, name="proj")(
            out.reshape(b, nq, self.dim))


class SFFeedForward(nn.Module):
    """backbone.py:84-104 (GEGLU → Linear), diffusers net.0/net.2."""
    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        h = nn.Dense(2 * inner, name="net_0_proj")(x)
        a, g = jnp.split(h, 2, axis=-1)
        return nn.Dense(self.dim, name="net_2")(a * nn.gelu(g))


class FuseBlock(nn.Module):
    """backbone.py:212-250 (z ← attn(z, x) → ff), norm_x_input=False."""
    dim_z: int
    heads: int
    qkv_bias: bool = False

    @nn.compact
    def __call__(self, z, x):
        h = nn.LayerNorm(name="norm_z1")(z)
        z = z + SFCrossAttention(self.dim_z, self.heads, self.qkv_bias,
                                 name="attn")(h, x)
        h = nn.LayerNorm(name="norm_z2")(z)
        return z + SFFeedForward(self.dim_z, name="ff")(h)


class BasicBlock(nn.Module):
    """backbone.py:107-148 (self-attn → cross-attn → ff)."""
    dim: int
    heads: int
    qkv_bias: bool = False

    @nn.compact
    def __call__(self, z, x):
        h = nn.LayerNorm(name="norm1")(z)
        z = z + SFCrossAttention(self.dim, self.heads, self.qkv_bias,
                                 name="attn1")(h, h)
        h = nn.LayerNorm(name="norm2")(z)
        z = z + SFCrossAttention(self.dim, self.heads, self.qkv_bias,
                                 name="attn2")(h, x if x is not None
                                               else h)
        h = nn.LayerNorm(name="norm3")(z)
        return z + SFFeedForward(self.dim, name="ff")(h)


class TwoStreamBlock(nn.Module):
    dim_latent: int
    dim_input: int
    heads: int
    num_basic_blocks: int = 3
    qkv_bias: bool = False

    @nn.compact
    def __call__(self, latent, trip, cross):
        latent = FuseBlock(self.dim_latent, self.heads, self.qkv_bias,
                           name="fuse_block_in")(latent, trip)
        for i in range(self.num_basic_blocks):
            latent = BasicBlock(self.dim_latent, self.heads,
                                self.qkv_bias,
                                name=f"transformer_block_{i}")(
                latent, cross)
        trip = FuseBlock(self.dim_input, self.heads, self.qkv_bias,
                         name="fuse_block_out")(trip, latent)
        return latent, trip


@dataclasses.dataclass(frozen=True)
class BackboneConfig:
    heads: int = 16
    head_dim: int = 64
    raw_triplane_channels: int = 1024
    triplane_channels: int = 1024
    raw_image_channels: int = 1024
    num_latents: int = 1792
    num_blocks: int = 4
    num_basic_blocks: int = 3
    norm_num_groups: int = 32
    attention_bias: bool = False


class TwoStreamInterleaveTransformer(nn.Module):
    """backbone.py:398-515."""
    cfg: BackboneConfig = BackboneConfig()

    @nn.compact
    def __call__(self, triplane_tokens, image_tokens):
        """triplane_tokens [B, N_tri, C_raw]; image_tokens [B, N_img,
        C_img] → [B, N_tri, C_raw] (residual)."""
        c = self.cfg
        latent_dim = c.heads * c.head_dim
        x0 = triplane_tokens
        # GroupNorm over the channel dim, tokens as spatial
        gn_scale = self.param("norm_triplane_scale",
                              nn.initializers.ones,
                              (c.raw_triplane_channels,))
        gn_bias = self.param("norm_triplane_bias",
                             nn.initializers.zeros,
                             (c.raw_triplane_channels,))
        trip = _group_norm_tokens(x0, c.norm_num_groups, gn_scale,
                                  gn_bias)
        trip = nn.Dense(c.triplane_channels, name="proj_triplane")(trip)
        img = nn.LayerNorm(name="norm_image")(image_tokens)
        img = nn.Dense(latent_dim, name="proj_image")(img)
        lat0 = self.param("latent_init",
                          nn.initializers.normal(0.02),
                          (1, c.num_latents, latent_dim))
        lat = jnp.broadcast_to(lat0,
                               (x0.shape[0], c.num_latents, latent_dim))
        lat = nn.LayerNorm(name="norm_latent")(lat)
        lat = nn.Dense(latent_dim, name="proj_latent")(lat)
        lat = jnp.concatenate([img, lat], axis=1)       # mix_latent
        for i in range(c.num_blocks):
            lat, trip = TwoStreamBlock(
                latent_dim, c.triplane_channels, c.heads,
                c.num_basic_blocks, c.attention_bias,
                name=f"main_blocks_{i}")(lat, trip, image_tokens)
        out = nn.Dense(c.raw_triplane_channels, name="proj_out")(trip)
        return out + x0


def _group_norm_tokens(x, groups, scale, bias, eps=1e-6):
    """GroupNorm over channels with tokens as the spatial dim
    ([B, N, C] ≙ torch GroupNorm on [B, C, N])."""
    b, n, c = x.shape
    g = x.reshape(b, n, groups, c // groups)
    mu = g.mean(axis=(1, 3), keepdims=True)
    var = ((g - mu) ** 2).mean(axis=(1, 3), keepdims=True)
    g = (g - mu) * jax.lax.rsqrt(var + eps)
    return g.reshape(b, n, c) * scale + bias


class PixelShuffleUpsample(nn.Module):
    """network.py:16-61: convs → 2D pixel shuffle ×scale per plane."""
    in_channels: int = 1024
    out_channels: int = 40
    scale_factor: int = 4
    conv_layers: int = 4

    @nn.compact
    def __call__(self, planes):
        """[B, 3, H, W, C] → [B, 3, H·s, W·s, out]."""
        b, np_, h, w, c = planes.shape
        x = planes.reshape(b * np_, h, w, c)
        s = self.scale_factor
        out_ch = self.out_channels * s * s
        li = 0
        for i in range(self.conv_layers):
            cur = self.in_channels if i != self.conv_layers - 1 else out_ch
            x = nn.Conv(cur, (3, 3), padding=1,
                        name=f"upsample_{li}")(x)
            li += 1
            if i != self.conv_layers - 1:
                x = nn.relu(x)
                li += 1                       # torch Sequential counts ReLU
        # torch PixelShuffle: channels [out, s, s] C-major
        x = x.reshape(b * np_, h, w, self.out_channels, s, s)
        x = x.transpose(0, 1, 4, 2, 5, 3)
        x = x.reshape(b * np_, h * s, w * s, self.out_channels)
        return x.reshape(b, np_, h * s, w * s, self.out_channels)


def trunc_exp(x):
    return jnp.exp(jnp.clip(x, -15.0, 15.0))


_HEADS: Tuple[Tuple[str, int, int, str, float], ...] = (
    # name, out_channels, n_hidden_layers, activation, out_bias
    ("density", 1, 2, "trunc_exp", -1.0),
    ("features", 3, 3, "sigmoid", 0.0),
    ("perturb_normal", 3, 3, "normalize", 0.0),
    ("vertex_offset", 3, 2, "linear", 0.0),
)


class ClipHeadEstimator(nn.Module):
    """`image_estimator/clip_based_estimator.py:26-165` heads only (the
    open_clip visual tower runs separately): per head a shared stack of
    `n_hidden` Linear+ReLU, then two branches (Linear+ReLU, Linear→1)
    producing Beta(α, β) params; eval mode = distribution mode."""
    hidden_features: int = 512
    head_names: Tuple[str, ...] = ("roughness", "metallic")
    n_hidden: int = 3
    output_bias: float = 1.0

    @nn.compact
    def __call__(self, image_features):
        out = {}
        for name in self.head_names:
            h = image_features
            for i in range(self.n_hidden):
                h = nn.relu(nn.Dense(self.hidden_features,
                                     name=f"{name}_shared_{2 * i}")(h))
            branches = []
            for b in (1, 2):
                y = nn.relu(nn.Dense(self.hidden_features,
                                     name=f"{name}_b{b}_0")(h))
                branches.append(
                    nn.Dense(1, name=f"{name}_b{b}_2")(y)[..., 0])
            alpha = jax.nn.softplus(branches[0] + self.output_bias)
            beta = jax.nn.softplus(branches[1] + self.output_bias)
            # Beta mode for α,β > 1 (torch.distributions.Beta.mode)
            mode = (alpha - 1.0) / jnp.maximum(alpha + beta - 2.0, 1e-6)
            out[name] = jnp.clip(mode, 0.0, 1.0)
        return out


class GlobalEstimator(nn.Module):
    """`global_estimator/multi_head_estimator.py:23-120`: stride-2
    valid convs over stacked triplanes → max pool → sg_amplitudes head
    (softplus, bias 1) for spherical-gaussian illumination."""
    hidden_features: int = 512
    n_layers: int = 2
    out_channels: int = 24
    n_hidden: int = 3

    @nn.compact
    def __call__(self, triplanes):
        """triplanes [B, 3, H, W, C] → sg_amplitudes [B, 24, 1]."""
        b, np_, h, w, c = triplanes.shape
        # torch stacks plane channels: [B, 3*C, H, W]
        x = triplanes.transpose(0, 2, 3, 1, 4).reshape(b, h, w, np_ * c)
        for i in range(self.n_layers):
            x = nn.relu(nn.Conv(self.hidden_features, (3, 3),
                                strides=(2, 2), padding="VALID",
                                name=f"layers_{2 * i}")(x))
        x = x.max(axis=(1, 2))
        for i in range(self.n_hidden):
            x = nn.relu(nn.Dense(self.hidden_features,
                                 name=f"sg_amplitudes_{2 * i}")(x))
        y = nn.Dense(self.out_channels,
                     name=f"sg_amplitudes_{2 * self.n_hidden}")(x)
        return jax.nn.softplus(y + 1.0)[..., None]


class MaterialMLP(nn.Module):
    """network.py:123-195 with the StableFast3D_config.yaml head table."""
    in_channels: int = 120
    n_neurons: int = 64

    @nn.compact
    def __call__(self, x, include=None):
        out = {}
        for name, out_ch, n_hidden, act, bias in _HEADS:
            if include is not None and name not in include:
                continue
            h = x
            for i in range(n_hidden):
                h = nn.silu(nn.Dense(self.n_neurons,
                                     name=f"{name}_{2 * i}")(h))
            y = nn.Dense(out_ch, name=f"{name}_{2 * n_hidden}")(h) + bias
            if act == "trunc_exp":
                y = trunc_exp(y)
            elif act == "sigmoid":
                y = jax.nn.sigmoid(y)
            elif act == "normalize":
                y = y / jnp.maximum(
                    jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-8)
            out[name] = y
        return out
