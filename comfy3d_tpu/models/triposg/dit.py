"""TripoSG rectified-flow DiT (flax).

Re-derivation of `Gen_3D_Modules/TripoSG/models/transformers/
triposg_transformer.py` (HunyuanDiT-lineage): the time embedding rides
as an extra TOKEN (forward:660-663, not adaLN), blocks are pre-LN
self-attn (bias-free qkv, RMS qk-norm) + cross-attn into DINOv2 tokens +
gelu FF, and the second half of the 21 blocks consumes UNet-style skip
connections (skip_concat_front + the reference's skip_norm_last quirk:
Linear first, LayerNorm after — triposg_transformer.py:305-316).
Also reused by PartCrafter (its transformer is this block family with
per-part/global attention) and Craftsman-class latent diffusers.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class TripoSGDiTConfig:
    width: int = 2048
    in_channels: int = 64
    num_layers: int = 21
    heads: int = 16
    cross_attention_dim: int = 1024
    mlp_ratio: float = 4.0


def _rms(x, scale, eps=1e-6):
    x32 = x.astype(jnp.float32)
    r = jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
    return (x32 * r).astype(x.dtype) * scale


class _Attn(nn.Module):
    dim: int
    heads: int
    kv_dim: int | None = None
    qkv_bias: bool = False
    qk_norm: bool = True
    norm_cross: bool = False     # diffusers cross_attention_norm="layer_norm"

    @nn.compact
    def __call__(self, x, context=None):
        hd = self.dim // self.heads
        ctx = x if context is None else context
        if self.norm_cross:
            ctx = nn.LayerNorm(epsilon=1e-5, name="norm_cross")(ctx)
        b, nq, _ = x.shape
        nk = ctx.shape[1]
        q = nn.Dense(self.dim, use_bias=self.qkv_bias, name="to_q")(x)
        k = nn.Dense(self.dim, use_bias=self.qkv_bias, name="to_k")(ctx)
        v = nn.Dense(self.dim, use_bias=self.qkv_bias, name="to_v")(ctx)
        q = q.reshape(b, nq, self.heads, hd)
        k = k.reshape(b, nk, self.heads, hd)
        v = v.reshape(b, nk, self.heads, hd)
        if self.qk_norm:
            qs = self.param("norm_q_scale", nn.initializers.ones, (hd,))
            ks = self.param("norm_k_scale", nn.initializers.ones, (hd,))
            q = _rms(q, qs)
            k = _rms(k, ks)
        out = jax.nn.dot_product_attention(q, k, v)
        return nn.Dense(self.dim, name="to_out_0")(
            out.reshape(b, nq, self.dim))


class DiTBlock(nn.Module):
    """Reference DiTBlock (triposg_transformer.py:129-371) — also the
    block family of the TripoSG VAE encoder/decoder and PartCrafter,
    which instantiate it without self- or cross-attention."""

    cfg: TripoSGDiTConfig
    skip: bool = False
    self_attn: bool = True
    cross_attn: bool = True
    qk_norm: bool = True
    cross_norm: bool = False

    @nn.compact
    def __call__(self, x, context=None, skip_x=None):
        c = self.cfg
        if self.skip:
            # skip_concat_front=True, skip_norm_last=True quirk
            cat = jnp.concatenate([skip_x, x], axis=-1)
            x = nn.Dense(c.width, name="skip_linear")(cat)
            x = nn.LayerNorm(epsilon=1e-5, name="skip_norm")(x)
        if self.self_attn:
            h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
            x = x + _Attn(c.width, c.heads, qk_norm=self.qk_norm,
                          name="attn1")(h)
        if self.cross_attn:
            h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
            x = x + _Attn(c.width, c.heads, c.cross_attention_dim,
                          qk_norm=self.qk_norm,
                          norm_cross=self.cross_norm,
                          name="attn2")(h, context)
        h = nn.LayerNorm(epsilon=1e-5, name="norm3")(x)
        inner = int(c.width * c.mlp_ratio)
        h = nn.gelu(nn.Dense(inner, name="ff_0")(h), approximate=False)
        return x + nn.Dense(c.width, name="ff_2")(h)


def _sinusoidal(t, dim, flip_sin_to_cos=False):
    half = dim // 2
    freqs = jnp.exp(-np.log(10000.0)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    sin, cos = jnp.sin(args), jnp.cos(args)
    return jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos],
                           axis=-1)


class TripoSGDiT(nn.Module):
    cfg: TripoSGDiTConfig = TripoSGDiTConfig()

    @nn.compact
    def __call__(self, x, t, context):
        """x [B, N, C]; t [B] (flow σ·1000); context [B, M, D] →
        velocity [B, N, C]."""
        c = self.cfg
        n = x.shape[1]
        temb = _sinusoidal(t, c.width)
        # diffusers TimestepEmbedding(inner_dim, inner_dim*4,
        # out_dim=inner_dim) — triposg_transformer.py:432-436
        temb = nn.Dense(c.width * 4, name="time_proj_linear_1")(temb)
        temb = nn.Dense(c.width, name="time_proj_linear_2")(
            nn.gelu(temb, approximate=False))
        h = nn.Dense(c.width, name="proj_in")(x)
        h = jnp.concatenate([temb[:, None, :], h], axis=1)
        skips = []
        mid = c.num_layers // 2
        for i in range(c.num_layers):
            if i > mid:
                h = DiTBlock(c, skip=True, name=f"blocks_{i}")(
                    h, context, skip_x=skips.pop())
            else:
                h = DiTBlock(c, name=f"blocks_{i}")(h, context)
            if i < mid:
                skips.append(h)
        h = nn.LayerNorm(epsilon=1e-5, name="norm_out")(h)
        h = h[:, -n:]
        return nn.Dense(c.in_channels, name="proj_out")(h)
