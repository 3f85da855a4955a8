"""Vecset attention blocks (flax).

Re-derivation of the reference's latent-set transformer substrate
(`Gen_3D_Modules/Hunyuan3D_V2/hy3dgen/shapegen/models/autoencoders/
attention_blocks.py`). Two layout quirks of the torch code are mirrored
exactly so weight conversion is a pure transpose:

  * self-attn `c_qkv` output channels are ordered **per head**
    [H, (q d | k d | v d)] (attention_blocks.py:317-327 views
    [B, N, H, 3d] then splits) — NOT three concatenated width-blocks;
  * cross-attn `c_kv` likewise packs [H, (k d | v d)]
    (attention_blocks.py:202-215).

Optional qk_norm is LayerNorm(head_dim, eps 1e-6) on q and k.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class FourierConfig:
    num_freqs: int = 8
    include_pi: bool = True
    input_dim: int = 3
    include_input: bool = True

    @property
    def out_dim(self) -> int:
        extra = 1 if (self.include_input or self.num_freqs == 0) else 0
        return self.input_dim * (self.num_freqs * 2 + extra)


def fourier_embed(x: jnp.ndarray, cfg: FourierConfig = FourierConfig()
                  ) -> jnp.ndarray:
    """[..., D] → [..., D·(2F+1)]: (x, sin(f·x), cos(f·x)) with
    log-spaced frequencies 2^i (× π), matching FourierEmbedder
    (attention_blocks.py:36-130 concat order x, sin, cos)."""
    if cfg.num_freqs == 0:
        return x
    freqs = 2.0 ** np.arange(cfg.num_freqs, dtype=np.float32)
    if cfg.include_pi:
        freqs = freqs * np.pi
    emb = (x[..., None] * freqs).reshape(*x.shape[:-1], -1)
    parts = ([x] if cfg.include_input else []) + [jnp.sin(emb),
                                                  jnp.cos(emb)]
    return jnp.concatenate(parts, axis=-1)


def _qk_layernorm(x, scale, bias, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


class VecSelfAttention(nn.Module):
    width: int
    heads: int
    qkv_bias: bool = True
    qk_norm: bool = False

    @nn.compact
    def __call__(self, x):                     # [B, N, W]
        b, n, _ = x.shape
        hd = self.width // self.heads
        qkv = nn.Dense(3 * self.width, use_bias=self.qkv_bias,
                       name="c_qkv")(x)
        qkv = qkv.reshape(b, n, self.heads, 3 * hd)
        q, k, v = jnp.split(qkv, 3, axis=-1)   # per-head packing
        if self.qk_norm:
            qs = self.param("q_norm_scale", nn.initializers.ones, (hd,))
            qb = self.param("q_norm_bias", nn.initializers.zeros, (hd,))
            ks = self.param("k_norm_scale", nn.initializers.ones, (hd,))
            kb = self.param("k_norm_bias", nn.initializers.zeros, (hd,))
            q = _qk_layernorm(q, qs, qb)
            k = _qk_layernorm(k, ks, kb)
        out = jax.nn.dot_product_attention(q, k, v)
        out = out.reshape(b, n, self.width)
        return nn.Dense(self.width, name="c_proj")(out)


class VecCrossAttention(nn.Module):
    width: int
    heads: int
    data_width: int | None = None
    qkv_bias: bool = True
    qk_norm: bool = False

    @nn.compact
    def __call__(self, x, data):               # [B, Nq, W], [B, Nd, DW]
        b, nq, _ = x.shape
        nd = data.shape[1]
        hd = self.width // self.heads
        q = nn.Dense(self.width, use_bias=self.qkv_bias, name="c_q")(x)
        kv = nn.Dense(2 * self.width, use_bias=self.qkv_bias,
                      name="c_kv")(data)
        q = q.reshape(b, nq, self.heads, hd)
        kv = kv.reshape(b, nd, self.heads, 2 * hd)
        k, v = jnp.split(kv, 2, axis=-1)
        if self.qk_norm:
            qs = self.param("q_norm_scale", nn.initializers.ones, (hd,))
            qb = self.param("q_norm_bias", nn.initializers.zeros, (hd,))
            ks = self.param("k_norm_scale", nn.initializers.ones, (hd,))
            kb = self.param("k_norm_bias", nn.initializers.zeros, (hd,))
            q = _qk_layernorm(q, qs, qb)
            k = _qk_layernorm(k, ks, kb)
        out = jax.nn.dot_product_attention(q, k, v)
        out = out.reshape(b, nq, self.width)
        return nn.Dense(self.width, name="c_proj")(out)


class VecMLP(nn.Module):
    width: int
    expand_ratio: int = 4
    output_width: int | None = None

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.width * self.expand_ratio, name="c_fc")(x)
        h = nn.gelu(h, approximate=False)      # torch nn.GELU() is exact
        return nn.Dense(self.output_width or self.width, name="c_proj")(h)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    qkv_bias: bool = True
    qk_norm: bool = False

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-6, name="ln_1")(x)
        x = x + VecSelfAttention(self.width, self.heads, self.qkv_bias,
                                 self.qk_norm, name="attn")(h)
        h = nn.LayerNorm(epsilon=1e-6, name="ln_2")(x)
        return x + VecMLP(self.width, name="mlp")(h)


class VecTransformer(nn.Module):
    width: int
    layers: int
    heads: int
    qkv_bias: bool = True
    qk_norm: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, self.heads,
                                       self.qkv_bias, self.qk_norm,
                                       name=f"resblocks_{i}")(x)
        return x


class ResidualCrossAttentionBlock(nn.Module):
    width: int
    heads: int
    data_width: int | None = None
    mlp_expand_ratio: int = 4
    qkv_bias: bool = True
    qk_norm: bool = False

    @nn.compact
    def __call__(self, x, data):
        dw = self.data_width or self.width
        hx = nn.LayerNorm(epsilon=1e-6, name="ln_1")(x)
        hd = nn.LayerNorm(epsilon=1e-6, name="ln_2")(data)
        x = x + VecCrossAttention(self.width, self.heads, dw,
                                  self.qkv_bias, self.qk_norm,
                                  name="attn")(hx, hd)
        h = nn.LayerNorm(epsilon=1e-6, name="ln_3")(x)
        return x + VecMLP(self.width, self.mlp_expand_ratio,
                          name="mlp")(h)


class CrossAttentionDecoder(nn.Module):
    """Fourier-embedded query points cross-attend into the latent set →
    occupancy logits (attention_blocks.py:435-493)."""
    width: int
    heads: int
    out_channels: int = 1
    mlp_expand_ratio: int = 4
    downsample_ratio: int = 1
    enable_ln_post: bool = True
    qkv_bias: bool = True
    qk_norm: bool = False
    fourier: FourierConfig = FourierConfig()

    @nn.compact
    def __call__(self, queries, latents):
        """queries [B, M, 3]; latents [B, N, W·ds] → [B, M, out]."""
        q = fourier_embed(queries, self.fourier)
        q = nn.Dense(self.width, name="query_proj")(q)
        if self.downsample_ratio != 1:
            latents = nn.Dense(self.width, name="latents_proj")(latents)
        qk = self.qk_norm if self.enable_ln_post else False
        x = ResidualCrossAttentionBlock(
            self.width, self.heads, self.width, self.mlp_expand_ratio,
            self.qkv_bias, qk, name="cross_attn_decoder")(q, latents)
        if self.enable_ln_post:
            x = nn.LayerNorm(epsilon=1e-5, name="ln_post")(x)
        return nn.Dense(self.out_channels, name="output_proj")(x)
