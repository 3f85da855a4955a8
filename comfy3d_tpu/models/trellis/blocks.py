"""TRELLIS dense transformer blocks (flax).

Re-derivation of `TRELLIS/trellis/modules/transformer/{blocks,
modulated}.py` and `modules/attention/modules.py`. Conversion-relevant
layout facts mirrored exactly:

  * self-attn `to_qkv` channels are K-major [3, H, D]
    (modules.py:117-118 reshape B L 3 H D); cross-attn `to_kv` is
    [2, H, D];
  * qk RMS norm is `MultiHeadRMSNorm`: F.normalize(x) · γ[h] · √D
    (modules.py:8-15);
  * modulated blocks: norm1/norm3 affine-free, cross-attn norm2 WITH
    affine (modulated.py:103), eps 1e-6 everywhere;
  * FFN GELU is tanh-approximate (blocks.py:55).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def abs_pos_embed(coords, channels: int):
    """AbsolutePositionEmbedder (transformer/blocks.py:8-46):
    coords [N, 3] int → [N, channels] sin|cos per axis, zero-padded."""
    in_ch = coords.shape[-1]
    freq_dim = channels // in_ch // 2
    freqs = 1.0 / (10000 ** (np.arange(freq_dim, dtype=np.float32)
                             / freq_dim))
    x = coords.reshape(-1).astype(jnp.float32)
    out = x[:, None] * jnp.asarray(freqs)[None]
    emb = jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=-1)
    emb = emb.reshape(coords.shape[0], -1)
    if emb.shape[1] < channels:
        emb = jnp.concatenate(
            [emb, jnp.zeros((coords.shape[0], channels - emb.shape[1]))],
            axis=-1)
    return emb


def timestep_embedding(t, dim: int, max_period: int = 10000):
    """cos|sin (sparse_structure_flow.py:28-47)."""
    half = dim // 2
    freqs = jnp.exp(-np.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None].astype(jnp.float32) * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class TimestepEmbedder(nn.Module):
    hidden: int
    freq_size: int = 256

    @nn.compact
    def __call__(self, t):
        h = nn.Dense(self.hidden, name="mlp_0")(
            timestep_embedding(t, self.freq_size))
        return nn.Dense(self.hidden, name="mlp_2")(nn.silu(h))


def _ln(x, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


class MultiHeadRMSNorm(nn.Module):
    head_dim: int
    heads: int

    @nn.compact
    def __call__(self, x):               # [B, L, H, D]
        gamma = self.param("gamma", nn.initializers.ones,
                           (self.heads, self.head_dim))
        n = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True),
                            1e-12)
        return n * gamma * (self.head_dim ** 0.5)


class MultiHeadAttention(nn.Module):
    channels: int
    heads: int
    ctx_channels: int | None = None
    cross: bool = False
    qkv_bias: bool = True
    qk_rms_norm: bool = False

    @nn.compact
    def __call__(self, x, context=None, mask=None, ctx_mask=None):
        b, l, _ = x.shape
        hd = self.channels // self.heads
        if not self.cross:
            qkv = nn.Dense(3 * self.channels, use_bias=self.qkv_bias,
                           name="to_qkv")(x)
            qkv = qkv.reshape(b, l, 3, self.heads, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        else:
            q = nn.Dense(self.channels, use_bias=self.qkv_bias,
                         name="to_q")(x).reshape(b, l, self.heads, hd)
            kv = nn.Dense(2 * self.channels, use_bias=self.qkv_bias,
                          name="to_kv")(context)
            kv = kv.reshape(b, context.shape[1], 2, self.heads, hd)
            k, v = kv[:, :, 0], kv[:, :, 1]
        if self.qk_rms_norm:
            q = MultiHeadRMSNorm(hd, self.heads, name="q_rms_norm")(q)
            k = MultiHeadRMSNorm(hd, self.heads, name="k_rms_norm")(k)
        kv_mask = ctx_mask if self.cross else mask
        bias = None
        if kv_mask is not None:
            bias = jnp.where(kv_mask[:, None, None, :], 0.0, -1e9)
        h = jax.nn.dot_product_attention(q, k, v, bias=bias)
        h = h.reshape(b, l, self.channels)
        return nn.Dense(self.channels, name="to_out")(h)


class FeedForwardNet(nn.Module):
    channels: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(int(self.channels * self.mlp_ratio),
                     name="mlp_0")(x)
        h = nn.gelu(h, approximate=True)
        return nn.Dense(self.channels, name="mlp_2")(h)


class ModulatedTransformerCrossBlock(nn.Module):
    """modulated.py:78-163 (MSA + MCA + FFN, adaLN)."""
    channels: int
    ctx_channels: int
    heads: int
    mlp_ratio: float = 4.0
    qk_rms_norm: bool = False
    qk_rms_norm_cross: bool = False
    share_mod: bool = False

    @nn.compact
    def __call__(self, x, mod, context, mask=None, ctx_mask=None):
        if self.share_mod:
            m = mod
        else:
            m = nn.Dense(6 * self.channels,
                         name="adaLN_modulation_1")(nn.silu(mod))
        (shift_msa, scale_msa, gate_msa,
         shift_mlp, scale_mlp, gate_mlp) = jnp.split(m, 6, axis=-1)
        e = lambda a: a[:, None, :]

        h = _ln(x) * (1 + e(scale_msa)) + e(shift_msa)
        h = MultiHeadAttention(self.channels, self.heads,
                               qk_rms_norm=self.qk_rms_norm,
                               name="self_attn")(h, mask=mask)
        x = x + h * e(gate_msa)
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = MultiHeadAttention(self.channels, self.heads,
                               ctx_channels=self.ctx_channels, cross=True,
                               qk_rms_norm=self.qk_rms_norm_cross,
                               name="cross_attn")(h, context,
                                                  ctx_mask=ctx_mask)
        x = x + h
        h = _ln(x) * (1 + e(scale_mlp)) + e(shift_mlp)
        h = FeedForwardNet(self.channels, self.mlp_ratio, name="mlp")(h)
        return x + h * e(gate_mlp)


class TransformerBlock(nn.Module):
    """blocks.py:63-113 (MSA + FFN, plain pre-LN, affine-free)."""
    channels: int
    heads: int
    mlp_ratio: float = 4.0
    qk_rms_norm: bool = False

    @nn.compact
    def __call__(self, x, mask=None):
        h = _ln(x)
        x = x + MultiHeadAttention(self.channels, self.heads,
                                   qk_rms_norm=self.qk_rms_norm,
                                   name="attn")(h, mask=mask)
        h = _ln(x)
        return x + FeedForwardNet(self.channels, self.mlp_ratio,
                                  name="mlp")(h)
