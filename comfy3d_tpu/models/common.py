"""Shared flax building blocks for the model zoo.

The reference vendors a diffusers-style transformer stack per family
(e.g. TripoSR `models/transformer/{attention,basic_transformer_block,
transformer_1d}.py`, InstantMesh, LGM, ...). Here one set of flax modules
serves all families; attention uses `jax.nn.dot_product_attention` so XLA
lowers it to the fused TPU attention path (the xformers/flash-attn role,
SURVEY.md §2.6 E9).

Weight-conversion convention: all Dense kernels are stored flax-style
[in, out]; `models.convert` transposes torch [out, in] weights on load.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class Attention(nn.Module):
    """Multi-head (self or cross) attention, diffusers `Attention` layout:
    to_q / to_k / to_v / to_out.0."""
    query_dim: int
    heads: int = 8
    dim_head: int = 64
    cross_attention_dim: Optional[int] = None
    out_bias: bool = True
    qkv_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, mask=None):
        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=self.qkv_bias, name="to_q",
                     dtype=self.dtype)(x)
        k = nn.Dense(inner, use_bias=self.qkv_bias, name="to_k",
                     dtype=self.dtype)(ctx)
        v = nn.Dense(inner, use_bias=self.qkv_bias, name="to_v",
                     dtype=self.dtype)(ctx)
        b, nq = q.shape[0], q.shape[1]
        nk = k.shape[1]
        q = q.reshape(b, nq, self.heads, self.dim_head)
        k = k.reshape(b, nk, self.heads, self.dim_head)
        v = v.reshape(b, nk, self.heads, self.dim_head)
        bias = None
        if mask is not None:
            bias = jnp.where(mask[:, None, None, :], 0.0, -1e9)
        out = jax.nn.dot_product_attention(q, k, v, bias=bias)
        out = out.reshape(b, nq, inner)
        return nn.Dense(self.query_dim, use_bias=self.out_bias,
                        name="to_out_0", dtype=self.dtype)(out)


class GEGLU(nn.Module):
    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_out * 2, name="proj", dtype=self.dtype)(x)
        a, gate = jnp.split(h, 2, axis=-1)
        return a * nn.gelu(gate)


class FeedForward(nn.Module):
    """diffusers FeedForward: GEGLU → Dense (net.0.proj / net.2)."""
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = GEGLU(self.dim * self.mult, name="net_0", dtype=self.dtype)(x)
        return nn.Dense(self.dim, name="net_2", dtype=self.dtype)(h)


class BasicTransformerBlock(nn.Module):
    """LayerNorm→self-attn→LayerNorm→cross-attn→LayerNorm→GEGLU-FF, all
    with residuals (reference basic_transformer_block.py:96-190)."""
    dim: int
    heads: int
    dim_head: int
    cross_attention_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, mask=None, context_mask=None):
        h = nn.LayerNorm(name="norm1", dtype=self.dtype)(x)
        x = x + Attention(self.dim, self.heads, self.dim_head,
                          name="attn1", dtype=self.dtype)(h, mask=mask)
        if self.cross_attention_dim is not None:
            h = nn.LayerNorm(name="norm2", dtype=self.dtype)(x)
            x = x + Attention(self.dim, self.heads, self.dim_head,
                              cross_attention_dim=self.cross_attention_dim,
                              name="attn2", dtype=self.dtype)(
                h, context=context, mask=context_mask)
        h = nn.LayerNorm(name="norm3", dtype=self.dtype)(x)
        x = x + FeedForward(self.dim, name="ff", dtype=self.dtype)(h)
        return x


class Transformer1D(nn.Module):
    """Channel-major 1D transformer (reference transformer_1d.py:50-220):
    GroupNorm over channels → proj_in → N blocks → proj_out → +residual.
    Input/output [B, C, T]."""
    in_channels: int
    num_layers: int
    heads: int
    dim_head: int
    cross_attention_dim: Optional[int] = None
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        residual = x
        h = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6,
                         name="norm", dtype=self.dtype)(
            x.transpose(0, 2, 1)).transpose(0, 2, 1)
        h = h.transpose(0, 2, 1)                       # [B, T, C]
        h = nn.Dense(self.heads * self.dim_head, name="proj_in",
                     dtype=self.dtype)(h)
        for i in range(self.num_layers):
            h = BasicTransformerBlock(
                self.heads * self.dim_head, self.heads, self.dim_head,
                cross_attention_dim=self.cross_attention_dim,
                name=f"blocks_{i}", dtype=self.dtype)(h, context=context)
        h = nn.Dense(self.in_channels, name="proj_out", dtype=self.dtype)(h)
        return h.transpose(0, 2, 1) + residual


# ------------------------------------------------------------------ #
# ViT (DINO-style) — the HF ViTModel role for image tokenizers
# ------------------------------------------------------------------ #
class ViTSelfAttention(nn.Module):
    hidden: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hd = self.hidden // self.heads
        q = nn.Dense(self.hidden, name="query", dtype=self.dtype)(x)
        k = nn.Dense(self.hidden, name="key", dtype=self.dtype)(x)
        v = nn.Dense(self.hidden, name="value", dtype=self.dtype)(x)
        b, t = x.shape[0], x.shape[1]
        rs = lambda a: a.reshape(b, t, self.heads, hd)
        out = jax.nn.dot_product_attention(rs(q), rs(k), rs(v))
        out = out.reshape(b, t, self.hidden)
        return nn.Dense(self.hidden, name="out", dtype=self.dtype)(out)


class ViTBlock(nn.Module):
    hidden: int
    heads: int
    mlp_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-12, name="ln1", dtype=self.dtype)(x)
        x = x + ViTSelfAttention(self.hidden, self.heads, name="attn",
                                 dtype=self.dtype)(h)
        h = nn.LayerNorm(epsilon=1e-12, name="ln2", dtype=self.dtype)(x)
        h = nn.Dense(self.mlp_dim, name="mlp_in", dtype=self.dtype)(h)
        h = nn.gelu(h, approximate=False)
        x = x + nn.Dense(self.hidden, name="mlp_out", dtype=self.dtype)(h)
        return x


class ViT(nn.Module):
    """DINO/HF-ViT encoder: conv patch embed + cls token + interpolated
    position embeddings + pre-LN blocks + final LN.

    Mirrors `transformers.ViTModel(interpolate_pos_encoding=True)` as used
    by the reference image tokenizers (TripoSR `tokenizers/image.py:44-63`,
    InstantMesh DINO wrapper). Input NHWC in [0,1]; ImageNet normalization
    is applied by callers (it is model-specific).
    """
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    patch: int = 16
    pretrain_grid: int = 14       # 224/16 — checkpoint pos-emb grid
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        b, h, w, _ = images.shape
        gh, gw = h // self.patch, w // self.patch
        x = nn.Conv(self.hidden, (self.patch, self.patch),
                    strides=(self.patch, self.patch), padding="VALID",
                    name="patch_embed", dtype=self.dtype)(images)
        x = x.reshape(b, gh * gw, self.hidden)

        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.hidden))
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, self.pretrain_grid ** 2 + 1, self.hidden))
        pos_cls, pos_patch = pos[:, :1], pos[:, 1:]
        if (gh, gw) != (self.pretrain_grid, self.pretrain_grid):
            grid = pos_patch.reshape(1, self.pretrain_grid,
                                     self.pretrain_grid, self.hidden)
            grid = jax.image.resize(grid, (1, gh, gw, self.hidden),
                                    method="bicubic")
            pos_patch = grid.reshape(1, gh * gw, self.hidden)
        x = x + pos_patch
        cls_tok = jnp.broadcast_to(cls, (b, 1, self.hidden)) + pos_cls
        x = jnp.concatenate([cls_tok, x], axis=1)

        for i in range(self.layers):
            x = ViTBlock(self.hidden, self.heads, self.mlp_dim,
                         name=f"block_{i}", dtype=self.dtype)(x)
        return nn.LayerNorm(epsilon=1e-12, name="ln_final",
                            dtype=self.dtype)(x)


IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225])


def imagenet_normalize(images_nhwc):
    return (images_nhwc - IMAGENET_MEAN) / IMAGENET_STD
