"""Hunyuan3D flow-matching DiT (flax).

Re-derivation of the reference double/single-stream denoiser
(`Gen_3D_Modules/Hunyuan3D_V2/hy3dgen/shapegen/models/denoisers/
hunyuan3ddit.py:155-410`, a FLUX-style architecture without RoPE —
`pe` is always None in the reference forward). Layout quirk mirrored for
conversion: qkv output channels are ordered [3, H, D] — K-major
(rearrange "B L (K H D) -> K B H L D"), i.e. plain width-block q|k|v —
with RMS qk-norm over head_dim.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    # defaults = hunyuan3d-dit-v2-0 (hunyuan3ddit.py:284-300)
    in_channels: int = 64
    context_in_dim: int = 1536
    hidden_size: int = 1024
    mlp_ratio: float = 4.0
    num_heads: int = 16
    depth: int = 16
    depth_single_blocks: int = 32
    qkv_bias: bool = True
    time_factor: float = 1000.0
    guidance_embed: bool = False     # True for the -turbo distillations


def timestep_embedding(t, dim: int, max_period=10000,
                       time_factor: float = 1000.0):
    """Sinusoidal embedding, cos|sin order (hunyuan3ddit.py:39-60)."""
    t = time_factor * t
    half = dim // 2
    freqs = jnp.exp(-np.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None].astype(jnp.float32) * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class MLPEmbedder(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden, name="in_layer")(x)
        return nn.Dense(self.hidden, name="out_layer")(nn.silu(h))


def _rmsnorm(x, scale, eps=1e-6):
    x32 = x.astype(jnp.float32)
    rrms = jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
    return (x32 * rrms).astype(x.dtype) * scale


class QKNorm(nn.Module):
    head_dim: int

    @nn.compact
    def __call__(self, q, k):
        qs = self.param("query_norm_scale", nn.initializers.ones,
                        (self.head_dim,))
        ks = self.param("key_norm_scale", nn.initializers.ones,
                        (self.head_dim,))
        return _rmsnorm(q, qs), _rmsnorm(k, ks)


def _split_qkv(qkv, heads):
    """[B, L, 3·H·D] (K-major) → three [B, L, H, D]."""
    b, l, w = qkv.shape
    hd = w // (3 * heads)
    qkv = qkv.reshape(b, l, 3, heads, hd)
    return qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]


def _modulation(vec, dim, n, name_scope):
    """silu(vec) → Linear(n·dim); returns n [B, 1, dim] chunks."""
    out = name_scope(nn.silu(vec))
    return jnp.split(out[:, None, :], n, axis=-1)


def _ln(x):
    """LayerNorm without affine (elementwise_affine=False, eps 1e-6)."""
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-6)


class DoubleStreamBlock(nn.Module):
    hidden: int
    heads: int
    mlp_ratio: float
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, img, txt, vec):
        hd = self.hidden // self.heads
        mlp_dim = int(self.hidden * self.mlp_ratio)

        img_mod = nn.Dense(6 * self.hidden, name="img_mod_lin")
        txt_mod = nn.Dense(6 * self.hidden, name="txt_mod_lin")
        im = _modulation(vec, self.hidden, 6, img_mod)
        tm = _modulation(vec, self.hidden, 6, txt_mod)
        (i_shift1, i_scale1, i_gate1, i_shift2, i_scale2, i_gate2) = im
        (t_shift1, t_scale1, t_gate1, t_shift2, t_scale2, t_gate2) = tm

        img_m = (1 + i_scale1) * _ln(img) + i_shift1
        img_qkv = nn.Dense(3 * self.hidden, use_bias=self.qkv_bias,
                           name="img_attn_qkv")(img_m)
        iq, ik, iv = _split_qkv(img_qkv, self.heads)
        iq, ik = QKNorm(hd, name="img_attn_norm")(iq, ik)

        txt_m = (1 + t_scale1) * _ln(txt) + t_shift1
        txt_qkv = nn.Dense(3 * self.hidden, use_bias=self.qkv_bias,
                           name="txt_attn_qkv")(txt_m)
        tq, tk, tv = _split_qkv(txt_qkv, self.heads)
        tq, tk = QKNorm(hd, name="txt_attn_norm")(tq, tk)

        q = jnp.concatenate([tq, iq], axis=1)
        k = jnp.concatenate([tk, ik], axis=1)
        v = jnp.concatenate([tv, iv], axis=1)
        attn = jax.nn.dot_product_attention(q, k, v)
        attn = attn.reshape(attn.shape[0], attn.shape[1], self.hidden)
        n_txt = txt.shape[1]
        txt_attn, img_attn = attn[:, :n_txt], attn[:, n_txt:]

        img = img + i_gate1 * nn.Dense(self.hidden,
                                       name="img_attn_proj")(img_attn)
        h = (1 + i_scale2) * _ln(img) + i_shift2
        h = nn.Dense(mlp_dim, name="img_mlp_0")(h)
        h = nn.gelu(h, approximate=True)
        img = img + i_gate2 * nn.Dense(self.hidden, name="img_mlp_2")(h)

        txt = txt + t_gate1 * nn.Dense(self.hidden,
                                       name="txt_attn_proj")(txt_attn)
        h = (1 + t_scale2) * _ln(txt) + t_shift2
        h = nn.Dense(mlp_dim, name="txt_mlp_0")(h)
        h = nn.gelu(h, approximate=True)
        txt = txt + t_gate2 * nn.Dense(self.hidden, name="txt_mlp_2")(h)
        return img, txt


class SingleStreamBlock(nn.Module):
    hidden: int
    heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, vec):
        hd = self.hidden // self.heads
        mlp_dim = int(self.hidden * self.mlp_ratio)
        mod = nn.Dense(3 * self.hidden, name="modulation_lin")
        shift, scale, gate = _modulation(vec, self.hidden, 3, mod)

        x_mod = (1 + scale) * _ln(x) + shift
        lin1 = nn.Dense(3 * self.hidden + mlp_dim, name="linear1")(x_mod)
        qkv, mlp = jnp.split(lin1, [3 * self.hidden], axis=-1)
        q, k, v = _split_qkv(qkv, self.heads)
        q, k = QKNorm(hd, name="norm")(q, k)
        attn = jax.nn.dot_product_attention(q, k, v)
        attn = attn.reshape(attn.shape[0], attn.shape[1], self.hidden)
        out = nn.Dense(self.hidden, name="linear2")(
            jnp.concatenate([attn, nn.gelu(mlp, approximate=True)], -1))
        return x + gate * out


class LastLayer(nn.Module):
    hidden: int
    out_channels: int

    @nn.compact
    def __call__(self, x, vec):
        mod = nn.Dense(2 * self.hidden, name="adaLN_modulation_1")
        shift, scale = _modulation(vec, self.hidden, 2, mod)
        x = (1 + scale) * _ln(x) + shift
        return nn.Dense(self.out_channels, name="linear")(x)


class Hunyuan3DDiT(nn.Module):
    cfg: DiTConfig = DiTConfig()

    @nn.compact
    def __call__(self, x, t, cond, guidance: Optional[jnp.ndarray] = None):
        """x [B, N, C] latents; t [B] in [0, 1]; cond [B, M, ctx_dim] →
        velocity [B, N, C] (hunyuan3ddit.py:381-410)."""
        c = self.cfg
        latent = nn.Dense(c.hidden_size, name="latent_in")(x)
        # quirk mirrored: the reference passes self.time_factor into the
        # max_period slot — `timestep_embedding(t, 256, self.time_factor)`
        # (hunyuan3ddit.py:391) — while time_factor stays at its default
        vec = MLPEmbedder(c.hidden_size, name="time_in")(
            timestep_embedding(t, 256, max_period=c.time_factor))
        if c.guidance_embed:
            if guidance is None:
                raise ValueError("guidance-distilled model needs guidance")
            vec = vec + MLPEmbedder(c.hidden_size, name="guidance_in")(
                timestep_embedding(guidance, 256,
                                   max_period=c.time_factor))
        cond = nn.Dense(c.hidden_size, name="cond_in")(cond)

        for i in range(c.depth):
            latent, cond = DoubleStreamBlock(
                c.hidden_size, c.num_heads, c.mlp_ratio, c.qkv_bias,
                name=f"double_blocks_{i}")(latent, cond, vec)

        n_cond = cond.shape[1]
        merged = jnp.concatenate([cond, latent], axis=1)
        for i in range(c.depth_single_blocks):
            merged = SingleStreamBlock(
                c.hidden_size, c.num_heads, c.mlp_ratio,
                name=f"single_blocks_{i}")(merged, vec)
        latent = merged[:, n_cond:]
        return LastLayer(c.hidden_size, c.in_channels,
                         name="final_layer")(latent, vec)
