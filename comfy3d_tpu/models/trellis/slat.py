"""TRELLIS SLAT models on the ops.sparse backend (flax).

Counterparts: `trellis/models/structured_latent_flow.py` (SLatFlowModel
— sparse UNet: IO res blocks with pooled skip connections around a
modulated sparse cross-attention transformer torso) and
`trellis/models/structured_latent_vae/{base,decoder_gs,decoder_mesh}.py`
(SLAT decoders — sparse transformer + subdivide upsampling heads).

All modules take a `SparseVoxels` (fixed-capacity padded pytree); the
"sparse" structure lives in coords/mask while every FLOP runs as a dense
masked op (attention with bias, gather-GEMM convs).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops import sparse as sp
from .blocks import (MultiHeadAttention, MultiHeadRMSNorm,
                     FeedForwardNet, TimestepEmbedder, abs_pos_embed,
                     _ln)


class SparseConv3d(nn.Module):
    """Submanifold 3³ conv module over SparseVoxels."""
    out_channels: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, st: sp.SparseVoxels, res: int,
                 grid: Optional[jnp.ndarray] = None) -> sp.SparseVoxels:
        cin = st.feats.shape[-1]
        if self.kernel_size == 1:
            w = self.param("kernel", nn.initializers.lecun_normal(),
                           (1, 1, 1, cin, self.out_channels))
        else:
            w = self.param("kernel", nn.initializers.lecun_normal(),
                           (3, 3, 3, cin, self.out_channels))
        b = self.param("bias", nn.initializers.zeros,
                       (self.out_channels,))
        if self.kernel_size == 1:
            out = st.feats @ w[0, 0, 0] + b
            return st.replace_feats(out * st.mask[:, None])
        return sp.subm_conv3d(st, w, b, res, grid)


class SparseResBlock3d(nn.Module):
    """structured_latent_flow.py:14-66: LN → silu → conv → modulated LN
    → silu → conv, with optional down/upsample and linear skip."""
    out_channels: int
    downsample: bool = False
    upsample: bool = False

    @nn.compact
    def __call__(self, st: sp.SparseVoxels, emb, res: int,
                 cache: Optional[dict] = None):
        cin = st.feats.shape[-1]
        m = nn.Dense(2 * self.out_channels,
                     name="emb_layers_1")(nn.silu(emb))
        scale, shift = jnp.split(m, 2, axis=-1)

        if self.downsample:
            st, cache = sp.downsample2(st, res)
            res = res // 2
        elif self.upsample:
            st = sp.upsample2(st, cache)
            res = res * 2

        s1 = self.param("norm1_scale", nn.initializers.ones, (cin,))
        b1 = self.param("norm1_bias", nn.initializers.zeros, (cin,))
        h = st.replace_feats(nn.silu(_ln(st.feats) * s1 + b1)
                             * st.mask[:, None])
        h = SparseConv3d(self.out_channels, name="conv1")(h, res)
        hf = _ln(h.feats) * (1 + scale) + shift
        h = h.replace_feats(nn.silu(hf) * h.mask[:, None])
        h = SparseConv3d(self.out_channels, name="conv2")(h, res)
        skip = st.feats
        if cin != self.out_channels:
            skip = nn.Dense(self.out_channels,
                            name="skip_connection")(st.feats)
        out = st.replace_feats((h.feats + skip) * st.mask[:, None])
        return out, res, cache


class ModulatedSparseCrossBlock(nn.Module):
    """sparse/transformer/modulated.py ModulatedSparseTransformerCross-
    Block: same math as the dense block, tokens = padded voxel set."""
    channels: int
    ctx_channels: int
    heads: int
    mlp_ratio: float = 4.0
    qk_rms_norm: bool = False
    qk_rms_norm_cross: bool = False
    share_mod: bool = False

    @nn.compact
    def __call__(self, st: sp.SparseVoxels, mod, context, ctx_mask=None):
        if self.share_mod:
            m = mod
        else:
            m = nn.Dense(6 * self.channels,
                         name="adaLN_modulation_1")(nn.silu(mod))
        (shift_msa, scale_msa, gate_msa,
         shift_mlp, scale_mlp, gate_mlp) = jnp.split(m, 6, axis=-1)
        x = st.feats[None]                       # [1, N, C]
        mask = st.mask

        h = _ln(x) * (1 + scale_msa[:, None]) + shift_msa[:, None]
        h = MultiHeadAttention(self.channels, self.heads,
                               qk_rms_norm=self.qk_rms_norm,
                               name="self_attn")(h, mask=mask[None])
        x = x + h * gate_msa[:, None]
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = MultiHeadAttention(self.channels, self.heads,
                               ctx_channels=self.ctx_channels, cross=True,
                               qk_rms_norm=self.qk_rms_norm_cross,
                               name="cross_attn")(h, context,
                                                  ctx_mask=ctx_mask)
        x = x + h
        h = _ln(x) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        h = FeedForwardNet(self.channels, self.mlp_ratio, name="mlp")(h)
        x = x + h * gate_mlp[:, None]
        return st.replace_feats(x[0] * mask[:, None])


@dataclasses.dataclass(frozen=True)
class SLatFlowConfig:
    resolution: int = 64
    in_channels: int = 8
    model_channels: int = 1024
    cond_channels: int = 1024
    out_channels: int = 8
    num_blocks: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    patch_size: int = 2
    num_io_res_blocks: int = 2
    io_block_channels: Tuple[int, ...] = (128,)
    share_mod: bool = False
    qk_rms_norm: bool = False
    qk_rms_norm_cross: bool = False
    use_skip_connection: bool = True


class SLatFlowModel(nn.Module):
    cfg: SLatFlowConfig = SLatFlowConfig()

    @nn.compact
    def __call__(self, st: sp.SparseVoxels, t, cond, ctx_mask=None
                 ) -> sp.SparseVoxels:
        c = self.cfg
        res = c.resolution
        h = st.replace_feats(
            nn.Dense(c.io_block_channels[0], name="input_layer")(st.feats)
            * st.mask[:, None])
        t_emb = TimestepEmbedder(c.model_channels, name="t_embedder")(t)
        if c.share_mod:
            t_emb = nn.Dense(6 * c.model_channels,
                             name="adaLN_modulation_1")(nn.silu(t_emb))

        skips = []
        caches = []
        bi = 0
        chans = list(c.io_block_channels)
        for stage, (chs, next_chs) in enumerate(
                zip(chans, chans[1:] + [c.model_channels])):
            for _ in range(c.num_io_res_blocks - 1):
                h, res, _ = SparseResBlock3d(
                    chs, name=f"input_blocks_{bi}")(h, t_emb, res)
                skips.append(h.feats)
                bi += 1
            h, res, cache = SparseResBlock3d(
                next_chs, downsample=True,
                name=f"input_blocks_{bi}")(h, t_emb, res)
            skips.append(h.feats)
            caches.append(cache)
            bi += 1

        pos = abs_pos_embed(h.coords[:, 1:], c.model_channels)
        h = h.replace_feats((h.feats + pos) * h.mask[:, None])
        for i in range(c.num_blocks):
            h = ModulatedSparseCrossBlock(
                c.model_channels, c.cond_channels, c.num_heads,
                c.mlp_ratio, c.qk_rms_norm, c.qk_rms_norm_cross,
                c.share_mod, name=f"blocks_{i}")(h, t_emb, cond,
                                                 ctx_mask=ctx_mask)

        bi = 0
        for stage, (chs, prev_chs) in enumerate(
                zip(reversed(chans),
                    [c.model_channels] + list(reversed(chans[1:])))):
            skip = skips.pop()
            if c.use_skip_connection:
                h = h.replace_feats(
                    jnp.concatenate([h.feats, skip], axis=-1))
            h, res, _ = SparseResBlock3d(
                chs, upsample=True,
                name=f"out_blocks_{bi}")(h, t_emb, res,
                                         cache=caches.pop())
            bi += 1
            for _ in range(c.num_io_res_blocks - 1):
                skip = skips.pop()
                if c.use_skip_connection:
                    h = h.replace_feats(
                        jnp.concatenate([h.feats, skip], axis=-1))
                h, res, _ = SparseResBlock3d(
                    chs, name=f"out_blocks_{bi}")(h, t_emb, res)
                bi += 1

        hf = _ln(h.feats)
        hf = nn.Dense(c.out_channels, name="out_layer")(hf)
        return h.replace_feats(hf * h.mask[:, None])


# ------------------------------------------------------------------ #
# SLAT decoders
# ------------------------------------------------------------------ #
class SparseTransformerBlock(nn.Module):
    """sparse/transformer/blocks.py SparseTransformerBlock (swin or
    full attention + FFN, plain pre-LN affine-free)."""
    channels: int
    heads: int
    mlp_ratio: float = 4.0
    attn_mode: str = "full"            # full | swin
    window_size: int = 8
    shift: Tuple[int, int, int] = (0, 0, 0)
    qk_rms_norm: bool = False

    @nn.compact
    def __call__(self, st: sp.SparseVoxels, res: int) -> sp.SparseVoxels:
        x = st.feats
        mask = st.mask
        hd = self.channels // self.heads
        h = _ln(x)
        if self.attn_mode == "full":
            attn = MultiHeadAttention(self.channels, self.heads,
                                      qk_rms_norm=self.qk_rms_norm,
                                      name="attn")(h[None],
                                                   mask=mask[None])[0]
        else:
            qkv = nn.Dense(3 * self.channels, name="attn_to_qkv")(h)
            qkv = qkv.reshape(-1, 3, self.heads, hd)
            if self.qk_rms_norm:
                q = MultiHeadRMSNorm(hd, self.heads, name="attn_q_rms")(
                    qkv[:, 0][None])[0]
                k = MultiHeadRMSNorm(hd, self.heads, name="attn_k_rms")(
                    qkv[:, 1][None])[0]
                qkv = jnp.stack([q, k, qkv[:, 2]], axis=1)
            o = sp.windowed_attention(qkv, st, res, self.window_size,
                                      self.heads, self.shift)
            attn = nn.Dense(self.channels, name="attn_to_out")(o)
        x = x + attn * mask[:, None]
        h = _ln(x)
        x = x + FeedForwardNet(self.channels, self.mlp_ratio,
                               name="mlp")(h) * mask[:, None]
        return st.replace_feats(x)


@dataclasses.dataclass(frozen=True)
class SLatDecoderConfig:
    resolution: int = 64
    model_channels: int = 768
    latent_channels: int = 8
    num_blocks: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    attn_mode: str = "swin"
    window_size: int = 8
    qk_rms_norm: bool = False
    # gaussian head (representation_config in the ckpt json)
    num_gaussians: int = 32
    voxel_size: float = 1.5
    scaling_bias: float = 0.01
    opacity_bias: float = 0.1
    lr_xyz: float = 1.0
    lr_feat: float = 1.0
    lr_rot: float = 1.0
    perturb_offset: bool = True
    scaling_activation: str = "softplus"
    min_kernel_size: float = 0.0     # 3d_filter_kernel_size


class SLatDecoderBase(nn.Module):
    cfg: SLatDecoderConfig

    def torso(self, st: sp.SparseVoxels) -> sp.SparseVoxels:
        c = self.cfg
        h = st.replace_feats(
            nn.Dense(c.model_channels, name="input_layer")(st.feats)
            * st.mask[:, None])
        pos = abs_pos_embed(st.coords[:, 1:], c.model_channels)
        h = h.replace_feats((h.feats + pos) * h.mask[:, None])
        for i in range(c.num_blocks):
            if c.attn_mode == "swin":
                mode = "swin"
                shift = ((c.window_size // 2) * (i % 2),) * 3
            else:
                mode = "full"
                shift = (0, 0, 0)
            h = SparseTransformerBlock(
                c.model_channels, c.num_heads, c.mlp_ratio, mode,
                c.window_size, shift, c.qk_rms_norm,
                name=f"blocks_{i}")(h, c.resolution)
        return h


def _radical_inverse(base: int, n: int) -> float:
    val, inv = 0.0, 1.0 / base
    inv_n = inv
    while n > 0:
        val += (n % base) * inv_n
        n //= base
        inv_n *= inv
    return val


def hammersley_perturbation(g: int, voxel_size: float) -> np.ndarray:
    """decoder_gs.py:58-63: atanh-warped 3D hammersley offsets, one per
    gaussian slot."""
    pts = np.array([[i / g, _radical_inverse(2, i),
                     _radical_inverse(3, i)] for i in range(g)],
                   np.float32)
    return np.arctanh(np.clip((pts * 2.0 - 1.0) / voxel_size,
                              -1.0 + 1e-6, 1.0 - 1e-6))


class SLatGaussianDecoder(SLatDecoderBase):
    """decoder_gs.py:11-122 → per-voxel gaussian bundles (lr-scaled
    groups + perturbed-offset tanh placement per to_representation)."""
    cfg: SLatDecoderConfig = SLatDecoderConfig()

    @nn.compact
    def __call__(self, st: sp.SparseVoxels):
        c = self.cfg
        g = c.num_gaussians
        out_ch = g * (3 + 3 + 3 + 4 + 1)
        h = self.torso(st)
        hf = _ln(h.feats)
        hf = nn.Dense(out_ch, kernel_init=nn.initializers.zeros,
                      name="out_layer")(hf)
        n = st.capacity
        sizes = [3 * g, 3 * g, 3 * g, 4 * g, g]
        ofs = np.cumsum([0] + sizes)
        xyz_off = hf[:, ofs[0]:ofs[1]].reshape(n, g, 3) * c.lr_xyz
        if c.perturb_offset:
            xyz_off = xyz_off + jnp.asarray(
                hammersley_perturbation(g, c.voxel_size))[None]
        feat_dc = hf[:, ofs[1]:ofs[2]].reshape(n, g, 3) * c.lr_feat
        scaling = hf[:, ofs[2]:ofs[3]].reshape(n, g, 3) * c.lr_feat
        rotation = hf[:, ofs[3]:ofs[4]].reshape(n, g, 4) * c.lr_rot
        opacity = hf[:, ofs[4]:ofs[5]].reshape(n, g) * c.lr_feat
        center = (st.coords[:, 1:].astype(jnp.float32) + 0.5) \
            / c.resolution
        xyz = center[:, None, :] + jnp.tanh(xyz_off) \
            / c.resolution * 0.5 * c.voxel_size
        return {"xyz": xyz, "features_dc": feat_dc, "scaling": scaling,
                "rotation": rotation, "opacity": opacity,
                "mask": st.mask}


class SparseSubdivideBlock3d(nn.Module):
    """decoder_mesh.py:13-69: groupnorm-silu → subdivide → conv stack."""
    out_channels: int
    num_groups: int = 32

    @nn.compact
    def __call__(self, st: sp.SparseVoxels, res: int):
        cin = st.feats.shape[-1]
        s = self.param("norm_scale", nn.initializers.ones, (cin,))
        b = self.param("norm_bias", nn.initializers.zeros, (cin,))
        h = st.replace_feats(
            nn.silu(masked_group_norm(st.feats, st.mask, self.num_groups,
                                      s, b)) * st.mask[:, None])
        h = sp.subdivide(h)
        x = sp.subdivide(st)
        out_res = res * 2
        h = SparseConv3d(self.out_channels, name="conv1")(h, out_res)
        s2 = self.param("norm2_scale", nn.initializers.ones,
                        (self.out_channels,))
        b2 = self.param("norm2_bias", nn.initializers.zeros,
                        (self.out_channels,))
        h = h.replace_feats(
            nn.silu(masked_group_norm(h.feats, h.mask, self.num_groups,
                                      s2, b2)) * h.mask[:, None])
        h = SparseConv3d(self.out_channels, name="conv2")(h, out_res)
        if self.out_channels == cin:
            skip = x.feats
        else:
            skip = SparseConv3d(self.out_channels, kernel_size=1,
                                name="skip_connection")(x, out_res).feats
        return h.replace_feats((h.feats + skip) * h.mask[:, None]), \
            out_res


def _fit_groups(c: int, num_groups: int) -> int:
    """Largest divisor of c that is ≤ num_groups (reference uses 32 and
    channel counts that are multiples of 32; tiny test configs aren't)."""
    g = min(num_groups, c)
    while c % g:
        g -= 1
    return g


def masked_group_norm(feats, mask, num_groups, scale, bias, eps=1e-5):
    """GroupNorm over (group channels × active voxels) — the reference
    SparseGroupNorm treats the voxel axis as spatial (sparse/norm.py)."""
    n, c = feats.shape
    g = _fit_groups(c, num_groups)
    f = feats.reshape(n, g, c // g)
    m = mask[:, None, None].astype(feats.dtype)
    cnt = jnp.maximum(mask.sum() * (c // g), 1.0)
    mean = (f * m).sum(axis=(0, 2), keepdims=True) / cnt
    var = (((f - mean) ** 2) * m).sum(axis=(0, 2), keepdims=True) / cnt
    out = (f - mean) * jax.lax.rsqrt(var + eps)
    return out.reshape(n, c) * scale + bias


class SLatMeshDecoder(SLatDecoderBase):
    """decoder_mesh.py:72-167: torso → 2× subdivide blocks → FlexiCubes
    feature head at 4× resolution."""
    cfg: SLatDecoderConfig = SLatDecoderConfig()
    upsample_channels: Optional[Tuple[int, ...]] = None
    out_channels: int = 101     # SparseFeatures2Mesh feature layout

    @nn.compact
    def __call__(self, st: sp.SparseVoxels):
        c = self.cfg
        h = self.torso(st)
        res = c.resolution
        # reference decoder_mesh.py:107-118: mc → mc//4 → mc//8
        ups = self.upsample_channels or (c.model_channels // 4,
                                         c.model_channels // 8)
        for i, ch in enumerate(ups):
            h, res = SparseSubdivideBlock3d(
                ch, name=f"upsample_{i}")(h, res)
        hf = nn.Dense(self.out_channels, name="out_layer")(h.feats)
        return h.replace_feats(hf * h.mask[:, None]), res
