"""Stable-Diffusion-class conditional UNet in flax.

The denoiser backbone behind the reference's multi-view diffusion families
(Zero123Plus `Gen_3D_Modules/Zero123Plus/pipeline.py`, Wonder3D, Era3D,
MVDream/ImageDream in LGM & CRM): a UNet2DConditionModel with
(CrossAttn)Down/Mid/Up blocks, GroupNorm-SiLU-Conv resnets, spatial
transformers with self+cross attention, and sinusoidal time embeddings.
Layer names follow the diffusers checkpoint layout so `convert.py` rules
map weights 1:1.

Multi-view conditioning hook: every self-attention can append externally
recorded K/V ("reference attention", the mechanism Zero123Plus uses to
condition on the input image — pipeline.py RefOnlyNoisedUNet): call with
`ref_mode="write"` to capture each self-attn's hidden states into the
returned dict, then `ref_mode="read"` + `ref_hidden` to concatenate them
as extra keys/values.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    attention_head_dim: int = 64     # per-head dim (SD2.x convention)
    norm_groups: int = 32
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D", "DownBlock2D")
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D")
    # >1 → MVDream-style 3D self-attention: the batch is B·mv_views and
    # every self-attention attends across all views' tokens jointly
    mv_views: int = 1
    # Wonder3D cross-domain joint attention: the batch is 2·B·mv_views
    # (normal + color domains) and every block adds attn_joint_mid
    # (transformer_mv2d.py:509-526)
    cd_joint: bool = False
    # Era3D row-wise ("epipolar") multiview self-attention: tokens
    # attend within their image row across views
    # (Era3D transformer_mv2d_rowwise.py:689-705)
    mv_rowwise: bool = False
    # ImageDream IP-adapter: the last ip_dim context tokens get their
    # own to_k_ip/to_v_ip in every cross-attention
    # (LGM/mvdream/mv_unet.py:160-246)
    ip_dim: int = 0
    ip_weight: float = 1.0
    # Hunyuan paint 2p5D blocks (Hunyuan3D_V2 hy3dgen/texgen/
    # hunyuanpaint/unet/modules.py:46-246, shared by Hunyuan3D 2.1
    # hunyuanpaintpbr): attn1 stays PER-VIEW; a separate attn_refview
    # cross-attends to reference-pass norm1 tokens (mode 'r'/'w') and a
    # separate attn_multiview self-attends over all views' tokens
    # folded together. mv_views gives attn_multiview's fold width.
    use_ma: bool = False
    use_ra: bool = False
    mva_scale: float = 1.0
    ref_scale: float = 1.0
    # SDXL extensions (UNet2DConditionModel config):
    # per-cross-attn-block transformer depth (scalar or per-block
    # tuple; the mid block uses the last entry)
    transformer_depth: Tuple[int, ...] | int = 1
    # "text_time": add_embedding over [pooled text emb, fourier
    # time_ids] (SDXL added_cond_kwargs)
    addition_embed_type: str = ""
    addition_time_embed_dim: int = 256
    # projection_class_embeddings_input_dim: pooled-text dim +
    # 6·addition_time_embed_dim (SDXL: 1280 + 1536 = 2816)
    addition_proj_dim: int = 2816
    # MV-Adapter decoupled attention (MV_Adapter/mvadapter/models/
    # attention_processor.py:380 DecoupledMVRowColSelfAttnProcessor2_0):
    # every self-attn gains separate q/k/v/out "mv" (row+col attention
    # across views) and optionally "ref" (cross-attn to cached ref
    # norm1 tokens) branches, added residually with mv/ref scales
    mv_decoupled: bool = False
    mv_use_ref: bool = True

    def depth_of(self, block_index: int) -> int:
        d = self.transformer_depth
        if isinstance(d, (tuple, list)):
            return d[block_index] if block_index < len(d) else d[-1]
        return d

    @classmethod
    def sd15(cls) -> "UNetConfig":
        return cls(cross_attention_dim=768, attention_head_dim=-8)

    @classmethod
    def sd21(cls) -> "UNetConfig":
        return cls(cross_attention_dim=1024, attention_head_dim=64)

    @classmethod
    def sdxl(cls) -> "UNetConfig":
        return cls(block_out_channels=(320, 640, 1280),
                   cross_attention_dim=2048, attention_head_dim=64,
                   down_block_types=("DownBlock2D",
                                     "CrossAttnDownBlock2D",
                                     "CrossAttnDownBlock2D"),
                   up_block_types=("CrossAttnUpBlock2D",
                                   "CrossAttnUpBlock2D", "UpBlock2D"),
                   transformer_depth=(1, 2, 10),
                   addition_embed_type="text_time")


def timestep_embedding(t: jnp.ndarray, dim: int,
                       max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal embedding, diffusers `Timesteps` (flip_sin_to_cos=True,
    downscale_freq_shift=0)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class ResnetBlock(nn.Module):
    out_channels: int
    norm_groups: int = 32

    @nn.compact
    def __call__(self, x, temb):
        h = nn.GroupNorm(self.norm_groups, epsilon=1e-5, name="norm1")(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=1,
                    name="conv1")(nn.silu(h))
        temb_proj = nn.Dense(self.out_channels,
                             name="time_emb_proj")(nn.silu(temb))
        h = h + temb_proj[:, None, None, :]
        h = nn.GroupNorm(self.norm_groups, epsilon=1e-5, name="norm2")(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1,
                    name="conv2")(nn.silu(h))
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1),
                        name="conv_shortcut")(x)
        return x + h


class CrossAttention(nn.Module):
    """diffusers Attention (to_q/to_k/to_v/to_out.0) with the reference-
    attention K/V append hook on self-attention."""
    query_dim: int
    heads: int
    dim_head: int
    context_dim: Optional[int] = None
    # ImageDream IP-adapter (LGM/mvdream/mv_unet.py:160-246): the last
    # ip_dim context tokens ride separate to_k_ip/to_v_ip projections
    # and their attention output is added with weight ip_weight
    ip_dim: int = 0
    ip_weight: float = 1.0

    def _attend(self, q, k, v):
        b, nq = q.shape[0], q.shape[1]
        nk = k.shape[1]
        inner = self.heads * self.dim_head
        q = q.reshape(b, nq, self.heads, self.dim_head)
        k = k.reshape(b, nk, self.heads, self.dim_head)
        v = v.reshape(b, nk, self.heads, self.dim_head)
        out = jax.nn.dot_product_attention(q, k, v)
        return out.reshape(b, nq, inner)

    @nn.compact
    def __call__(self, x, context=None, extra_kv=None):
        inner = self.heads * self.dim_head
        is_cross = context is not None
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        ip_ctx = None
        if self.ip_dim > 0 and is_cross:
            ip_ctx = ctx[:, -self.ip_dim:]
            ctx = ctx[:, :-self.ip_dim]
        if extra_kv is not None:
            ctx = jnp.concatenate([ctx, extra_kv], axis=1)
        k = nn.Dense(inner, use_bias=False, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, name="to_v")(ctx)
        out = self._attend(q, k, v)
        if ip_ctx is not None:
            k_ip = nn.Dense(inner, use_bias=False, name="to_k_ip")(ip_ctx)
            v_ip = nn.Dense(inner, use_bias=False, name="to_v_ip")(ip_ctx)
            out = out + self.ip_weight * self._attend(q, k_ip, v_ip)
        return nn.Dense(self.query_dim, name="to_out_0")(out)


class DecoupledRowColAttention(nn.Module):
    """MV-Adapter's decoupled multi-view attention
    (attention_processor.py:380-745, DecoupledMVRowColSelfAttnProcessor):
    separate q/k/v/out projections; with 6 views, row-wise attention
    over views [0,1,2,3] (tokens of one image ROW across those views)
    plus column-wise attention over views [0-flipped,2,4,5], averaged
    where a view appears in both. For other view counts, row attention
    over all views (the DecoupledMVRowSelfAttnProcessor variant)."""
    query_dim: int
    heads: int
    dim_head: int

    @nn.compact
    def __call__(self, h, spatial_h: int, views: int):
        inner = self.heads * self.dim_head
        b, t, _ = h.shape
        B = b // views
        ih = spatial_h
        iw = t // ih
        q = nn.Dense(inner, use_bias=False, name="to_q")(h)
        k = nn.Dense(inner, use_bias=False, name="to_k")(h)
        v = nn.Dense(inner, use_bias=False, name="to_v")(h)

        def grid(x):
            return x.reshape(B, views, ih, iw, self.heads,
                             self.dim_head)

        qg, kg, vg = grid(q), grid(k), grid(v)

        def attend_rows(qr, kr, vr):
            # [B, nv, ih, iw, H, D] → attention over (nv·iw) per row
            nv = qr.shape[1]

            def fold(x):
                return x.transpose(0, 2, 1, 3, 4, 5).reshape(
                    B * ih, nv * iw, self.heads, self.dim_head)

            out = jax.nn.dot_product_attention(fold(qr), fold(kr),
                                               fold(vr))
            return out.reshape(B, ih, nv, iw, inner).transpose(
                0, 2, 1, 3, 4)                      # [B, nv, ih, iw, C]

        if views == 6:
            # row pass: views 0..3 (front/right/back/left)
            row = attend_rows(qg[:, :4], kg[:, :4], vg[:, :4])
            # col pass: views [0 flipped, 2, 4, 5]; columns attend, so
            # transpose the grid (ih↔iw) and reuse the row kernel
            def colsel(x):
                sel = jnp.concatenate(
                    [x[:, 0:1, :, ::-1], x[:, 2:3], x[:, 4:6]], axis=1)
                return sel.transpose(0, 1, 3, 2, 4, 5)
            col = attend_rows(colsel(qg), colsel(kg), colsel(vg))
            col = col.transpose(0, 1, 3, 2, 4)      # back to [ih, iw]
            col0 = col[:, 0, :, ::-1]               # flip view 0 back
            out = jnp.stack([
                (row[:, 0] + col0) / 2.0,
                row[:, 1],
                (row[:, 2] + col[:, 1]) / 2.0,
                row[:, 3],
                col[:, 2],
                col[:, 3],
            ], axis=1)
        else:
            out = attend_rows(qg, kg, vg)
        out = out.reshape(b, t, inner)
        return nn.Dense(self.query_dim, name="to_out_0")(out)


class TransformerBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    context_dim: int
    cd_joint: bool = False        # Wonder3D cross-domain attention
    mv_views: int = 1             # needed to unfold frames for cd_joint
    mv_rowwise: bool = False      # Era3D row-wise multiview attention
    spatial_h: int = 0            # token-grid height (rowwise only)
    ip_dim: int = 0               # ImageDream IP tokens in attn2
    ip_weight: float = 1.0
    use_ma: bool = False          # Hunyuan paint attn_multiview
    use_ra: bool = False          # Hunyuan paint attn_refview
    mva_scale: float = 1.0
    ref_scale: float = 1.0
    mv_decoupled: bool = False    # MV-Adapter decoupled mv/ref attn
    mv_use_ref: bool = True

    @nn.compact
    def __call__(self, x, context, ref_mode=None, ref_hidden=None):
        written = None
        h = nn.LayerNorm(name="norm1")(x)
        if ref_mode == "write":
            written = h
        extra = ref_hidden if ref_mode == "read" else None
        attn1 = CrossAttention(self.dim, self.heads, self.dim_head,
                               name="attn1")
        if self.mv_decoupled:
            # MV-Adapter decoupled branches (attention_processor.py:
            # 380-745): base per-view self-attn + separate-projection
            # row/col multi-view attn + ref cross-attn, added with
            # scales. The reference ("write") pass runs with
            # use_mv/use_ref disabled and caches the norm1 tokens —
            # exactly our `written` contract.
            x = x + attn1(h)
            if ref_mode != "write":
                x = x + self.mva_scale * DecoupledRowColAttention(
                    self.dim, self.heads, self.dim_head,
                    name="attn1_mv")(h, spatial_h=self.spatial_h,
                                     views=self.mv_views)
                if self.mv_use_ref:
                    ref = extra if extra is not None else h
                    if ref.shape[0] != h.shape[0]:
                        ref = jnp.repeat(
                            ref, h.shape[0] // ref.shape[0], axis=0)
                    out = CrossAttention(
                        self.dim, self.heads, self.dim_head,
                        name="attn1_ref")(h, context=ref)
                    x = x + (self.ref_scale if extra is not None
                             else 0.0) * out
        elif self.use_ma or self.use_ra:
            # Hunyuan 2p5D block (hunyuanpaint/unet/modules.py:104-246):
            # per-view self-attn, then refview / multiview attentions —
            # each reading the SAME norm1 output and adding residually
            x = x + attn1(h)
            if self.use_ra:
                ref = extra if extra is not None else h
                if ref.shape[0] != h.shape[0]:
                    # one reference row conditions all of its gen views
                    ref = jnp.repeat(ref, h.shape[0] // ref.shape[0],
                                     axis=0)
                out = CrossAttention(self.dim, self.heads, self.dim_head,
                                     name="attn_refview")(h, context=ref)
                x = x + (self.ref_scale if extra is not None else 0.0) \
                    * out
            if self.use_ma:
                b, t, c0 = h.shape
                v = self.mv_views
                hm = h.reshape(b // v, v * t, c0)
                out = CrossAttention(self.dim, self.heads, self.dim_head,
                                     name="attn_multiview")(hm)
                x = x + self.mva_scale * out.reshape(b, t, c0)
        elif self.mv_rowwise:
            # Era3D self_rowwise block (transformer_mv2d_self_rowwise.py
            # :432-605): attn1 is per-frame cross-domain joint
            # self-attention (JointAttnProcessor: kv = both domains'
            # tokens of the same view), then a SEPARATE attn_mv/norm_mv
            # does row-wise attention across views within each domain
            # (MVAttnProcessor "(b v) (h w) -> (b h) (v w)").
            b, t, c0 = h.shape
            if self.cd_joint:
                half = b // 2
                pair = jnp.concatenate([h[:half], h[half:]], axis=1)
                kv = jnp.concatenate([pair, pair], axis=0)
                x = x + attn1(h, context=kv)
            else:
                x = x + attn1(h)
            hmv = nn.LayerNorm(name="norm_mv")(x)
            v = self.mv_views
            hh = self.spatial_h
            ww = t // hh
            hr = hmv.reshape(b // v, v, hh, ww, c0)
            hr = hr.transpose(0, 2, 1, 3, 4).reshape(
                (b // v) * hh, v * ww, c0)
            out = CrossAttention(self.dim, self.heads, self.dim_head,
                                 name="attn_mv")(hr)
            out = out.reshape(b // v, hh, v, ww, c0)
            out = out.transpose(0, 2, 1, 3, 4).reshape(b, t, c0)
            x = x + out
        else:
            x = x + attn1(h, extra_kv=extra)
        if self.cd_joint and not self.mv_rowwise:
            # Wonder3D cd_attention_mid (transformer_mv2d.py:509-526,
            # JointAttnProcessor:909-961): per frame, kv = that frame's
            # tokens from BOTH domains; batch is domain-major [2, B, V].
            # Unfold the mv fold back to frames so the joint semantics
            # match the reference exactly (rowwise mode never folds).
            b, t, c = x.shape
            v = 1 if self.mv_rowwise else self.mv_views
            frames = x.reshape(b * v, t // v, c)
            h = nn.LayerNorm(name="norm_joint_mid")(frames)
            half = (b * v) // 2
            pair = jnp.concatenate([h[:half], h[half:]], axis=1)
            kv = jnp.concatenate([pair, pair], axis=0)   # [2·half, 2T, C]
            frames = frames + CrossAttention(
                self.dim, self.heads, self.dim_head,
                name="attn_joint_mid")(h, context=kv)
            x = frames.reshape(b, t, c)
        h = nn.LayerNorm(name="norm2")(x)
        x = x + CrossAttention(self.dim, self.heads, self.dim_head,
                               self.context_dim, ip_dim=self.ip_dim,
                               ip_weight=self.ip_weight,
                               name="attn2")(h, context=context)
        h = nn.LayerNorm(name="norm3")(x)
        from ..common import GEGLU
        h = GEGLU(self.dim * 4, name="ff_net_0")(h)
        x = x + nn.Dense(self.dim, name="ff_net_2")(h)
        return x, written


class SpatialTransformer(nn.Module):
    """diffusers Transformer2DModel: GN → 1x1-equivalent linear proj →
    blocks → proj out (+residual). mv_views > 1 folds the view axis into
    the token axis for every block (MVDream 3D self-attention)."""
    channels: int
    heads: int
    dim_head: int
    context_dim: int
    depth: int = 1
    norm_groups: int = 32
    mv_views: int = 1
    cd_joint: bool = False
    mv_rowwise: bool = False
    ip_dim: int = 0
    ip_weight: float = 1.0
    use_ma: bool = False
    use_ra: bool = False
    mva_scale: float = 1.0
    ref_scale: float = 1.0
    mv_decoupled: bool = False
    mv_use_ref: bool = True

    @nn.compact
    def __call__(self, x, context, ref_mode=None, ref_hidden=None):
        b, h, w, c = x.shape
        residual = x
        hid = nn.GroupNorm(self.norm_groups, epsilon=1e-6, name="norm")(x)
        hid = hid.reshape(b, h * w, c)
        hid = nn.Dense(self.channels, name="proj_in")(hid)
        # rowwise / hunyuan-2p5D / decoupled-mv restructure inside the
        # block — no token fold here
        v = (1 if self.mv_rowwise or self.use_ma or self.use_ra
             or self.mv_decoupled
             else self.mv_views)
        if v > 1:
            hid = hid.reshape(b // v, v * h * w, self.channels)
            context = context.reshape(b // v, v, *context.shape[1:])[:, 0]
        written = []
        for i in range(self.depth):
            rh = ref_hidden[i] if ref_hidden is not None else None
            hid, wr = TransformerBlock(
                self.channels, self.heads, self.dim_head,
                self.context_dim, cd_joint=self.cd_joint,
                mv_views=max(self.mv_views, 1),
                mv_rowwise=self.mv_rowwise,
                ip_dim=self.ip_dim, ip_weight=self.ip_weight,
                use_ma=self.use_ma, use_ra=self.use_ra,
                mva_scale=self.mva_scale, ref_scale=self.ref_scale,
                mv_decoupled=self.mv_decoupled,
                mv_use_ref=self.mv_use_ref,
                spatial_h=h, name=f"blocks_{i}")(
                hid, context, ref_mode=ref_mode, ref_hidden=rh)
            written.append(wr)
        if v > 1:
            hid = hid.reshape(b, h * w, self.channels)
        hid = nn.Dense(self.channels, name="proj_out")(hid)
        return hid.reshape(b, h, w, c) + residual, written


class Downsample(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.channels, (3, 3), strides=(2, 2), padding=1,
                       name="conv")(x)


class Upsample(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
        return nn.Conv(self.channels, (3, 3), padding=1, name="conv")(x)


class UNet2DCondition(nn.Module):
    cfg: UNetConfig = UNetConfig()

    def _heads(self, channels: int):
        hd = self.cfg.attention_head_dim
        if hd < 0:              # negative = fixed head count (SD1.5 style)
            return -hd, channels // -hd
        return channels // hd, hd

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states,
                 ref_mode=None, ref_hidden=None,
                 class_emb=None, down_residuals=None, mid_residual=None,
                 adapter_residuals=None, mv_views=None, pose_hook=None,
                 added_text_emb=None, added_time_ids=None,
                 intrablock_residuals=None):
        """sample [B, H, W, Cin] (NHWC); timesteps [B]; context
        [B, T, D]. Returns (eps/v prediction [B, H, W, Cout],
        written ref-hidden dict when ref_mode == 'write').

        down_residuals / mid_residual: ControlNet-style additive
        residuals (diffusers `down_block_additional_residuals` /
        `mid_block_additional_residual`) — one per skip entry, added to
        the saved skips and the mid output (the injection contract the
        Yoso/StableX pipelines use).

        adapter_residuals: T2I-Adapter intrablock residuals
        (diffusers `down_intrablock_additional_residuals`, the CRM T2I
        conditioning path) — one feature map per down stage, added
        after the stage's first resnet.

        intrablock_residuals: the diffusers SDXL T2I-Adapter variant of
        the same contract (unet_2d_condition.py down-loop): a QUEUE of
        feature maps — a DownBlock2D pops one after its downsample on
        shape match, a CrossAttn block adds one after its LAST
        (resnet, attn) pair, and the mid entry pops on shape match.

        added_text_emb [B, P] + added_time_ids [B, 6]: SDXL
        `added_cond_kwargs` (pooled prompt embedding + original/crop/
        target size ids) for `addition_embed_type == "text_time"`."""
        c = self.cfg
        if mv_views is not None and mv_views != c.mv_views:
            # ImageDream runs V+1 frames when the conditioning
            # image rides as an extra view (mv_unet.py forward
            # num_frames argument) — reshape-only, same params
            c = dataclasses.replace(c, mv_views=mv_views)
        written = {}
        ref_i = [0]

        def next_ref():
            key = f"sa_{ref_i[0]}"
            ref_i[0] += 1
            return key

        temb = timestep_embedding(timesteps, c.block_out_channels[0])
        temb = nn.Dense(c.block_out_channels[0] * 4, name="time_emb_1")(
            temb)
        temb = nn.Dense(c.block_out_channels[0] * 4, name="time_emb_2")(
            nn.silu(temb))
        if class_emb is not None:
            temb = temb + class_emb
        if c.addition_embed_type == "text_time":
            # SDXL add_embedding (unet_2d_condition.py "text_time"):
            # fourier-embed the 6 time_ids, concat the pooled text
            # embedding, run a second TimestepEmbedding MLP
            bsz = sample.shape[0]
            tids = added_time_ids if added_time_ids is not None else \
                jnp.zeros((bsz, 6), jnp.float32)
            tfeat = timestep_embedding(
                tids.reshape(-1), c.addition_time_embed_dim)
            tfeat = tfeat.reshape(bsz, -1)
            ptxt = added_text_emb if added_text_emb is not None else \
                jnp.zeros(
                    (bsz,
                     c.addition_proj_dim - 6 * c.addition_time_embed_dim),
                    jnp.float32)
            aug = jnp.concatenate([ptxt, tfeat], axis=-1)
            aug = nn.Dense(c.block_out_channels[0] * 4,
                           name="add_emb_1")(aug)
            aug = nn.Dense(c.block_out_channels[0] * 4,
                           name="add_emb_2")(nn.silu(aug))
            temb = temb + aug

        h = nn.Conv(c.block_out_channels[0], (3, 3), padding=1,
                    name="conv_in")(sample)
        res_i = [0]

        def ctrl(x):
            if down_residuals is None:
                return x
            r = down_residuals[res_i[0]]
            res_i[0] += 1
            return x + r

        skips = [ctrl(h)]

        # intrablock residual queue (diffusers SDXL T2I-Adapter
        # semantics — see docstring); shape-gated head-of-queue pops
        iq = list(intrablock_residuals) if intrablock_residuals else []

        def iq_pop_if_match(x):
            if iq and iq[0].shape == x.shape:
                return x + iq.pop(0)
            return x

        def st_kwargs(depth):
            return dict(
                context_dim=c.cross_attention_dim, depth=depth,
                norm_groups=c.norm_groups, mv_views=c.mv_views,
                cd_joint=c.cd_joint, mv_rowwise=c.mv_rowwise,
                use_ma=c.use_ma, use_ra=c.use_ra,
                mva_scale=c.mva_scale, ref_scale=c.ref_scale,
                mv_decoupled=c.mv_decoupled, mv_use_ref=c.mv_use_ref,
                ip_dim=c.ip_dim, ip_weight=c.ip_weight)

        # down
        for bi, btype in enumerate(c.down_block_types):
            out_ch = c.block_out_channels[bi]
            is_cross = btype.startswith("CrossAttnDownBlock")
            for li in range(c.layers_per_block):
                h = ResnetBlock(out_ch, c.norm_groups,
                                name=f"down_{bi}_res_{li}")(h, temb)
                # T2I-Adapter feature: after the stage's first resnet
                # (which sets the stage's channel width)
                if adapter_residuals is not None and li == 0:
                    h = h + adapter_residuals[bi]
                if is_cross:
                    heads, dim_head = self._heads(out_ch)
                    key = next_ref()
                    rh = (ref_hidden or {}).get(key)
                    h, wr = SpatialTransformer(
                        out_ch, heads, dim_head,
                        **st_kwargs(c.depth_of(bi)),
                        name=f"down_{bi}_attn_{li}")(
                        h, encoder_hidden_states, ref_mode=ref_mode,
                        ref_hidden=rh)
                    if ref_mode == "write":
                        written[key] = wr
                    # CrossAttn block: add after the LAST (resnet,
                    # attn) pair (unet_2d_blocks.py; shape-gated — for
                    # the published SDXL adapters every queued feature
                    # matches its block, so this is behavior-identical)
                    if li == c.layers_per_block - 1:
                        h = iq_pop_if_match(h)
                skips.append(ctrl(h))
            if bi < len(c.down_block_types) - 1:
                h = Downsample(out_ch, name=f"down_{bi}_downsample")(h)
                if not is_cross:
                    # DownBlock2D: shape-gated pop after the block
                    h = iq_pop_if_match(h)
                skips.append(ctrl(h))

        # mid
        mid_ch = c.block_out_channels[-1]
        h = ResnetBlock(mid_ch, c.norm_groups, name="mid_res_0")(h, temb)
        heads, dim_head = self._heads(mid_ch)
        key = next_ref()
        rh = (ref_hidden or {}).get(key)
        h, wr = SpatialTransformer(
            mid_ch, heads, dim_head,
            **st_kwargs(c.depth_of(len(c.block_out_channels) - 1)),
            name="mid_attn")(
            h, encoder_hidden_states, ref_mode=ref_mode, ref_hidden=rh)
        if ref_mode == "write":
            written[key] = wr
        h = ResnetBlock(mid_ch, c.norm_groups, name="mid_res_1")(h, temb)
        # T2I-Adapter-XL: last queued feature lands after the mid block
        h = iq_pop_if_match(h)
        if mid_residual is not None:
            h = h + mid_residual
        if pose_hook is not None:
            # Era3D in-network pose regression (unet_mv2d_condition.py:
            # 1162-1192): predict elevation/focal from pooled mid
            # features, re-condition the up path's time embedding
            new_temb, pose_aux = pose_hook(jax.lax.stop_gradient(h),
                                           temb)
            if new_temb is not None:
                temb = new_temb
            if pose_aux is not None:
                written["pose_aux"] = pose_aux

        # up
        rev_channels = list(reversed(c.block_out_channels))
        n_blocks = len(c.up_block_types)
        for bi, btype in enumerate(c.up_block_types):
            out_ch = rev_channels[bi]
            for li in range(c.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock(out_ch, c.norm_groups,
                                name=f"up_{bi}_res_{li}")(h, temb)
                if btype.startswith("CrossAttnUpBlock"):
                    heads, dim_head = self._heads(out_ch)
                    key = next_ref()
                    rh = (ref_hidden or {}).get(key)
                    h, wr = SpatialTransformer(
                        out_ch, heads, dim_head,
                        **st_kwargs(c.depth_of(n_blocks - 1 - bi)),
                        name=f"up_{bi}_attn_{li}")(
                        h, encoder_hidden_states, ref_mode=ref_mode,
                        ref_hidden=rh)
                    if ref_mode == "write":
                        written[key] = wr
            if bi < len(c.up_block_types) - 1:
                h = Upsample(out_ch, name=f"up_{bi}_upsample")(h)

        h = nn.GroupNorm(c.norm_groups, epsilon=1e-5, name="norm_out")(h)
        h = nn.Conv(c.out_channels, (3, 3), padding=1,
                    name="conv_out")(nn.silu(h))
        return h, written
