"""Unconditional diffusers-`UNet2DModel` mirror (flax).

CRM's triplane refiner `UNetPP` wraps `diffusers.UNet2DModel`
(`/root/reference/Gen_3D_Modules/CRM/model/archs/unet.py:16-45`) with 7
blocks, attention on down blocks 3-5 / up blocks 1-3, layers_per_block=2
and a fixed timestep. This module mirrors that architecture exactly —
resnets with time_emb_proj (scale-shift "default", eps 1e-5), deprecated-
style self-attention blocks (group_norm + biased to_q/k/v + to_out.0 +
residual), conv down/upsamplers — so `convert.py` can map the public
`CRM.pth` state dict layer-for-layer.

Layout notes vs the torch module tree:
  down_blocks.{i}.resnets.{j}   -> down_{i}_res_{j}
  down_blocks.{i}.attentions.{j}-> down_{i}_attn_{j}
  down_blocks.{i}.downsamplers.0-> down_{i}_down
  mid_block.resnets.{0,1}       -> mid_res_{0,1}
  mid_block.attentions.0        -> mid_attn
  up_blocks.{i}.*               -> up_{i}_res_{j} / up_{i}_attn_{j} / up_{i}_up
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..diffusion.unet import ResnetBlock, timestep_embedding


@dataclasses.dataclass(frozen=True)
class UNet2DModelConfig:
    in_channels: int = 32
    out_channels: int = 32
    block_out_channels: Tuple[int, ...] = (64, 128, 128, 256, 256, 512,
                                           512)
    # True where the block type is Attn{Down,Up}Block2D
    down_attn: Tuple[bool, ...] = (False, False, False, True, True, True,
                                   False)
    up_attn: Tuple[bool, ...] = (False, True, True, True, False, False,
                                 False)
    layers_per_block: int = 2
    attention_head_dim: int = 8
    norm_groups: int = 32

    @classmethod
    def crm(cls) -> "UNet2DModelConfig":
        """The exact UNetPP instantiation (unet.py:17-41)."""
        return cls()

    @classmethod
    def tiny(cls) -> "UNet2DModelConfig":
        return cls(in_channels=8, out_channels=8,
                   block_out_channels=(8, 16), down_attn=(False, True),
                   up_attn=(True, False), layers_per_block=1,
                   attention_head_dim=4, norm_groups=4)


class SelfAttnBlock2D(nn.Module):
    """diffusers `Attention` as built by Attn{Down,Up}Block2D /
    UNetMidBlock2D (bias=True, residual_connection=True,
    rescale_output_factor=1)."""
    channels: int
    head_dim: int
    norm_groups: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        heads = max(c // self.head_dim, 1)
        dim_head = c // heads
        hid = nn.GroupNorm(self.norm_groups, epsilon=1e-5,
                           name="group_norm")(x)
        hid = hid.reshape(b, h * w, c)
        q = nn.Dense(c, name="to_q")(hid)
        k = nn.Dense(c, name="to_k")(hid)
        v = nn.Dense(c, name="to_v")(hid)
        q = q.reshape(b, h * w, heads, dim_head)
        k = k.reshape(b, h * w, heads, dim_head)
        v = v.reshape(b, h * w, heads, dim_head)
        out = jax.nn.dot_product_attention(q, k, v)
        out = nn.Dense(c, name="to_out_0")(out.reshape(b, h * w, c))
        return x + out.reshape(b, h, w, c)


class UNet2DModel(nn.Module):
    cfg: UNet2DModelConfig = UNet2DModelConfig()

    @nn.compact
    def __call__(self, x, t):
        c = self.cfg
        ch0 = c.block_out_channels[0]
        temb = timestep_embedding(jnp.broadcast_to(
            jnp.asarray(t, jnp.float32), (x.shape[0],)), ch0)
        temb = nn.Dense(ch0 * 4, name="time_1")(temb)
        temb = nn.Dense(ch0 * 4, name="time_2")(nn.silu(temb))

        h = nn.Conv(ch0, (3, 3), padding=1, name="conv_in")(x)
        skips = [h]
        n_blocks = len(c.block_out_channels)
        for i, ch in enumerate(c.block_out_channels):
            for j in range(c.layers_per_block):
                h = ResnetBlock(ch, norm_groups=c.norm_groups,
                                name=f"down_{i}_res_{j}")(h, temb)
                if c.down_attn[i]:
                    h = SelfAttnBlock2D(ch, c.attention_head_dim,
                                        c.norm_groups,
                                        name=f"down_{i}_attn_{j}")(h)
                skips.append(h)
            if i < n_blocks - 1:
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding=1,
                            name=f"down_{i}_down")(h)
                skips.append(h)

        mid_ch = c.block_out_channels[-1]
        h = ResnetBlock(mid_ch, norm_groups=c.norm_groups,
                        name="mid_res_0")(h, temb)
        h = SelfAttnBlock2D(mid_ch, c.attention_head_dim, c.norm_groups,
                            name="mid_attn")(h)
        h = ResnetBlock(mid_ch, norm_groups=c.norm_groups,
                        name="mid_res_1")(h, temb)

        rev = tuple(reversed(c.block_out_channels))
        for i, ch in enumerate(rev):
            for j in range(c.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock(ch, norm_groups=c.norm_groups,
                                name=f"up_{i}_res_{j}")(h, temb)
                if c.up_attn[i]:
                    h = SelfAttnBlock2D(ch, c.attention_head_dim,
                                        c.norm_groups,
                                        name=f"up_{i}_attn_{j}")(h)
            if i < n_blocks - 1:
                b, hh, ww, cc = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, cc),
                                     "nearest")
                h = nn.Conv(cc, (3, 3), padding=1, name=f"up_{i}_up")(h)

        h = nn.GroupNorm(c.norm_groups, epsilon=1e-5,
                         name="conv_norm_out")(h)
        return nn.Conv(c.out_channels, (3, 3), padding=1,
                       name="conv_out")(nn.silu(h))
