"""AutoencoderKL (the SD VAE) in flax — latent encode/decode for every
diffusion family (Zero123Plus/Wonder3D/Era3D/MVDream pipelines all decode
4-channel latents at /8 resolution through this architecture).
Layer naming mirrors diffusers' AutoencoderKL for weight conversion.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_groups: int = 32
    scaling_factor: float = 0.18215


class VAEResnet(nn.Module):
    out_channels: int
    norm_groups: int = 32

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(self.norm_groups, epsilon=1e-6, name="norm1")(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=1,
                    name="conv1")(nn.silu(h))
        h = nn.GroupNorm(self.norm_groups, epsilon=1e-6, name="norm2")(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1,
                    name="conv2")(nn.silu(h))
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    channels: int
    norm_groups: int = 32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hid = nn.GroupNorm(self.norm_groups, epsilon=1e-6,
                           name="group_norm")(x)
        hid = hid.reshape(b, h * w, c)
        q = nn.Dense(c, name="to_q")(hid)
        k = nn.Dense(c, name="to_k")(hid)
        v = nn.Dense(c, name="to_v")(hid)
        out = jax.nn.dot_product_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :])
        out = nn.Dense(c, name="to_out_0")(out[:, :, 0, :])
        return x + out.reshape(b, h, w, c)


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = nn.Conv(c.block_out_channels[0], (3, 3), padding=1,
                    name="conv_in")(x)
        for bi, out_ch in enumerate(c.block_out_channels):
            for li in range(c.layers_per_block):
                h = VAEResnet(out_ch, c.norm_groups,
                              name=f"down_{bi}_res_{li}")(h)
            if bi < len(c.block_out_channels) - 1:
                # diffusers pads asymmetrically ((0,1),(0,1)) before s2 conv
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(out_ch, (3, 3), strides=(2, 2),
                            padding="VALID",
                            name=f"down_{bi}_downsample")(h)
        h = VAEResnet(c.block_out_channels[-1], c.norm_groups,
                      name="mid_res_0")(h)
        h = VAEAttention(c.block_out_channels[-1], c.norm_groups,
                         name="mid_attn")(h)
        h = VAEResnet(c.block_out_channels[-1], c.norm_groups,
                      name="mid_res_1")(h)
        h = nn.GroupNorm(c.norm_groups, epsilon=1e-6, name="norm_out")(h)
        h = nn.Conv(2 * c.latent_channels, (3, 3), padding=1,
                    name="conv_out")(nn.silu(h))
        h = nn.Conv(2 * c.latent_channels, (1, 1), name="quant_conv")(h)
        mean, logvar = jnp.split(h, 2, axis=-1)
        return mean, logvar


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        c = self.cfg
        h = nn.Conv(c.latent_channels, (1, 1), name="post_quant_conv")(z)
        h = nn.Conv(c.block_out_channels[-1], (3, 3), padding=1,
                    name="conv_in")(h)
        h = VAEResnet(c.block_out_channels[-1], c.norm_groups,
                      name="mid_res_0")(h)
        h = VAEAttention(c.block_out_channels[-1], c.norm_groups,
                         name="mid_attn")(h)
        h = VAEResnet(c.block_out_channels[-1], c.norm_groups,
                      name="mid_res_1")(h)
        rev = list(reversed(c.block_out_channels))
        for bi, out_ch in enumerate(rev):
            for li in range(c.layers_per_block + 1):
                h = VAEResnet(out_ch, c.norm_groups,
                              name=f"up_{bi}_res_{li}")(h)
            if bi < len(rev) - 1:
                b, hh, ww, ch = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, ch),
                                     "nearest")
                h = nn.Conv(out_ch, (3, 3), padding=1,
                            name=f"up_{bi}_upsample")(h)
        h = nn.GroupNorm(c.norm_groups, epsilon=1e-6, name="norm_out")(h)
        return nn.Conv(c.in_channels, (3, 3), padding=1,
                       name="conv_out")(nn.silu(h))


class AutoencoderKL(nn.Module):
    cfg: VAEConfig = VAEConfig()

    def setup(self):
        self.encoder = Encoder(self.cfg, name="encoder")
        self.decoder = Decoder(self.cfg, name="decoder")

    def encode(self, images, key=None):
        """images [B,H,W,3] in [-1,1] → scaled latents [B,H/8,W/8,4]."""
        mean, logvar = self.encoder(images)
        if key is not None:
            mean = mean + jnp.exp(0.5 * jnp.clip(logvar, -30, 20)) \
                * jax.random.normal(key, mean.shape)
        return mean * self.cfg.scaling_factor

    def decode(self, latents):
        """scaled latents → images [-1,1]."""
        return self.decoder(latents / self.cfg.scaling_factor)

    def __call__(self, images):
        return self.decode(self.encode(images))
