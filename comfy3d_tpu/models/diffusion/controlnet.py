"""ControlNet encoder for the SD-UNet substrate (flax).

The diffusers `ControlNetModel` role used by Stable3DGen's StableX/Yoso
normal estimator (`Stable3DGen/stablex/controlnetvae.py` +
`pipeline_yoso.py:481-492`) and the CRM T2I adapters: a copy of the UNet
down path whose per-skip outputs pass through zero-init 1×1 convs and
are injected into the main UNet as additive residuals
(`down_residuals` / `mid_residual` in `unet.UNet2DCondition`).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .unet import (Downsample, ResnetBlock, SpatialTransformer,
                   UNetConfig, timestep_embedding)


class ControlNetEncoder(nn.Module):
    cfg: UNetConfig = UNetConfig()
    cond_channels: int = 4           # conditioning latent channels
    # ControlNetVAE semantics (Stable3DGen controlnetvae.py:23-200):
    # the VAE latent IS the sample, the conditioning-embedding convs are
    # never called, and the residuals pass through RAW (the reference's
    # `controlnet_down_blocks` zero convs are skipped at forward time)
    raw_residuals: bool = False

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states,
                 conditioning, conditioning_scale: float = 1.0):
        """sample [B, H, W, C]; conditioning [B, H, W, cond_channels] →
        (down_residuals list, mid_residual)."""
        c = self.cfg
        temb = timestep_embedding(timesteps, c.block_out_channels[0])
        temb = nn.Dense(c.block_out_channels[0] * 4,
                        name="time_emb_1")(temb)
        temb = nn.Dense(c.block_out_channels[0] * 4,
                        name="time_emb_2")(nn.silu(temb))

        h = nn.Conv(c.block_out_channels[0], (3, 3), padding=1,
                    name="conv_in")(sample)
        if not self.raw_residuals:
            # conditioning embedding (zero-init output conv)
            e = nn.Conv(c.block_out_channels[0] // 4, (3, 3), padding=1,
                        name="cond_embed_0")(conditioning)
            e = nn.Conv(c.block_out_channels[0] // 2, (3, 3), padding=1,
                        name="cond_embed_1")(nn.silu(e))
            e = nn.Conv(c.block_out_channels[0], (3, 3), padding=1,
                        kernel_init=nn.initializers.zeros,
                        name="cond_embed_out")(nn.silu(e))
            h = h + e

        def zconv(x, i):
            if self.raw_residuals:
                return x
            return nn.Conv(x.shape[-1], (1, 1),
                           kernel_init=nn.initializers.zeros,
                           name=f"zero_conv_{i}")(x)

        residuals = [zconv(h, 0)]
        zi = 1
        for bi, btype in enumerate(c.down_block_types):
            out_ch = c.block_out_channels[bi]
            for li in range(c.layers_per_block):
                h = ResnetBlock(out_ch, c.norm_groups,
                                name=f"down_{bi}_res_{li}")(h, temb)
                if btype == "CrossAttnDownBlock2D":
                    heads = out_ch // c.attention_head_dim \
                        if c.attention_head_dim > 0 else -c.attention_head_dim
                    dim_head = (c.attention_head_dim
                                if c.attention_head_dim > 0
                                else out_ch // -c.attention_head_dim)
                    h, _ = SpatialTransformer(
                        out_ch, heads, dim_head, c.cross_attention_dim,
                        norm_groups=c.norm_groups,
                        name=f"down_{bi}_attn_{li}")(
                        h, encoder_hidden_states)
                residuals.append(zconv(h, zi))
                zi += 1
            if bi < len(c.down_block_types) - 1:
                h = Downsample(out_ch, name=f"down_{bi}_downsample")(h)
                residuals.append(zconv(h, zi))
                zi += 1

        mid_ch = c.block_out_channels[-1]
        h = ResnetBlock(mid_ch, c.norm_groups, name="mid_res_0")(h, temb)
        heads = (mid_ch // c.attention_head_dim
                 if c.attention_head_dim > 0 else -c.attention_head_dim)
        dim_head = (c.attention_head_dim if c.attention_head_dim > 0
                    else mid_ch // -c.attention_head_dim)
        h, _ = SpatialTransformer(
            mid_ch, heads, dim_head, c.cross_attention_dim,
            norm_groups=c.norm_groups, name="mid_attn")(
            h, encoder_hidden_states)
        h = ResnetBlock(mid_ch, c.norm_groups, name="mid_res_1")(h, temb)
        if self.raw_residuals:
            mid = h
        else:
            mid = nn.Conv(mid_ch, (1, 1),
                          kernel_init=nn.initializers.zeros,
                          name="zero_conv_mid")(h)
        s = conditioning_scale
        return [r * s for r in residuals], mid * s
