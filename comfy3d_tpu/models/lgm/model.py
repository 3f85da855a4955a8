"""LGM — Large Multiview Gaussian Model (flax).

Re-derivation of the reference
(`Gen_3D_Modules/LGM/large_multiview_gaussian_model.py:13-120`,
`LGM/core/unet.py`, `LGM/core/options.py` "big" config): an asymmetric
UNet over 4 views × (RGB + Plücker-ray) 9-channel inputs producing a
14-channel splat map per view; channels decode as
pos(3, clamp ±1) / opacity(1, σ) / scale(3, 0.1·softplus) /
rotation(4, normalize) / rgb(3, 0.5·tanh+0.5).

Cross-view reasoning is the MVAttention block (unet.py:11-48): GroupNorm
→ fused-qkv attention over all V·H·W tokens → residual, with the
√0.5 skip scaling the whole UNet uses.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class LGMConfig:
    input_size: int = 256
    splat_size: int = 64
    in_channels: int = 9
    out_channels: int = 14
    down_channels: Tuple[int, ...] = (64, 128, 256, 512, 1024, 1024)
    down_attention: Tuple[bool, ...] = (False, False, False, True, True,
                                        True)
    mid_attention: bool = True
    up_channels: Tuple[int, ...] = (1024, 1024, 512, 256)
    up_attention: Tuple[bool, ...] = (True, True, True, False)
    layers_per_block: int = 2
    num_views: int = 4
    attention_heads: int = 16
    norm_groups: int = 32
    cam_radius: float = 1.5
    fovy: float = 49.1

    @property
    def skip_scale(self) -> float:
        return float(np.sqrt(0.5))


class LGMResnet(nn.Module):
    out_channels: int
    resample: str = "none"         # none | down(avgpool) — up unused here
    groups: int = 32
    skip_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        res = x
        h = nn.GroupNorm(self.groups, epsilon=1e-5, name="norm1")(x)
        h = nn.silu(h)
        if self.resample == "down":
            h = nn.avg_pool(h, (2, 2), (2, 2))
            res = nn.avg_pool(res, (2, 2), (2, 2))
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv1")(h)
        h = nn.GroupNorm(self.groups, epsilon=1e-5, name="norm2")(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1,
                    name="conv2")(nn.silu(h))
        if res.shape[-1] != self.out_channels:
            res = nn.Conv(self.out_channels, (1, 1), name="shortcut")(res)
        return (h + res) * self.skip_scale


class MVAttention(nn.Module):
    """GroupNorm → attention across all views' tokens → residual."""
    dim: int
    heads: int
    num_views: int
    groups: int = 32
    skip_scale: float = 1.0

    @nn.compact
    def __call__(self, x):            # [B*V, H, W, C]
        bv, h, w, c = x.shape
        b = bv // self.num_views
        res = x
        hid = nn.GroupNorm(self.groups, epsilon=1e-5, name="norm")(x)
        hid = hid.reshape(b, self.num_views * h * w, c)
        qkv = nn.Dense(3 * self.dim, use_bias=False, name="qkv")(hid)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = self.dim // self.heads
        t = hid.shape[1]
        rs = lambda a: a.reshape(b, t, self.heads, hd)
        out = jax.nn.dot_product_attention(rs(q), rs(k), rs(v))
        out = nn.Dense(self.dim, name="proj")(out.reshape(b, t, self.dim))
        out = out.reshape(bv, h, w, c)
        return (out + res) * self.skip_scale


class LGMUNet(nn.Module):
    cfg: LGMConfig = LGMConfig()

    @nn.compact
    def __call__(self, x):
        """x [B*V, H, W, 9] → [B*V, H/4·?, ...] 14-channel splat map
        (asymmetric: fewer up blocks than down blocks)."""
        c = self.cfg
        ss = c.skip_scale
        x = nn.Conv(c.down_channels[0], (3, 3), padding=1,
                    name="conv_in")(x)
        skips = [x]
        for i, out_ch in enumerate(c.down_channels):
            for li in range(c.layers_per_block):
                x = LGMResnet(out_ch, groups=c.norm_groups, skip_scale=ss,
                              name=f"down_{i}_res_{li}")(x)
                if c.down_attention[i]:
                    x = MVAttention(out_ch, c.attention_heads, c.num_views,
                                    c.norm_groups, ss,
                                    name=f"down_{i}_attn_{li}")(x)
                skips.append(x)
            if i != len(c.down_channels) - 1:
                x = nn.Conv(out_ch, (3, 3), strides=(2, 2), padding=1,
                            name=f"down_{i}_downsample")(x)
                skips.append(x)

        mid_ch = c.down_channels[-1]
        x = LGMResnet(mid_ch, groups=c.norm_groups, skip_scale=ss,
                      name="mid_res_0")(x)
        if c.mid_attention:
            x = MVAttention(mid_ch, c.attention_heads, c.num_views,
                            c.norm_groups, ss, name="mid_attn")(x)
        x = LGMResnet(mid_ch, groups=c.norm_groups, skip_scale=ss,
                      name="mid_res_1")(x)

        for i, out_ch in enumerate(c.up_channels):
            for li in range(c.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = LGMResnet(out_ch, groups=c.norm_groups, skip_scale=ss,
                              name=f"up_{i}_res_{li}")(x)
                if c.up_attention[i]:
                    x = MVAttention(out_ch, c.attention_heads, c.num_views,
                                    c.norm_groups, ss,
                                    name=f"up_{i}_attn_{li}")(x)
            if i != len(c.up_channels) - 1:
                b, hh, ww, ch = x.shape
                x = jax.image.resize(x, (b, hh * 2, ww * 2, ch), "nearest")
                x = nn.Conv(out_ch, (3, 3), padding=1,
                            name=f"up_{i}_upsample")(x)

        x = nn.GroupNorm(c.norm_groups, epsilon=1e-5, name="norm_out")(x)
        x = nn.Conv(c.out_channels, (3, 3), padding=1,
                    name="conv_out")(nn.silu(x))
        # trailing 1x1 conv (large_multiview_gaussian_model.py:33)
        x = nn.Conv(c.out_channels, (1, 1), name="conv_final")(x)
        return x


def decode_gaussians(raw: jnp.ndarray):
    """[N, 14] UNet output → activated splat params (reference
    activations, large_multiview_gaussian_model.py:38-43).
    Returns dict(xyz, opacity, scale, rotation(wxyz-normalized), rgb)."""
    pos = jnp.clip(raw[..., 0:3], -1.0, 1.0)
    opacity = jax.nn.sigmoid(raw[..., 3])
    scale = 0.1 * jax.nn.softplus(raw[..., 4:7])
    rot = raw[..., 7:11]
    rot = rot / jnp.maximum(jnp.linalg.norm(rot, axis=-1, keepdims=True),
                            1e-8)
    rgb = 0.5 * jnp.tanh(raw[..., 11:14]) + 0.5
    return {"xyz": pos, "opacity": opacity, "scale": scale,
            "rotation": rot, "rgb": rgb}


def plucker_rays(cfg: LGMConfig, elevations, azimuths):
    """Per-view Plücker ray embeddings [V, S, S, 6]
    (prepare_default_rays role, large_multiview_gaussian_model.py:60-81)."""
    from ...core.camera import Camera, get_rays
    cams = Camera.from_orbit(jnp.asarray(elevations, jnp.float32),
                             jnp.asarray(azimuths, jnp.float32),
                             cfg.cam_radius, fovy_deg=cfg.fovy,
                             width=cfg.input_size, height=cfg.input_size)
    o, d = get_rays(cams)
    cross = jnp.cross(o, d)
    return jnp.concatenate([cross, d], axis=-1)
