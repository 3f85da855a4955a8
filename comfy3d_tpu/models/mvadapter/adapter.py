"""diffusers T2IAdapter (full_adapter_xl) in flax — MV-Adapter's
geometry condition encoder (`pipeline_mvadapter_i2mv_sdxl.py:890-897`:
`T2IAdapter(in_channels=6, channels=(320, 640, 1280, 1280),
num_res_blocks=2, downscale_factor=16, adapter_type="full_adapter_xl")`).

Structure (diffusers models/adapter.py FullAdapterXL):

* PixelUnshuffle(16) — space-to-depth, channel order (C, ry, rx)
* conv_in 3×3 → channels[0]
* body of 4 AdapterBlocks: block 1 changes channels 320→640 (1×1
  in_conv, no downsample), block 2 changes 640→1280 AND avg-downsamples,
  blocks 0/3 are same-channel; each block runs `num_res_blocks`
  AdapterResnetBlocks (3×3 → ReLU → 1×1, +skip)

Returns the 4 per-block features — the SDXL
`down_intrablock_additional_residuals` queue (our UNet's
`intrablock_residuals`).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class T2IAdapterXLConfig:
    in_channels: int = 6
    channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    num_res_blocks: int = 2
    downscale_factor: int = 16

    @classmethod
    def tiny(cls, channels=(8, 16, 16)) -> "T2IAdapterXLConfig":
        return cls(channels=tuple(channels), num_res_blocks=1,
                   downscale_factor=2)


def pixel_unshuffle(x, r: int):
    """torch PixelUnshuffle on NHWC input: output channel index =
    c·r² + ry·r + rx (channel-major, matching the torch conv_in weight
    layout)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)            # [B, H/r, W/r, C, ry, rx]
    return x.reshape(b, h // r, w // r, c * r * r)


class _AdapterResnetBlock(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Conv(self.ch, (3, 3), padding=1,
                            name="block1")(x))
        return x + nn.Conv(self.ch, (1, 1), name="block2")(h)


class T2IAdapterXL(nn.Module):
    cfg: T2IAdapterXLConfig = T2IAdapterXLConfig()

    @nn.compact
    def __call__(self, cond):
        """cond [B, H, W, in_channels] → list of per-block features
        (len == len(cfg.channels))."""
        c = self.cfg
        h = pixel_unshuffle(cond, c.downscale_factor)
        h = nn.Conv(c.channels[0], (3, 3), padding=1,
                    name="conv_in")(h)
        features = []
        for i, ch in enumerate(c.channels):
            if i == 2:
                # AvgPool2d(2, ceil_mode=True)
                hh, ww = h.shape[1], h.shape[2]
                ph, pw = hh % 2, ww % 2
                if ph or pw:
                    h = jnp.pad(h, ((0, 0), (0, ph), (0, pw), (0, 0)),
                                mode="edge")
                h = nn.avg_pool(h, (2, 2), strides=(2, 2))
            if h.shape[-1] != ch:
                h = nn.Conv(ch, (1, 1), name=f"body_{i}_in_conv")(h)
            for ri in range(c.num_res_blocks):
                h = _AdapterResnetBlock(ch,
                                        name=f"body_{i}_res_{ri}")(h)
            features.append(h)
        return features


def adapter_config_from_state_dict(sd, prefix: str = "adapter.",
                                   in_channels: int = 6
                                   ) -> T2IAdapterXLConfig:
    """Derive the FullAdapterXL shape from its torch state dict
    (channels per body block, res-block count, downscale factor from
    conv_in's unshuffled input width)."""
    conv_in = np.asarray(sd[prefix + "conv_in.weight"])
    r = int(round((conv_in.shape[1] / in_channels) ** 0.5))
    channels = []
    i = 0
    while True:
        key = f"{prefix}body.{i}.resnets.0.block1.weight"
        if key not in sd:
            break
        channels.append(int(np.asarray(sd[key]).shape[0]))
        i += 1
    j = 0
    while f"{prefix}body.0.resnets.{j}.block1.weight" in sd:
        j += 1
    return T2IAdapterXLConfig(
        in_channels=in_channels, channels=tuple(channels),
        num_res_blocks=max(1, j), downscale_factor=max(1, r))


def t2i_adapter_xl_rules(prefix: str = "adapter."):
    """Torch `T2IAdapter(full_adapter_xl)` state dict → T2IAdapterXL
    params. Keys: `adapter.conv_in.*`, `adapter.body.{i}.in_conv.*`,
    `adapter.body.{i}.resnets.{j}.block{1,2}.*`."""
    import re

    from ..convert import t_conv, to_numpy

    def rules(key: str, val: np.ndarray):
        if not key.startswith(prefix):
            return None
        key = key[len(prefix):]
        if key == "conv_in.weight":
            return "conv_in/kernel", t_conv(to_numpy(val))
        if key == "conv_in.bias":
            return "conv_in/bias", to_numpy(val)
        m = re.match(r"body\.(\d+)\.in_conv\.(weight|bias)", key)
        if m:
            i, kind = m.groups()
            if kind == "weight":
                return f"body_{i}_in_conv/kernel", t_conv(to_numpy(val))
            return f"body_{i}_in_conv/bias", to_numpy(val)
        m = re.match(r"body\.(\d+)\.resnets\.(\d+)\.block([12])"
                     r"\.(weight|bias)", key)
        if m:
            i, j, b, kind = m.groups()
            base = f"body_{i}_res_{j}/block{b}"
            if kind == "weight":
                return f"{base}/kernel", t_conv(to_numpy(val))
            return f"{base}/bias", to_numpy(val)
        return None

    return rules
