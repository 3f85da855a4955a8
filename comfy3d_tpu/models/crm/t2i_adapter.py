"""T2I-Adapter (CRM V2/V3 flavor): control image → per-stage residuals.

Counterpart of `Gen_3D_Modules/CRM_T2I_V2/model/t2i_adapter_v2.py:265`
(`T2IAdapterV2`, full_adapter): a small conv encoder
(`ImageConv2dEncoder`, :28/:59 — 3×3 conv in, then per stage a 3×3
same-width conv and a stride-2 3×3 widening conv, SiLU after each,
and a zero-init 3×3 out conv to the UNet's first block width) followed
by one `AdapterBlock` per UNet down stage (:442 — avgpool down, 1×1
channel-change conv, N ResNet-ish blocks of 3×3→ReLU→1×1 + skip).
The returned feature pyramid is injected through the UNet substrate's
`adapter_residuals` (diffusers `down_intrablock_additional_residuals`
contract). Everything is plain convs — XLA fuses the whole pyramid
into a handful of MXU convolutions.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class T2IAdapterConfig:
    in_channels: int = 3
    channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    num_res_blocks: int = 2
    cond_channels: Tuple[int, ...] = (16, 32, 64, 128, 256)

    @classmethod
    def tiny(cls, channels=(8, 16)) -> "T2IAdapterConfig":
        return cls(channels=tuple(channels), num_res_blocks=1,
                   cond_channels=(4, 8))


class _AdapterResnet(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Conv(self.ch, (3, 3), padding=1,
                            name="block1")(x))
        return x + nn.Conv(self.ch, (1, 1), name="block2")(h)


class T2IAdapter(nn.Module):
    cfg: T2IAdapterConfig = T2IAdapterConfig()

    @nn.compact
    def __call__(self, cond):
        """cond [B, H, W, C] control image (e.g. normal maps in [0,1])
        → list of per-stage features, len == len(cfg.channels),
        feature i at H/(16·2^i) with cfg.channels[i] channels."""
        c = self.cfg
        h = nn.silu(nn.Conv(c.cond_channels[0], (3, 3), padding=1,
                            name="enc_conv_in")(cond))
        for i, ch in enumerate(c.cond_channels[1:]):
            h = nn.silu(nn.Conv(c.cond_channels[i], (3, 3), padding=1,
                                name=f"enc_mid_{i}")(h))
            h = nn.silu(nn.Conv(ch, (3, 3), strides=(2, 2), padding=1,
                                name=f"enc_down_{i}")(h))
        h = nn.Conv(c.channels[0], (3, 3), padding=1,
                    name="enc_conv_out")(h)

        features = []
        for bi, ch in enumerate(c.channels):
            if bi > 0:
                h = nn.avg_pool(h, (2, 2), strides=(2, 2))
                if h.shape[-1] != ch:
                    h = nn.Conv(ch, (1, 1), name=f"in_conv_{bi}")(h)
            for ri in range(c.num_res_blocks):
                h = _AdapterResnet(ch, name=f"res_{bi}_{ri}")(h)
            features.append(h)
        return features
