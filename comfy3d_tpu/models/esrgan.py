"""RealESRGAN RRDBNet 4× upscaler (flax) + basicsr checkpoint converter.

Role of the reference's `realesrgan` dependency (SURVEY.md §2.6 E12;
used by Hunyuan3D-2.1 texgen per-view super-resolution,
`hy3dpaint/utils/image_super_utils.py`: RRDBNet(3, 3, 64, 23, 32,
scale 4)). Plain conv net — XLA fuses the whole residual-dense cascade;
NHWC layout.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from . import convert as C


@dataclasses.dataclass(frozen=True)
class RRDBConfig:
    num_feat: int = 64
    num_block: int = 23
    num_grow_ch: int = 32
    scale: int = 4


class ResidualDenseBlock(nn.Module):
    num_feat: int
    num_grow_ch: int

    @nn.compact
    def __call__(self, x):
        lrelu = lambda a: nn.leaky_relu(a, 0.2)
        x1 = lrelu(nn.Conv(self.num_grow_ch, (3, 3), padding=1,
                           name="conv1")(x))
        x2 = lrelu(nn.Conv(self.num_grow_ch, (3, 3), padding=1,
                           name="conv2")(jnp.concatenate([x, x1], -1)))
        x3 = lrelu(nn.Conv(self.num_grow_ch, (3, 3), padding=1,
                           name="conv3")(jnp.concatenate([x, x1, x2],
                                                         -1)))
        x4 = lrelu(nn.Conv(self.num_grow_ch, (3, 3), padding=1,
                           name="conv4")(jnp.concatenate([x, x1, x2, x3],
                                                         -1)))
        x5 = nn.Conv(self.num_feat, (3, 3), padding=1, name="conv5")(
            jnp.concatenate([x, x1, x2, x3, x4], -1))
        return x5 * 0.2 + x


class RRDB(nn.Module):
    num_feat: int
    num_grow_ch: int

    @nn.compact
    def __call__(self, x):
        h = ResidualDenseBlock(self.num_feat, self.num_grow_ch,
                               name="rdb1")(x)
        h = ResidualDenseBlock(self.num_feat, self.num_grow_ch,
                               name="rdb2")(h)
        h = ResidualDenseBlock(self.num_feat, self.num_grow_ch,
                               name="rdb3")(h)
        return h * 0.2 + x


class RRDBNet(nn.Module):
    cfg: RRDBConfig = RRDBConfig()

    @nn.compact
    def __call__(self, x):
        """x [B, H, W, 3] in [0,1] → [B, sH, sW, 3]."""
        c = self.cfg
        lrelu = lambda a: nn.leaky_relu(a, 0.2)
        feat = nn.Conv(c.num_feat, (3, 3), padding=1,
                       name="conv_first")(x)
        h = feat
        for i in range(c.num_block):
            h = RRDB(c.num_feat, c.num_grow_ch, name=f"body_{i}")(h)
        h = nn.Conv(c.num_feat, (3, 3), padding=1, name="conv_body")(h)
        feat = feat + h
        # ×2 nearest upsample + conv, twice (scale 4)
        for name in ("conv_up1", "conv_up2")[:c.scale // 2]:
            b, hh, ww, ch = feat.shape
            feat = jax.image.resize(feat, (b, hh * 2, ww * 2, ch),
                                    "nearest")
            feat = lrelu(nn.Conv(c.num_feat, (3, 3), padding=1,
                                 name=name)(feat))
        feat = lrelu(nn.Conv(c.num_feat, (3, 3), padding=1,
                             name="conv_hr")(feat))
        return nn.Conv(3, (3, 3), padding=1, name="conv_last")(feat)


def rrdb_rules(prefix: str = "") -> Callable:
    """basicsr `RRDBNet.state_dict()` keys → flax paths (conv_first,
    body.{i}.rdb{1,2,3}.conv{1-5}, conv_body, conv_up1/2, conv_hr,
    conv_last)."""

    def rules(key: str, val: np.ndarray):
        if prefix:
            if not key.startswith(prefix):
                return None
            key = key[len(prefix):]
        leaf = "kernel" if key.endswith("weight") else "bias"
        v = C.t_conv(val) if leaf == "kernel" else val
        stem = key.rsplit(".", 1)[0]
        for flat in ("conv_first", "conv_body", "conv_up1", "conv_up2",
                     "conv_hr", "conv_last"):
            if stem == flat:
                return f"{flat}/{leaf}", v
        if stem.startswith("body."):
            parts = stem.split(".")       # body, i, rdbK, convN
            return (f"body_{parts[1]}/{parts[2]}/{parts[3]}/{leaf}", v)
        return None

    return rules


def convert_rrdb(state_dict, prefix: str = "") -> dict:
    return C.convert_with_rules(state_dict, rrdb_rules(prefix),
                                strict=True)


def upscale(params, image, cfg: RRDBConfig = RRDBConfig(),
            tile: int = 0):
    """image [H, W, 3] float [0,1] → [sH, sW, 3] (RealESRGANer.enhance
    role; `tile` > 0 processes in tiles to bound memory)."""
    img = jnp.asarray(image, jnp.float32)[None]
    model = RRDBNet(cfg)
    if tile <= 0:
        out = model.apply({"params": params}, img)[0]
        return jnp.clip(out, 0.0, 1.0)
    h, w = img.shape[1], img.shape[2]
    s = cfg.scale
    out = np.zeros((h * s, w * s, 3), np.float32)
    pad = 8
    for y in range(0, h, tile):
        for x in range(0, w, tile):
            y0, x0 = max(0, y - pad), max(0, x - pad)
            y1, x1 = min(h, y + tile + pad), min(w, x + tile + pad)
            patch = model.apply({"params": params},
                                img[:, y0:y1, x0:x1])[0]
            oy, ox = (y - y0) * s, (x - x0) * s
            ph = min(tile, h - y) * s
            pw = min(tile, w - x) * s
            out[y * s:y * s + ph, x * s:x * s + pw] = \
                np.asarray(patch)[oy:oy + ph, ox:ox + pw]
    return jnp.clip(jnp.asarray(out), 0.0, 1.0)
